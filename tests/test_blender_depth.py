"""Blender transforms.json loader (C19) and depth rendering (C20)."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from casualhdrsplat_tpu.data.blender import load_blender_dataset


def write_fake_blender(path, n=3, size=8):
    os.makedirs(path, exist_ok=True)
    try:
        from PIL import Image
    except ImportError:
        pytest.skip("PIL needed")
    frames = []
    for i in range(n):
        name = f"r_{i}.png"
        Image.fromarray(
            (np.random.default_rng(i).uniform(size=(size, size, 3)) * 255).astype(
                np.uint8
            )
        ).save(os.path.join(path, name))
        c2w = np.eye(4)
        c2w[2, 3] = 3.0 + i  # camera along +z (OpenGL looks down -z)
        frames.append({"file_path": f"r_{i}", "transform_matrix": c2w.tolist()})
    meta = {"camera_angle_x": 0.8, "frames": frames}
    with open(os.path.join(path, "transforms_train.json"), "w") as f:
        json.dump(meta, f)


def test_blender_loader(tmp_path):
    write_fake_blender(str(tmp_path))
    ds = load_blender_dataset(str(tmp_path))
    assert ds.images.shape == (3, 8, 8, 3)
    assert ds.num_frames == 3
    # OpenGL->OpenCV: identity c2w at z=3 looks down -z(gl)=+z(cv)... the
    # converted w2c must place the world origin at depth +3 in cam frame
    origin_cam = ds.viewmats[0][:3, :3] @ np.zeros(3) + ds.viewmats[0][:3, 3]
    np.testing.assert_allclose(origin_cam[2], 3.0, atol=1e-5)
    assert ds.fx > 0 and ds.points_xyz.shape[1] == 3


def test_depth_render(rng):
    from casualhdrsplat_tpu.config import CRFConfig, ModelConfig, RasterizeConfig
    from casualhdrsplat_tpu.data import dataset as dataset_mod
    from casualhdrsplat_tpu.models import image_formation as imf

    ds = dataset_mod.make_synthetic_dataset(
        seed=2, n_gaussians=50, n_frames=3, n_virtual=1, size=24
    )
    cfg = ModelConfig(
        max_gaussians=64, sh_degree=0, num_virtual_views=1,
        crf=CRFConfig(kind="identity"),
        rasterize=RasterizeConfig(
            tile_h=8, tile_w=16, tile_capacity=64, max_tiles_per_gaussian=32,
            chunk=32, backend="xla", packed=False,
        ),
    )
    scene = imf.build_scene(ds, cfg)
    params = imf.init_params(scene, ds.points_xyz, ds.points_rgb, cfg)
    depth, alpha, _ = imf.render_pose(
        params, scene, jnp.asarray(ds.viewmats[0]), cfg, depth_output=True
    )
    d = np.asarray(depth)
    a = np.asarray(alpha)
    assert d.shape == (24, 24)
    # where alpha is meaningful, depth must lie inside the scene's z range
    zs = (ds.points_xyz @ ds.viewmats[0][:3, :3].T + ds.viewmats[0][:3, 3])[:, 2]
    hit = a > 0.5
    if hit.any():
        assert d[hit].min() >= zs.min() - 0.5
        assert d[hit].max() <= zs.max() + 0.5
