"""Unified image-formation model tests (SURVEY.md L4, §0.2): the full
spline -> rasterize -> CRF -> blur chain and its gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from casualhdrsplat_tpu.config import ModelConfig, RasterizeConfig, CRFConfig
from casualhdrsplat_tpu.data import dataset as dataset_mod
from casualhdrsplat_tpu.models import image_formation as imf


@pytest.fixture(scope="module")
def setup():
    ds = dataset_mod.make_synthetic_dataset(
        seed=1, n_gaussians=60, n_frames=5, n_virtual=3, size=24
    )
    cfg = ModelConfig(
        max_gaussians=128,
        sh_degree=1,
        num_virtual_views=3,
        crf=CRFConfig(kind="mlp", hidden=8),
        rasterize=RasterizeConfig(
            tile_h=8, tile_w=16, tile_capacity=64, max_tiles_per_gaussian=32,
            chunk=32, backend="xla",
        ),
    )
    scene = imf.build_scene(ds, cfg)
    params = imf.init_params(scene, ds.points_xyz, ds.points_rgb, cfg)
    return ds, cfg, scene, params


def test_render_frame_shapes(setup):
    ds, cfg, scene, params = setup
    out = imf.render_frame(params, scene, jnp.asarray(1), cfg)
    assert out.blurred_ldr.shape == (24, 24, 3)
    assert out.sharp_ldr.shape == (3, 24, 24, 3)
    assert out.sharp_hdr.shape == (3, 24, 24, 3)
    assert np.isfinite(np.asarray(out.blurred_ldr)).all()
    assert float(out.blurred_ldr.min()) >= 0.0
    assert float(out.blurred_ldr.max()) <= 1.0


def test_blur_is_mean_of_sharp(setup):
    ds, cfg, scene, params = setup
    out = imf.render_frame(params, scene, jnp.asarray(2), cfg)
    np.testing.assert_allclose(
        out.blurred_ldr, np.asarray(out.sharp_ldr).mean(0), atol=1e-6
    )


def test_gradients_reach_all_groups(setup):
    ds, cfg, scene, params = setup
    target = jnp.asarray(ds.images[1])

    def loss(p):
        out = imf.render_frame(p, scene, jnp.asarray(1), cfg)
        return jnp.mean((out.blurred_ldr - target) ** 2)

    g = jax.grad(loss, allow_int=True)(params)  # 'alive' mask is bool
    g = dict(g, gaussians={k: v for k, v in g["gaussians"].items() if k != "alive"})
    assert float(jnp.abs(g["knot_deltas"]).max()) > 0
    assert float(jnp.abs(g["log_exposures"][1])) > 0
    assert float(jnp.abs(g["log_exposures"][0])) == 0  # other frames untouched
    assert float(jnp.abs(g["gaussians"]["means"]).max()) > 0
    assert float(jnp.abs(g["gaussians"]["sh_dc"]).max()) > 0
    crf_gnorm = sum(float(jnp.abs(v).sum()) for v in jax.tree.leaves(g["crf"]))
    assert crf_gnorm > 0
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_exposure_scales_brightness(setup):
    ds, cfg, scene, params = setup
    bright = dict(params, log_exposures=params["log_exposures"] + 1.0)
    out_a = imf.render_frame(params, scene, jnp.asarray(0), cfg)
    out_b = imf.render_frame(bright, scene, jnp.asarray(0), cfg)
    assert float(out_b.blurred_ldr.mean()) > float(out_a.blurred_ldr.mean())


def test_render_pose_hdr_vs_ldr(setup):
    ds, cfg, scene, params = setup
    viewmat = jnp.asarray(ds.viewmats[0])
    hdr, _, _ = imf.render_pose(params, scene, viewmat, cfg, hdr_output=True)
    ldr, _, _ = imf.render_pose(params, scene, viewmat, cfg, exposure=jnp.asarray(1.0))
    assert float(ldr.max()) <= 1.0
    assert np.isfinite(np.asarray(hdr)).all()
    # LDR is the CRF of HDR*dt — correlated but not equal
    assert not np.allclose(np.asarray(hdr), np.asarray(ldr))


def test_exposure_sweep_monotone(setup):
    """HDR exposure editing (teaser.png c.1): brightness increases
    monotonically with virtual exposure time."""
    ds, cfg, scene, params = setup
    viewmat = jnp.asarray(ds.viewmats[2])
    means = []
    for dt in (0.25, 1.0, 4.0):
        ldr, _, _ = imf.render_pose(
            params, scene, viewmat, cfg, exposure=jnp.asarray(dt)
        )
        means.append(float(ldr.mean()))
    assert means[0] < means[1] < means[2]


def test_render_deblurred(setup):
    ds, cfg, scene, params = setup
    img, alpha, aux = imf.render_deblurred(params, scene, jnp.asarray(1), cfg)
    assert img.shape == (24, 24, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_static_rig_when_pose_opt_off(setup):
    ds, cfg, scene, params = setup
    import dataclasses

    cfg2 = dataclasses.replace(cfg, optimize_poses=False)
    out = imf.render_frame(params, scene, jnp.asarray(1), cfg2)
    # all virtual views identical -> blur == each sharp view
    np.testing.assert_allclose(
        np.asarray(out.sharp_ldr[0]), np.asarray(out.sharp_ldr[-1]), atol=1e-6
    )

def test_sh_shared_view(setup):
    """sh_shared_view evaluates SH once at the middle virtual view: exact
    at degree 0 (view-independent), close at degree>0 for the small
    within-window direction change, and gradients still reach sh_rest."""
    import dataclasses

    ds, cfg, scene, params = setup
    shared = dataclasses.replace(cfg, sh_shared_view=True)

    out0 = imf.render_frame(params, scene, jnp.asarray(1), cfg, sh_degree=0)
    out0s = imf.render_frame(params, scene, jnp.asarray(1), shared,
                             sh_degree=0)
    np.testing.assert_allclose(out0s.blurred_ldr, out0.blurred_ldr, atol=1e-6)

    out1 = imf.render_frame(params, scene, jnp.asarray(1), cfg)
    out1s = imf.render_frame(params, scene, jnp.asarray(1), shared)
    # deg-1 radiance varies with direction: shared-view is an
    # approximation, but within one exposure window it stays close.
    assert float(jnp.abs(out1s.blurred_ldr - out1.blurred_ldr).max()) < 0.05

    def loss(p):
        out = imf.render_frame(p, scene, jnp.asarray(1), shared)
        return jnp.mean((out.blurred_ldr - jnp.asarray(ds.images[1])) ** 2)

    g = jax.grad(loss, allow_int=True)(params)
    assert float(jnp.abs(g["gaussians"]["sh_dc"]).max()) > 0
    assert float(jnp.abs(g["gaussians"]["sh_rest"]).max()) > 0
    assert float(jnp.abs(g["knot_deltas"]).max()) > 0


def test_knot_deltas_are_camera_frame(setup):
    """Pose deltas compose on the LEFT (camera frame): a rotation-only
    delta must spin each knot camera IN PLACE — identical camera centers
    — and a translation-only delta must move the center by exactly its
    magnitude.  The right-multiplied (world-frame) form rotates cameras
    about the world origin, entangling orientation with position at
    scene-radius scale (r04 joint-divergence root cause)."""
    ds, cfg, scene, params = setup
    m = scene.base_knots.shape[0]

    def centers(knots):
        inv = np.linalg.inv(np.asarray(knots, np.float64))
        return inv[:, :3, 3]

    rot_only = jnp.zeros((m, 6)).at[:, 0].set(0.2)  # 0.2 rad about cam-x
    p = dict(params, knot_deltas=rot_only)
    np.testing.assert_allclose(
        centers(imf.effective_knots(p, scene)),
        centers(scene.base_knots), atol=1e-5,
    )
    trans_only = jnp.zeros((m, 6)).at[:, 5].set(0.3)  # 0.3 along cam-z
    p = dict(params, knot_deltas=trans_only)
    d = centers(imf.effective_knots(p, scene)) - centers(scene.base_knots)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 0.3, atol=1e-5)
