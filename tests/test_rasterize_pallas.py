"""Pallas kernels vs the XLA compositing path (SURVEY.md §5.2: interpret
mode is the CPU sanitizer equivalent — same kernels, no TPU needed)."""

import jax
import jax.numpy as jnp
import numpy as np

from casualhdrsplat_tpu.config import RasterizeConfig
from casualhdrsplat_tpu.data import synthetic
from casualhdrsplat_tpu.ops import oracle, rasterize


def cfg_pair(**kw):
    base = dict(tile_h=8, tile_w=16, tile_capacity=64, max_tiles_per_gaussian=64,
                chunk=32)
    base.update(kw)
    return (
        RasterizeConfig(backend="xla", **base),
        RasterizeConfig(backend="pallas", **base),
    )


def run(cloud, cam, cfg, target=None):
    def fwd(m, q, s, o, c):
        imgs, alphas, aux = rasterize.rasterize(
            m, q, s, o, c, cam.viewmat[None], cam.fx, cam.fy, cam.cx, cam.cy,
            cam.width, cam.height, cfg,
        )
        return imgs, alphas

    args = (cloud.means3d, cloud.quats, cloud.scales, cloud.opacities, cloud.colors)
    imgs, alphas = fwd(*args)
    grads = None
    if target is not None:
        def loss(*a):
            im, al = fwd(*a)
            return jnp.mean((im[0] - target) ** 2) + 0.05 * jnp.mean(al)

        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
    return imgs, alphas, grads


def test_pallas_forward_matches_xla(rng):
    cloud = synthetic.random_cloud(rng, 80)
    cam = synthetic.orbit_camera(0.15, width=32, img_height=16)
    cfg_x, cfg_p = cfg_pair()
    img_x, al_x, _ = run(cloud, cam, cfg_x)
    img_p, al_p, _ = run(cloud, cam, cfg_p)
    np.testing.assert_allclose(img_p, img_x, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(al_p, al_x, atol=1e-5)


def test_pallas_forward_matches_oracle(rng):
    cloud = synthetic.random_cloud(rng, 60)
    cam = synthetic.orbit_camera(0.0, width=24, img_height=24)
    _, cfg_p = cfg_pair()
    img_p, al_p, _ = run(cloud, cam, cfg_p)
    ref = oracle.render(
        cloud.means3d, cloud.quats, cloud.scales, cloud.opacities, cloud.colors, cam
    )
    np.testing.assert_allclose(img_p[0], ref.image, atol=2e-4, rtol=1e-3)


def test_pallas_backward_matches_xla(rng):
    cloud = synthetic.random_cloud(rng, 50)
    cam = synthetic.orbit_camera(0.1, width=16, img_height=16)
    target = jnp.asarray(rng.uniform(size=(16, 16, 3)), jnp.float32)
    cfg_x, cfg_p = cfg_pair(tile_capacity=64)
    _, _, g_x = run(cloud, cam, cfg_x, target)
    _, _, g_p = run(cloud, cam, cfg_p, target)
    names = ("means3d", "quats", "scales", "opacities", "colors")
    for name, a, b in zip(names, g_p, g_x):
        scale = max(1e-6, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(a, b, atol=1e-4 * scale, rtol=1e-3, err_msg=name)


def test_pallas_multi_chunk_early_exit(rng):
    """Capacity >> occupancy and an opaque near field: early-exit path must
    not change results beyond the transmittance epsilon."""
    cloud = synthetic.random_cloud(rng, 120)
    cloud = cloud._replace(opacities=jnp.full((120,), 0.98))
    cam = synthetic.orbit_camera(0.0, width=16, img_height=16)
    cfg_x, cfg_p = cfg_pair(tile_h=16, tile_w=16, tile_capacity=128, chunk=32)
    img_x, al_x, _ = run(cloud, cam, cfg_x)
    img_p, al_p, _ = run(cloud, cam, cfg_p)
    np.testing.assert_allclose(img_p, img_x, atol=5e-4, rtol=1e-3)
