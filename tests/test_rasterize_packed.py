"""Packed streaming compositor (V2) vs dense path and oracle — fwd+bwd
allclose in interpret mode (SURVEY.md §5.2 sanitizer equivalent)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from casualhdrsplat_tpu.config import RasterizeConfig
from casualhdrsplat_tpu.data import synthetic
from casualhdrsplat_tpu.ops import oracle, rasterize


def cfgs(**kw):
    base = dict(tile_h=8, tile_w=16, max_tiles_per_gaussian=32, chunk=32)
    base.update(kw)
    return (
        # dense reference needs capacity >= max tile occupancy (the packed
        # path never truncates)
        RasterizeConfig(backend="xla", packed=False, tile_capacity=256, **base),
        RasterizeConfig(backend="pallas", packed=True, tile_capacity=64, **base),
    )


def run(cloud, cam, cfg, target=None, nviews=1):
    vm = jnp.tile(cam.viewmat[None], (nviews, 1, 1))

    def fwd(m, q, s, o, c):
        return rasterize.rasterize(
            m, q, s, o, c, vm, cam.fx, cam.fy, cam.cx, cam.cy,
            cam.width, cam.height, cfg,
        )[:2]

    args = (cloud.means3d, cloud.quats, cloud.scales, cloud.opacities, cloud.colors)
    imgs, alphas = fwd(*args)
    grads = None
    if target is not None:
        def loss(*a):
            im, al = fwd(*a)
            return jnp.mean((im[0] - target) ** 2) + 0.05 * jnp.mean(al)
        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
    return imgs, alphas, grads


def test_packed_forward_matches_dense(rng):
    cloud = synthetic.random_cloud(rng, 90)
    cam = synthetic.orbit_camera(0.1, width=32, img_height=24)
    cfg_x, cfg_p = cfgs()
    img_x, al_x, _ = run(cloud, cam, cfg_x)
    img_p, al_p, _ = run(cloud, cam, cfg_p)
    np.testing.assert_allclose(img_p, img_x, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(al_p, al_x, atol=1e-5)


def test_packed_forward_matches_oracle(rng):
    cloud = synthetic.random_cloud(rng, 70)
    cam = synthetic.orbit_camera(0.0, width=24, img_height=24)
    _, cfg_p = cfgs()
    img_p, _, _ = run(cloud, cam, cfg_p)
    ref = oracle.render(
        cloud.means3d, cloud.quats, cloud.scales, cloud.opacities, cloud.colors, cam
    )
    np.testing.assert_allclose(img_p[0], ref.image, atol=2e-4, rtol=1e-3)


def test_packed_backward_matches_dense(rng):
    cloud = synthetic.random_cloud(rng, 60)
    cam = synthetic.orbit_camera(0.1, width=16, img_height=16)
    target = jnp.asarray(rng.uniform(size=(16, 16, 3)), jnp.float32)
    cfg_x, cfg_p = cfgs()
    _, _, g_x = run(cloud, cam, cfg_x, target)
    _, _, g_p = run(cloud, cam, cfg_p, target)
    names = ("means3d", "quats", "scales", "opacities", "colors")
    for name, a, b in zip(names, g_p, g_x):
        scale = max(1e-6, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(a, b, atol=1e-4 * scale, rtol=1e-3, err_msg=name)


def test_packed_multiview(rng):
    """Multiple views share the chunk stream machinery (per-view offsets)."""
    cloud = synthetic.random_cloud(rng, 40)
    cam = synthetic.orbit_camera(0.0, width=16, img_height=16)
    _, cfg_p = cfgs()
    imgs, alphas, _ = run(cloud, cam, cfg_p, nviews=3)
    assert imgs.shape[0] == 3
    np.testing.assert_allclose(imgs[0], imgs[2], atol=1e-6)  # same pose


def test_transmittance_eps_knob_reaches_kernel(rng):
    """RasterizeConfig.transmittance_eps drives the chunk early-exit
    (VERDICT r1 weak #5): a huge eps visibly truncates an opaque scene,
    a tiny eps stays oracle-faithful."""
    cloud = synthetic.random_cloud(rng, 150)
    cloud = cloud._replace(opacities=jnp.full((150,), 0.97))
    cam = synthetic.orbit_camera(0.0, width=16, img_height=16)
    _, cfg_tight = cfgs(tile_h=16, tile_w=16, chunk=32, transmittance_eps=1e-6)
    # eps > 1 fails the skip test even at T=1: every chunk is skipped, so
    # the output must be exactly the zero-initialized tile — proof the
    # config value (not the module constant) drives the kernel.
    _, cfg_loose = cfgs(tile_h=16, tile_w=16, chunk=32, transmittance_eps=2.0)
    img_tight, _, _ = run(cloud, cam, cfg_tight)
    img_loose, _, _ = run(cloud, cam, cfg_loose)
    ref = oracle.render(
        cloud.means3d, cloud.quats, cloud.scales, cloud.opacities, cloud.colors, cam
    )
    np.testing.assert_allclose(img_tight[0], ref.image, atol=5e-4, rtol=1e-3)
    assert float(jnp.abs(ref.image).max()) > 1e-2
    np.testing.assert_allclose(img_loose[0], 0.0, atol=1e-7)


def test_shared_binning_matches_per_view(rng):
    """shared_binning=True (one sort per frame, motion-inflated radii)
    stays near-allclose to the exact per-view binning, fwd and bwd, across
    genuinely DIFFERENT virtual views (VERDICT r1 next-step 1b)."""
    cloud = synthetic.random_cloud(rng, 80)
    cams = [synthetic.orbit_camera(a, width=32, img_height=24) for a in (0.0, 0.04, 0.08)]
    vm = jnp.stack([c.viewmat for c in cams])
    cam = cams[0]
    _, cfg_exact = cfgs()
    _, cfg_shared = cfgs(shared_binning=True)
    target = jnp.asarray(rng.uniform(size=(24, 32, 3)), jnp.float32)

    def render(cfg):
        def fwd(m, q, s, o, c):
            return rasterize.rasterize(
                m, q, s, o, c, vm, cam.fx, cam.fy, cam.cx, cam.cy,
                cam.width, cam.height, cfg,
            )[:2]

        args = (cloud.means3d, cloud.quats, cloud.scales, cloud.opacities,
                cloud.colors)
        imgs, alphas = fwd(*args)

        def loss(*a):
            im, al = fwd(*a)
            return jnp.mean((jnp.mean(im, 0) - target) ** 2) + 0.05 * jnp.mean(al)

        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
        return imgs, alphas, grads

    img_e, al_e, g_e = render(cfg_exact)
    img_s, al_s, g_s = render(cfg_shared)
    # exact up to within-tile depth-ORDER ties between views
    np.testing.assert_allclose(img_s, img_e, atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(al_s, al_e, atol=2e-3)
    for name, a, b in zip(("means3d", "quats", "scales", "opacities", "colors"),
                          g_s, g_e):
        scale = max(1e-6, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(a, b, atol=2e-3 * scale, rtol=2e-2,
                                   err_msg=name)


def test_packed_chunk256_quality_regime(rng):
    """chunk=256 + stream_factor=9 — the at-spec quality-run kernel shape
    (chosen so SMEM chunk metadata stays under the 1 MB budget at a 9x
    stream budget; scripts/quality_run.py) — fwd+bwd allclose vs dense.
    400 gaussians on one 16x16 tile forces multi-chunk segments, so the
    cross-chunk transmittance carry is exercised at the new width."""
    cloud = synthetic.random_cloud(rng, 400)
    cam = synthetic.orbit_camera(0.0, width=16, img_height=16)
    target = jnp.asarray(rng.uniform(size=(16, 16, 3)), jnp.float32)
    cfg_x, cfg_p = cfgs(tile_h=16, tile_w=16, chunk=256, stream_factor=9)
    # the dense reference must hold all 400 one-tile entries (the packed
    # path never truncates; cfgs() defaults cap the dense table at 256)
    cfg_x = dataclasses.replace(cfg_x, tile_capacity=512)
    img_x, al_x, g_x = run(cloud, cam, cfg_x, target)
    img_p, al_p, g_p = run(cloud, cam, cfg_p, target)
    np.testing.assert_allclose(img_p, img_x, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(al_p, al_x, atol=5e-4)
    for name, a, b in zip(("means3d", "quats", "scales", "opacities",
                           "colors"), g_p, g_x):
        scale = max(1e-6, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(a, b, atol=1e-4 * scale, rtol=1e-3,
                                   err_msg=name)


def test_packed_dense_occupancy(rng):
    """Opaque scene exercising the transmittance early-exit across chunks."""
    cloud = synthetic.random_cloud(rng, 150)
    cloud = cloud._replace(opacities=jnp.full((150,), 0.97))
    cam = synthetic.orbit_camera(0.0, width=16, img_height=16)
    cfg_x, cfg_p = cfgs(tile_h=16, tile_w=16, chunk=32)
    img_x, al_x, _ = run(cloud, cam, cfg_x)
    img_p, al_p, _ = run(cloud, cam, cfg_p)
    np.testing.assert_allclose(img_p, img_x, atol=5e-4, rtol=1e-3)


def test_prefix_cumsum_matches_matmul(rng):
    """RasterizeConfig.prefix="cumsum" (VPU scan transmittance prefix)
    must be numerically interchangeable with the triangular-matmul mode —
    same math, different summation order (a bench-sweep knob)."""
    cloud = synthetic.random_cloud(rng, 90)
    cam = synthetic.orbit_camera(0.1, width=32, img_height=24)
    target = jnp.asarray(rng.uniform(size=(24, 32, 3)), jnp.float32)
    _, cfg_m = cfgs()
    cfg_c = dataclasses.replace(cfg_m, prefix="cumsum")
    img_m, al_m, g_m = run(cloud, cam, cfg_m, target=target)
    img_c, al_c, g_c = run(cloud, cam, cfg_c, target=target)
    np.testing.assert_allclose(img_c, img_m, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(al_c, al_m, atol=1e-5)
    for a, b in zip(g_c, g_m):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)
