"""Binned rasterizer (XLA backend) vs oracle — forward and backward
allclose (SURVEY.md §4.1: every production path tested against the
readable oracle)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from casualhdrsplat_tpu.config import RasterizeConfig
from casualhdrsplat_tpu.data import synthetic
from casualhdrsplat_tpu.ops import binning, oracle, rasterize
from casualhdrsplat_tpu.ops.projection import project_gaussians


def small_cfg(**kw):
    base = dict(
        tile_h=8, tile_w=16, tile_capacity=128, max_tiles_per_gaussian=64,
        chunk=32, backend="xla",
    )
    base.update(kw)
    return RasterizeConfig(**base)


def render_both(cloud, cam, cfg, background=None):
    imgs, alphas, aux = rasterize.rasterize(
        cloud.means3d, cloud.quats, cloud.scales, cloud.opacities, cloud.colors,
        cam.viewmat[None], cam.fx, cam.fy, cam.cx, cam.cy,
        cam.width, cam.height, cfg, background=background,
    )
    ref = oracle.render(
        cloud.means3d, cloud.quats, cloud.scales, cloud.opacities, cloud.colors,
        cam, background=background,
    )
    return imgs[0], alphas[0], aux, ref


def test_forward_matches_oracle(rng):
    cloud = synthetic.random_cloud(rng, 100)
    cam = synthetic.orbit_camera(0.2, width=40, img_height=24)
    img, alpha, aux, ref = render_both(cloud, cam, small_cfg())
    np.testing.assert_allclose(img, ref.image, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(alpha, ref.alpha, atol=2e-5)
    assert int(aux.num_dropped) == 0


def test_forward_matches_oracle_with_background(rng):
    cloud = synthetic.random_cloud(rng, 60)
    cam = synthetic.orbit_camera(-0.1, width=32, img_height=32)
    bg = jnp.array([0.2, 0.4, 0.6])
    img, alpha, aux, ref = render_both(cloud, cam, small_cfg(), background=bg)
    np.testing.assert_allclose(img, ref.image, atol=2e-5, rtol=1e-4)


def test_forward_nondivisible_image(rng):
    """Image size not a multiple of the tile size: padded tiles cropped."""
    cloud = synthetic.random_cloud(rng, 80)
    cam = synthetic.orbit_camera(0.0, width=37, img_height=21)
    img, alpha, aux, ref = render_both(cloud, cam, small_cfg())
    np.testing.assert_allclose(img, ref.image, atol=2e-5, rtol=1e-4)


def test_multi_view_batch(rng):
    cloud = synthetic.random_cloud(rng, 50)
    cams = [synthetic.orbit_camera(a, width=24, img_height=16) for a in (0.0, 0.3)]
    viewmats = jnp.stack([c.viewmat for c in cams])
    cfg = small_cfg()
    imgs, alphas, aux = rasterize.rasterize(
        cloud.means3d, cloud.quats, cloud.scales, cloud.opacities, cloud.colors,
        viewmats, cams[0].fx, cams[0].fy, cams[0].cx, cams[0].cy,
        cams[0].width, cams[0].height, cfg,
    )
    for i, cam in enumerate(cams):
        ref = oracle.render(
            cloud.means3d, cloud.quats, cloud.scales, cloud.opacities,
            cloud.colors, cam,
        )
        np.testing.assert_allclose(imgs[i], ref.image, atol=2e-5, rtol=1e-4)


def test_backward_matches_oracle(rng):
    """Hand-written custom_vjp vs oracle autodiff: grads for every
    Gaussian parameter group allclose (BASELINE 'pixel-grad allclose')."""
    cloud = synthetic.random_cloud(rng, 40)
    cam = synthetic.orbit_camera(0.1, width=24, img_height=16)
    target = jnp.asarray(rng.uniform(size=(16, 24, 3)), jnp.float32)
    cfg = small_cfg()

    def loss_fast(m, q, s, o, c):
        imgs, alphas, _ = rasterize.rasterize(
            m, q, s, o, c, cam.viewmat[None], cam.fx, cam.fy, cam.cx, cam.cy,
            cam.width, cam.height, cfg,
        )
        return jnp.mean((imgs[0] - target) ** 2) + 0.1 * jnp.mean(alphas)

    def loss_ref(m, q, s, o, c):
        out = oracle.render(m, q, s, o, c, cam)
        return jnp.mean((out.image - target) ** 2) + 0.1 * jnp.mean(out.alpha)

    args = (cloud.means3d, cloud.quats, cloud.scales, cloud.opacities, cloud.colors)
    g_fast = jax.grad(loss_fast, argnums=(0, 1, 2, 3, 4))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    names = ("means3d", "quats", "scales", "opacities", "colors")
    for name, a, b in zip(names, g_fast, g_ref):
        scale = max(1e-6, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(
            a, b, atol=5e-4 * scale, rtol=5e-3, err_msg=name
        )


def test_means2d_offset_grad_tap(rng):
    """The ADC screen-gradient tap: grads w.r.t. a zero 2D offset equal
    the oracle's d loss/d means2d."""
    cloud = synthetic.random_cloud(rng, 30)
    cam = synthetic.orbit_camera(0.0, width=24, img_height=16)
    cfg = small_cfg()
    offset = jnp.zeros((30, 2))

    def loss(off):
        imgs, _, _ = rasterize.rasterize(
            cloud.means3d, cloud.quats, cloud.scales, cloud.opacities,
            cloud.colors, cam.viewmat[None], cam.fx, cam.fy, cam.cx, cam.cy,
            cam.width, cam.height, cfg, means2d_offset=off,
        )
        return jnp.sum(imgs ** 2)

    g = jax.grad(loss)(offset)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_capacity_overflow_truncates_far(rng):
    """Tiny capacity: nearest Gaussians kept, count reported."""
    cloud = synthetic.random_cloud(rng, 200)
    cam = synthetic.orbit_camera(0.0, width=16, img_height=16)
    cfg = small_cfg(tile_h=16, tile_w=16, tile_capacity=32, chunk=32)
    imgs, alphas, aux = rasterize.rasterize(
        cloud.means3d, cloud.quats, cloud.scales, cloud.opacities, cloud.colors,
        cam.viewmat[None], cam.fx, cam.fy, cam.cx, cam.cy,
        cam.width, cam.height, cfg,
    )
    assert int(aux.num_dropped) > 0
    assert np.isfinite(np.asarray(imgs)).all()


def test_antialias_matches_oracle(rng):
    """RasterizeConfig.antialias reaches the projection compensation path
    (VERDICT r1 weak #6) and stays oracle-allclose fwd+bwd."""
    cloud = synthetic.random_cloud(rng, 60)
    cam = synthetic.orbit_camera(0.1, width=32, img_height=24)
    cfg = small_cfg(antialias=True)
    imgs, alphas, aux = rasterize.rasterize(
        cloud.means3d, cloud.quats, cloud.scales, cloud.opacities, cloud.colors,
        cam.viewmat[None], cam.fx, cam.fy, cam.cx, cam.cy,
        cam.width, cam.height, cfg,
    )
    ref_aa = oracle.render(
        cloud.means3d, cloud.quats, cloud.scales, cloud.opacities, cloud.colors,
        cam, antialias=True,
    )
    ref_plain = oracle.render(
        cloud.means3d, cloud.quats, cloud.scales, cloud.opacities, cloud.colors,
        cam, antialias=False,
    )
    np.testing.assert_allclose(imgs[0], ref_aa.image, atol=2e-5, rtol=1e-4)
    # the knob must actually change the output
    assert float(jnp.abs(ref_aa.image - ref_plain.image).max()) > 1e-4


def test_binning_lists_match_bruteforce(rng):
    cloud = synthetic.random_cloud(rng, 60)
    cam = synthetic.orbit_camera(0.0, width=32, img_height=32)
    proj = project_gaussians(
        cloud.means3d, cloud.quats, cloud.scales, cam.viewmat,
        cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
    )
    th = tw = 16
    tiles = binning.assign_tiles(proj, 32, 32, th, tw, 64, 16)
    ntx, nty = binning.tile_grid(32, 32, th, tw)
    idx = np.asarray(tiles.indices)
    m2d = np.asarray(proj.means2d)
    r = np.asarray(proj.radii)
    valid = np.asarray(proj.valid)
    depths = np.asarray(proj.depths)
    for t in range(ntx * nty):
        x0, y0 = (t % ntx) * tw, (t // ntx) * th
        expect = [
            i
            for i in range(60)
            if valid[i]
            and m2d[i, 0] + r[i] >= x0
            and m2d[i, 0] - r[i] < x0 + tw
            and m2d[i, 1] + r[i] >= y0
            and m2d[i, 1] - r[i] < y0 + th
        ]
        expect.sort(key=lambda i: depths[i])
        got = [int(v) for v in idx[t] if v < 60]
        assert got == expect, (t, got, expect)
