"""Stream-budget overflow policy: waterfilled keep-nearest drops.

Round-2 regression (at-spec quality run divergence): the packed path's
previous clip-at-end policy truncated the depth-sorted stream in
tile-major order, so a blown budget erased ENTIRE trailing tiles — the
bottom of the image rendered empty.  The waterfill policy instead caps
every tile at a uniform level and keeps each tile's NEAREST entries, the
same semantics as the dense table's per-tile capacity (binning.py:14-16).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from casualhdrsplat_tpu.config import RasterizeConfig
from casualhdrsplat_tpu.data import synthetic
from casualhdrsplat_tpu.ops import binning, rasterize
from casualhdrsplat_tpu.ops.projection import project_gaussians


def test_waterfill_truncates_largest_tiles_only():
    seg = jnp.asarray([5, 100, 3], jnp.int32)
    seg_c, starts_c = binning.waterfill_segments(seg, 20)
    np.testing.assert_array_equal(seg_c, [5, 12, 3])
    np.testing.assert_array_equal(starts_c, [0, 5, 17, 20])


def test_waterfill_no_overflow_is_identity():
    seg = jnp.asarray([7, 0, 12, 4], jnp.int32)
    seg_c, starts_c = binning.waterfill_segments(seg, 64)
    np.testing.assert_array_equal(seg_c, seg)
    np.testing.assert_array_equal(starts_c, [0, 7, 7, 19, 23])


def test_waterfill_tiny_budget():
    seg = jnp.asarray([9, 9, 9], jnp.int32)
    seg_c, _ = binning.waterfill_segments(seg, 7)
    np.testing.assert_array_equal(seg_c, [2, 2, 2])  # 7 // 3 each


def test_compact_stream_ids_keeps_per_tile_heads():
    s_gauss = jnp.arange(12, dtype=jnp.int32)
    starts = jnp.asarray([0, 4, 9, 12], jnp.int32)  # tile lens 4, 5, 3
    seg_c, starts_c = binning.waterfill_segments(starts[1:] - starts[:-1], 8)
    np.testing.assert_array_equal(seg_c, [2, 2, 2])
    ids = binning.compact_stream_ids(s_gauss, starts, starts_c, 8, pad_id=99)
    np.testing.assert_array_equal(ids, [0, 1, 4, 5, 9, 10, 99, 99])


def test_compact_stream_ids_budget_exceeds_stream():
    """budget > len(s_gauss): chunk-rounding can push the stream budget
    past N*mtpg (mtpg < stream_factor with N*mtpg not a chunk multiple);
    BOTH cond branches must trace and pad with pad_id (regression: the
    no-overflow prefix branch sliced s_gauss[:budget] and crashed)."""
    s_gauss = jnp.arange(12, dtype=jnp.int32)
    starts = jnp.asarray([0, 4, 9, 12], jnp.int32)
    # budget 16 > total 12, nothing overflows -> identity prefix + pad
    seg_c, starts_c = binning.waterfill_segments(starts[1:] - starts[:-1], 16)
    ids = binning.compact_stream_ids(s_gauss, starts, starts_c, 16, pad_id=99)
    np.testing.assert_array_equal(
        ids, list(range(12)) + [99, 99, 99, 99]
    )
    # and the vmapped (unconditional) branch under the same shapes
    ids_u = binning.compact_stream_ids(
        s_gauss, starts, starts_c, 16, pad_id=99, unconditional=True
    )
    np.testing.assert_array_equal(ids_u, ids)


def _project(cloud, cam, cfg):
    return project_gaussians(
        cloud.means3d, cloud.quats, cloud.scales, cam.viewmat,
        cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
        near_plane=cfg.near_plane,
    )


def test_overflow_keeps_every_tile_populated(rng):
    """With a deliberately tiny stream budget, untruncated tiles must stay
    EXACT vs the dense reference and no tile may be erased outright."""
    # uneven tile loads: a few large blobs everywhere + many small ones
    # CONCENTRATED top-left, so some tiles stay under the waterfill level
    big = synthetic.random_cloud(rng, 12, scale_range=(0.25, 0.5))
    small = synthetic.random_cloud(rng, 100, scale_range=(0.02, 0.06))
    small = small._replace(
        means3d=small.means3d * 0.5 + jnp.asarray([-0.7, 0.5, 0.0])
    )
    cloud = synthetic.GaussianCloud(
        *[jnp.concatenate([a, b], axis=0) for a, b in zip(big, small)]
    )
    cam = synthetic.orbit_camera(0.0, width=32, img_height=24)
    base = dict(tile_h=8, tile_w=16, max_tiles_per_gaussian=32, chunk=32)
    cfg_ref = RasterizeConfig(backend="xla", packed=False, tile_capacity=512,
                              **base)
    cfg_tiny = RasterizeConfig(backend="pallas", packed=True, stream_factor=1,
                               tile_capacity=64, **base)

    def render(cfg):
        return rasterize.rasterize(
            cloud.means3d, cloud.quats, cloud.scales, cloud.opacities,
            cloud.colors, cam.viewmat[None], cam.fx, cam.fy, cam.cx, cam.cy,
            cam.width, cam.height, cfg,
        )

    img_ref, _, aux_ref = render(cfg_ref)
    img_tiny, _, aux_tiny = render(cfg_tiny)
    assert int(aux_ref.num_dropped) == 0
    assert int(aux_tiny.num_dropped) > 0  # the budget IS overflowing

    # recompute the waterfill level the packed path used
    proj = _project(cloud, cam, cfg_tiny)
    _, _, seg_len, _ = binning.sorted_stream(
        proj.means2d, proj.radii, proj.depths, proj.valid,
        cam.width, cam.height, 8, 16, 32,
    )
    n = cloud.means3d.shape[0]
    s_budget = -(-min(n * 32, 1 * n) // 32) * 32
    seg_c, _ = binning.waterfill_segments(seg_len, s_budget)
    exact_tiles = np.asarray(seg_c == seg_len)

    ntx, nty = binning.tile_grid(cam.width, cam.height, 8, 16)
    assert exact_tiles.sum() >= 1  # policy must spare the light tiles
    for t in range(ntx * nty):
        y0, x0 = (t // ntx) * 8, (t % ntx) * 16
        ref_region = np.asarray(img_ref[0, y0:y0 + 8, x0:x0 + 16])
        got_region = np.asarray(img_tiny[0, y0:y0 + 8, x0:x0 + 16])
        if exact_tiles[t]:
            np.testing.assert_allclose(
                got_region, ref_region, atol=1e-5, rtol=1e-4,
                err_msg=f"untruncated tile {t} must stay exact",
            )
        elif ref_region.max() > 0.05:
            # truncated tiles keep their NEAREST entries: never erased
            assert got_region.max() > 0.0, f"tile {t} erased by overflow"


def test_overflow_shared_binning_keeps_tiles(rng):
    """Same invariant through the shared-binning multi-view path."""
    cloud = synthetic.random_cloud(rng, 100, scale_range=(0.25, 0.6))
    cams = [synthetic.orbit_camera(a, width=32, img_height=24)
            for a in (0.0, 0.05)]
    vm = jnp.stack([c.viewmat for c in cams])
    cam = cams[0]
    base = dict(tile_h=8, tile_w=16, max_tiles_per_gaussian=32, chunk=32)
    cfg_ref = RasterizeConfig(backend="xla", packed=False, tile_capacity=512,
                              **base)
    cfg_tiny = RasterizeConfig(backend="pallas", packed=True, stream_factor=1,
                               shared_binning=True, tile_capacity=64, **base)

    def render(cfg):
        return rasterize.rasterize(
            cloud.means3d, cloud.quats, cloud.scales, cloud.opacities,
            cloud.colors, vm, cam.fx, cam.fy, cam.cx, cam.cy,
            cam.width, cam.height, cfg,
        )

    img_ref, _, _ = render(cfg_ref)
    img_tiny, _, aux = render(cfg_tiny)
    assert int(aux.num_dropped) > 0
    ntx, nty = binning.tile_grid(cam.width, cam.height, 8, 16)
    for v in range(2):
        for t in range(ntx * nty):
            y0, x0 = (t // ntx) * 8, (t % ntx) * 16
            ref_region = np.asarray(img_ref[v, y0:y0 + 8, x0:x0 + 16])
            got_region = np.asarray(img_tiny[v, y0:y0 + 8, x0:x0 + 16])
            if ref_region.max() > 0.05:
                assert got_region.max() > 0.0, f"view {v} tile {t} erased"


def test_mtpg_overflow_center_clamped_and_counted():
    """A footprint larger than max_tiles_per_gaussian must (a) surface in
    the clipped count — it was previously invisible to every dropped
    diagnostic — and (b) keep the CENTRAL tiles of the bbox (the splat
    mass), not the row-major top rows (banded artifacts)."""
    import jax.numpy as jnp

    from casualhdrsplat_tpu.ops import binning

    w = h = 128  # 8x8 grid of 16x16 tiles
    mtpg = 4
    means2d = jnp.array([[64.0, 64.0]])  # center of the image
    radii = jnp.array([60.0])  # bbox covers ~the whole 8x8 grid
    depths = jnp.array([1.0])
    valid = jnp.array([True])
    s_gauss, starts, seg_len, clipped = binning.sorted_stream(
        means2d, radii, depths, valid, w, h, 16, 16, mtpg
    )
    assert int(clipped) > 0
    kept_tiles = [int(t) for t in jnp.nonzero(seg_len)[0]]
    assert len(kept_tiles) <= mtpg
    # the mean sits in tile (4,4) of the 8x8 grid; the kept block must
    # surround it (center-clamp), i.e. every kept tile within 1 cell
    for t in kept_tiles:
        ty, tx = divmod(t, 8)
        assert abs(tx - 4) <= 1 and abs(ty - 4) <= 1, kept_tiles
    # small footprints are untouched and report zero clipped
    _, _, seg_small, clip_small = binning.sorted_stream(
        means2d, jnp.array([10.0]), depths, valid, w, h, 16, 16, 32
    )
    assert int(clip_small) == 0
    assert int(jnp.sum(seg_small)) == 4  # 2x2 tiles at radius 10
