"""Differentiable Gaussian rasterization — public API (SURVEY.md L3):

    rasterize(gaussians, cameras) -> images, aux, full VJP

Reference-lineage equivalent: gsplat `project_gaussians` +
`rasterize_gaussians` autograd Functions over CUDA (SURVEY.md C1-C6).
Here: fused jnp projection/SH -> static-shape tile binning (XLA sort) ->
payload gather -> chunked per-tile compositing (custom_vjp; XLA or Pallas
backend) -> tile reassembly.  Multiple views (the n virtual cameras of a
blurred frame) batch along the tile axis so ONE kernel launch renders all
virtual views of a frame (SURVEY.md P4).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from casualhdrsplat_tpu.config import RasterizeConfig
from casualhdrsplat_tpu.ops import binning
from casualhdrsplat_tpu.ops.composite import CompositeStatics, composite_tiles
from casualhdrsplat_tpu.ops.projection import cull_invisible, project_gaussians


class RasterizeAux(NamedTuple):
    radii: jnp.ndarray  # [V, N] screen radii (0 = culled) — ADC visibility
    depths: jnp.ndarray  # [V, N]
    # [] dropped-contribution counters, split by cause so overflow tuning
    # targets the right knob (stream_factor vs max_tiles_per_gaussian):
    #   num_dropped — stream/tile budget overflow (waterfilled far tail),
    #   num_clipped — bbox CELLS cut by the mtpg center-clamp (fringe
    #   tiles of oversized footprints; alpha there is already small).
    # Units differ by path: per-view binning sums over all virtual views;
    # shared binning counts its single shared stream once per frame.
    num_dropped: jnp.ndarray
    num_clipped: jnp.ndarray


def default_backend() -> str:
    return "pallas" if jax.default_backend() in ("tpu", "axon") else "xla"


def resolve_backend(cfg: RasterizeConfig) -> str:
    return default_backend() if cfg.backend == "auto" else cfg.backend


def rasterize(
    means3d: jnp.ndarray,  # [N,3]
    quats: jnp.ndarray,  # [N,4]
    scales: jnp.ndarray,  # [N,3] activated
    opacities: jnp.ndarray,  # [N] activated
    colors: jnp.ndarray,  # [N,3] per-Gaussian linear HDR radiance
    viewmats: jnp.ndarray,  # [V,4,4] world->cam
    fx,
    fy,
    cx,
    cy,
    width: int,
    height: int,
    cfg: RasterizeConfig,
    background: Optional[jnp.ndarray] = None,  # [3]
    means2d_offset: Optional[jnp.ndarray] = None,  # [N,2] zeros; ADC grad tap
):
    """Render V views of the same Gaussian set.

    Returns (images [V,H,W,3], alphas [V,H,W], aux).
    """
    viewmats = jnp.asarray(viewmats)
    if viewmats.ndim == 2:
        viewmats = viewmats[None]
    v = viewmats.shape[0]
    th, tw = cfg.tile_h, cfg.tile_w
    ntx, nty = binning.tile_grid(width, height, th, tw)
    backend = resolve_backend(cfg)

    if cfg.packed and backend == "pallas":
        return _rasterize_packed(
            means3d, quats, scales, opacities, colors, viewmats,
            fx, fy, cx, cy, width, height, cfg, background, means2d_offset,
        )

    def per_view(viewmat, view_colors):
        proj = project_gaussians(
            means3d, quats, scales, viewmat, fx, fy, cx, cy, width, height,
            near_plane=cfg.near_plane, antialias=cfg.antialias,
        )
        if means2d_offset is not None:
            proj = proj._replace(means2d=proj.means2d + means2d_offset)
        proj = cull_invisible(proj, opacities)
        tiles = binning.assign_tiles(
            proj, width, height, th, tw, cfg.tile_capacity,
            cfg.max_tiles_per_gaussian,
        )
        payload = binning.build_payload(proj, view_colors, opacities)
        gathered = binning.gather_payload(payload, tiles)
        return (gathered, tiles.counts, proj.radii, proj.depths,
                tiles.num_dropped, tiles.num_clipped)

    # colors: shared [N,3] or per-view [V,N,3] (view-dependent SH radiance)
    color_axis = 0 if colors.ndim == 3 else None
    gathered, counts, radii, depths, dropped, clipped = jax.vmap(
        per_view, in_axes=(0, color_axis)
    )(viewmats, colors)
    tt = v * ntx * nty
    gathered = gathered.reshape(tt, cfg.tile_capacity, binning.PAYLOAD_DIM)

    statics = CompositeStatics(
        num_views=v,
        ntx=ntx,
        nty=nty,
        tile_h=th,
        tile_w=tw,
        chunk=cfg.chunk,
        alpha_clip=cfg.alpha_clip,
        alpha_threshold=cfg.alpha_threshold,
        backend=backend,
        transmittance_eps=cfg.transmittance_eps, prefix=cfg.prefix,
    )
    out4 = composite_tiles(
        gathered, statics, counts=counts.reshape(tt)
    )  # [tt, 4, P]

    # Reassemble tiles -> padded image -> crop.
    out4 = out4.reshape(v, nty, ntx, 4, th, tw)
    out4 = out4.transpose(0, 3, 1, 4, 2, 5).reshape(v, 4, nty * th, ntx * tw)
    out4 = out4[:, :, :height, :width]
    images = out4[:, :3].transpose(0, 2, 3, 1)  # [V,H,W,3]
    alphas = jnp.clip(out4[:, 3], 0.0, 1.0)  # [V,H,W]
    if background is not None:
        images = images + (1.0 - alphas)[..., None] * background[None, None, None, :]
    aux = RasterizeAux(radii=radii, depths=depths,
                       num_dropped=jnp.sum(dropped),
                       num_clipped=jnp.sum(clipped))
    return images, alphas, aux


def _rasterize_packed(
    means3d, quats, scales, opacities, colors, viewmats,
    fx, fy, cx, cy, width, height, cfg, background, means2d_offset,
):
    """Halo-masked streaming path (ops/rasterize_packed.py V2.1): one row
    gather into the depth-sorted stream, block-aligned kernel DMA."""
    from casualhdrsplat_tpu.ops import rasterize_packed

    v = viewmats.shape[0]
    n = means3d.shape[0]
    g = cfg.chunk
    th, tw = cfg.tile_h, cfg.tile_w
    ntx, nty = binning.tile_grid(width, height, th, tw)
    num_tiles = ntx * nty
    # static per-view stream budget (rounded to whole chunks)
    s_budget = min(n * cfg.max_tiles_per_gaussian, cfg.stream_factor * n)
    s_budget = -(-s_budget // g) * g
    c_budget = s_budget // g + num_tiles + 1  # tight: see binning.stream_budget
    sentinel = v * num_tiles  # one junk output row shared by all views

    if cfg.shared_binning and v > 1:
        return _rasterize_packed_shared(
            means3d, quats, scales, opacities, colors, viewmats,
            fx, fy, cx, cy, width, height, cfg, background, means2d_offset,
            s_budget, c_budget, sentinel,
        )

    def per_view(viewmat, view_colors, view_idx):
        proj = project_gaussians(
            means3d, quats, scales, viewmat, fx, fy, cx, cy, width, height,
            near_plane=cfg.near_plane, antialias=cfg.antialias,
        )
        if means2d_offset is not None:
            proj = proj._replace(means2d=proj.means2d + means2d_offset)
        proj = cull_invisible(proj, opacities)
        s_gauss, starts, seg_len, clipped = binning.sorted_stream(
            proj.means2d, proj.radii, proj.depths, proj.valid,
            width, height, th, tw, cfg.max_tiles_per_gaussian,
        )
        # budget overflow drops each overloaded tile's FAR TAIL
        # (waterfilled keep-nearest — never whole trailing tiles)
        seg_c, starts_c = binning.waterfill_segments(seg_len, s_budget)
        dropped = jnp.sum(seg_len) - jnp.sum(seg_c)
        chunks = binning.pack_stream_chunks(
            starts_c, seg_c, s_budget, g, c_budget,
            out_row_offset=view_idx * num_tiles, sentinel_row=sentinel,
        )
        payload = binning.build_payload(proj, view_colors, opacities)
        # the ONE row gather: payload rows in compacted stream order
        # (unconditional: this per-view fn runs under vmap — see docstring)
        stream_ids = binning.compact_stream_ids(
            s_gauss, starts, starts_c, s_budget, n, unconditional=True
        )
        stream = payload[stream_ids]  # [s_budget, 16]
        # offset per-view metadata into the concatenated global stream
        chunks = chunks._replace(
            block_id=chunks.block_id + view_idx * (s_budget // g),
            seg_lo=chunks.seg_lo + view_idx * s_budget,
            seg_hi=chunks.seg_hi + view_idx * s_budget,
        )
        return stream, chunks, proj.radii, proj.depths, dropped, clipped

    color_axis = 0 if colors.ndim == 3 else None
    view_ids = jnp.arange(v, dtype=jnp.int32)
    streams, chunks_v, radii, depths, dropped, clipped = jax.vmap(
        per_view, in_axes=(0, color_axis, 0)
    )(viewmats, colors, view_ids)

    stream = streams.reshape(v * s_budget, binning.PAYLOAD_DIM)
    chunks = binning.StreamChunks(
        block_id=chunks_v.block_id.reshape(-1),
        out_row=chunks_v.out_row.reshape(-1),
        first=chunks_v.first.reshape(-1),
        seg_lo=chunks_v.seg_lo.reshape(-1),
        seg_hi=chunks_v.seg_hi.reshape(-1),
        block_new=chunks_v.block_new.reshape(-1),
        num_chunks=jnp.sum(chunks_v.num_chunks),
    )

    statics = CompositeStatics(
        num_views=v, ntx=ntx, nty=nty, tile_h=th, tile_w=tw, chunk=g,
        alpha_clip=cfg.alpha_clip, alpha_threshold=cfg.alpha_threshold,
        backend="pallas", transmittance_eps=cfg.transmittance_eps, prefix=cfg.prefix,
    )
    out4 = rasterize_packed.composite_stream(stream, chunks, sentinel + 1, statics)
    images, alphas = _assemble_tiles(
        out4, sentinel, v, ntx, nty, th, tw, height, width, background
    )
    aux = RasterizeAux(radii=radii, depths=depths,
                       num_dropped=jnp.sum(dropped),
                       num_clipped=jnp.sum(clipped))
    return images, alphas, aux


def _assemble_tiles(out4, sentinel, v, ntx, nty, th, tw, height, width, background):
    """[rows, 4, P] tile composites -> ([V,H,W,3] images, [V,H,W] alphas)."""
    out4 = out4[:sentinel].reshape(v, nty, ntx, 4, th, tw)
    out4 = out4.transpose(0, 3, 1, 4, 2, 5).reshape(v, 4, nty * th, ntx * tw)
    out4 = out4[:, :, :height, :width]
    images = out4[:, :3].transpose(0, 2, 3, 1)  # [V,H,W,3]
    alphas = jnp.clip(out4[:, 3], 0.0, 1.0)  # [V,H,W]
    if background is not None:
        images = images + (1.0 - alphas)[..., None] * background[None, None, None, :]
    return images, alphas


def _rasterize_packed_shared(
    means3d, quats, scales, opacities, colors, viewmats,
    fx, fy, cx, cy, width, height, cfg, background, means2d_offset,
    s_budget, c_budget, sentinel,
):
    """Shared-binning variant of the packed path: ONE (tile, depth) sort at
    a per-Gaussian reference position (mean over the virtual views) with
    Chebyshev-inflated radii, reused by every view.

    Exactness argument: for view k, |pixel - means2d_k|_inf <= radii_k
    implies |pixel - ref|_inf <= cheb_k + radii_k <= r_shared, so the
    shared bbox covers every view's 3-sigma footprint — a Gaussian is
    never missing from a tile it touches.  Per-view alpha still evaluates
    the TRUE per-view payload; the only approximation is the within-tile
    depth ORDER (shared reference depth instead of per-view depth), which
    only matters for view-dependent depth inversions inside one exposure
    window (SURVEY.md C2; VERDICT r1 next-step 1b).
    """
    from casualhdrsplat_tpu.ops import rasterize_packed

    v = viewmats.shape[0]
    n = means3d.shape[0]
    g = cfg.chunk
    th, tw = cfg.tile_h, cfg.tile_w
    ntx, nty = binning.tile_grid(width, height, th, tw)
    num_tiles = ntx * nty

    def project_view(viewmat):
        proj = project_gaussians(
            means3d, quats, scales, viewmat, fx, fy, cx, cy, width, height,
            near_plane=cfg.near_plane, antialias=cfg.antialias,
        )
        if means2d_offset is not None:
            proj = proj._replace(means2d=proj.means2d + means2d_offset)
        return cull_invisible(proj, opacities)

    projs = jax.vmap(project_view)(viewmats)  # Projected with [V,...] leaves

    validf = projs.valid.astype(jnp.float32)  # [V,N]
    denom = jnp.maximum(jnp.sum(validf, axis=0), 1.0)  # [N]
    ref_m2d = jnp.sum(projs.means2d * validf[..., None], axis=0) / denom[:, None]
    ref_depth = jnp.sum(projs.depths * validf, axis=0) / denom
    cheb = jnp.max(jnp.abs(projs.means2d - ref_m2d[None]), axis=-1)  # [V,N]
    r_shared = jnp.max(jnp.where(projs.valid, cheb + projs.radii, 0.0), axis=0)
    valid_any = jnp.any(projs.valid, axis=0)

    s_gauss, starts, seg_len, clipped = binning.sorted_stream(
        ref_m2d, r_shared, ref_depth, valid_any,
        width, height, th, tw, cfg.max_tiles_per_gaussian,
    )
    # waterfilled keep-nearest overflow policy (see the per-view path);
    # matters MORE here: the Chebyshev inflation multiplies demand when
    # within-exposure motion is large.
    seg_c, starts_c = binning.waterfill_segments(seg_len, s_budget)
    dropped = jnp.sum(seg_len) - jnp.sum(seg_c)
    base = binning.pack_stream_chunks(
        starts_c, seg_c, s_budget, g, c_budget,
        out_row_offset=0, sentinel_row=sentinel,
    )
    stream_ids = binning.compact_stream_ids(
        s_gauss, starts, starts_c, s_budget, n
    )

    def per_view_stream(proj, view_colors):
        payload = binning.build_payload(proj, view_colors, opacities)
        return payload[stream_ids]  # [s_budget, 16]

    color_axis = 0 if colors.ndim == 3 else None
    streams = jax.vmap(per_view_stream, in_axes=(0, color_axis))(projs, colors)
    stream = streams.reshape(v * s_budget, binning.PAYLOAD_DIM)

    # Replicate the ONE chunk schedule across views with per-view offsets
    # into the concatenated stream / output rows (same layout the unshared
    # path builds per view).
    view_ids = jnp.arange(v, dtype=jnp.int32)[:, None]  # [V,1]
    used = base.out_row != sentinel
    out_row = jnp.where(
        used[None], base.out_row[None] + view_ids * num_tiles, sentinel
    )
    chunks = binning.StreamChunks(
        block_id=(base.block_id[None] + view_ids * (s_budget // g)).reshape(-1),
        out_row=out_row.reshape(-1).astype(jnp.int32),
        first=jnp.broadcast_to(base.first[None], (v, c_budget)).reshape(-1),
        seg_lo=(base.seg_lo[None] + view_ids * s_budget).reshape(-1),
        seg_hi=(base.seg_hi[None] + view_ids * s_budget).reshape(-1),
        block_new=jnp.broadcast_to(base.block_new[None], (v, c_budget)).reshape(-1),
        num_chunks=base.num_chunks * v,
    )

    statics = CompositeStatics(
        num_views=v, ntx=ntx, nty=nty, tile_h=th, tile_w=tw, chunk=g,
        alpha_clip=cfg.alpha_clip, alpha_threshold=cfg.alpha_threshold,
        backend="pallas", transmittance_eps=cfg.transmittance_eps, prefix=cfg.prefix,
    )
    out4 = rasterize_packed.composite_stream(stream, chunks, sentinel + 1, statics)
    images, alphas = _assemble_tiles(
        out4, sentinel, v, ntx, nty, th, tw, height, width, background
    )
    aux = RasterizeAux(
        radii=projs.radii, depths=projs.depths, num_dropped=dropped,
        num_clipped=clipped,
    )
    return images, alphas, aux
