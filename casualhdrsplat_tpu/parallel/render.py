"""Sharded rendering: shard_map rasterizer over the (data, gauss) mesh
(SURVEY.md P1-P4, §5.8).

Communication shape (the §5.7 analysis): Gaussians are the moving "keys",
pixel tiles the stationary "queries" —

1. each device projects ITS Gaussian shard for ITS virtual-view shard
   (pure local VPU work);
2. `all_gather` of the projected screen packets (16 floats/Gaussian —
   ~4x smaller than raw parameters, which is why the gather sits AFTER
   projection) along `gauss`, riding ICI;
3. the `gauss` axis then re-purposes as TILE parallelism: every device
   bins the full packet set for its views and composites its slice of
   tiles (Pallas/XLA chunked kernel, ops/composite.py);
4. backward is the shard_map transpose: the all-gather transposes to a
   psum-scatter, landing per-Gaussian gradients on their home shards
   deterministically (P3) — pose/exposure/CRF grads psum over both axes.

The blur average, CRF, and losses run OUTSIDE the shard_map under jit
auto-sharding, so GSPMD fuses their collectives with the optimizer's.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from casualhdrsplat_tpu.config import ModelConfig, RasterizeConfig
from casualhdrsplat_tpu.geometry import lie
from casualhdrsplat_tpu.models import crf as crf_mod
from casualhdrsplat_tpu.models import gaussians as gauss_mod
from casualhdrsplat_tpu.ops import binning, rasterize_packed
from casualhdrsplat_tpu.ops.composite import CompositeStatics, composite_tiles
from casualhdrsplat_tpu.ops.projection import cull_invisible, project_gaussians
from casualhdrsplat_tpu.ops.rasterize import resolve_backend
from casualhdrsplat_tpu.parallel.mesh import DATA_AXIS, GAUSS_AXIS


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _packed_local_tiles(
    payload, aux, g_idx, cfg: RasterizeConfig, width, height,
    gauss_size, tpd, tiles_pad, num_tiles, real_view,
):
    """Streaming-compositor tile stage of the sharded renderer (runs
    INSIDE shard_map, after the P2 all-gather).

    - Binning dedup (VERDICT r1 next-step 2): the per-view (tile, depth)
      sort runs ONCE per (view, payload) — views round-robin over the
      `gauss` axis, results all-gathered — instead of every gauss-axis
      device re-sorting every view identically.
    - Each device then packs a chunk schedule for ITS tile range only (a
      contiguous slice of the sorted stream) and runs the same
      rasterize_packed kernels as the single-chip path.  The worst-case
      per-device chunk budget is cheap because empty-segment chunks
      short-circuit in the kernel.
    - The backward writes stream-space gradients only for visited blocks;
      clip_cotangent_rows zeroes the unvisited (uninitialized) rows, and
      the all-gather transpose still psum-scatters per-Gaussian partials
      across the mesh.

    Returns (out4 [v_local, tpd, 4, P] local tile composites,
    dropped_total replicated scalar).
    """
    v_local, n_full, _ = payload.shape
    th, tw = cfg.tile_h, cfg.tile_w
    gch = cfg.chunk
    s_budget = min(n_full * cfg.max_tiles_per_gaussian, cfg.stream_factor * n_full)
    s_budget = -(-s_budget // gch) * gch
    c_local = s_budget // gch + tpd + 1
    sentinel = v_local * tiles_pad
    num_rows = sentinel + 1

    # ---- binning: once per (view, payload), round-robin over gauss ----
    n_bin = -(-v_local // gauss_size)
    my_views = jnp.clip(
        g_idx + jnp.arange(n_bin, dtype=jnp.int32) * gauss_size, 0, v_local - 1
    )

    def bin_view(payload_v, aux_v):
        s_gauss, starts, seg_len, clipped = binning.sorted_stream(
            payload_v[:, binning.COL_MX : binning.COL_MY + 1],
            aux_v[:, 0], aux_v[:, 1], aux_v[:, 2] > 0.5,
            width, height, th, tw, cfg.max_tiles_per_gaussian,
        )
        # budget overflow drops each overloaded tile's FAR TAIL (waterfill
        # keep-nearest; same policy as the single-chip packed path)
        seg_c, starts_c = binning.waterfill_segments(seg_len, s_budget)
        dropped = jnp.sum(seg_len) - jnp.sum(seg_c)
        stream_ids = binning.compact_stream_ids(
            s_gauss, starts, starts_c, s_budget, n_full, unconditional=True
        )
        return starts_c, stream_ids, dropped + clipped

    starts_b, ids_b, drop_b = jax.vmap(bin_view)(payload[my_views], aux[my_views])
    starts_all = jax.lax.all_gather(starts_b, GAUSS_AXIS)  # [gs, n_bin, T+1]
    ids_all = jax.lax.all_gather(ids_b, GAUSS_AXIS)  # [gs, n_bin, s_budget]
    drop_all = jax.lax.all_gather(drop_b, GAUSS_AXIS)  # [gs, n_bin]
    vj = jnp.arange(v_local)
    starts_v = starts_all[vj % gauss_size, vj // gauss_size]  # [v_local, T+1]
    ids_v = ids_all[vj % gauss_size, vj // gauss_size]
    slot_view = (
        jnp.arange(gauss_size, dtype=jnp.int32)[:, None]
        + jnp.arange(n_bin, dtype=jnp.int32)[None, :] * gauss_size
    )  # local view index each (gauss, bin) slot binned
    assigned = (slot_view < v_local) & real_view[
        jnp.clip(slot_view, 0, v_local - 1)
    ]
    dropped_views = jnp.sum(jnp.where(assigned, drop_all, 0))
    dropped_total = jax.lax.pmean(
        jax.lax.psum(dropped_views, DATA_AXIS), GAUSS_AXIS
    )

    # extend tile starts over the padded tile range (padded tiles empty)
    pad_t = tiles_pad - num_tiles
    starts_pv = (
        jnp.concatenate(
            [starts_v, jnp.broadcast_to(starts_v[:, -1:], (v_local, pad_t))],
            axis=1,
        )
        if pad_t
        else starts_v
    )  # [v_local, tiles_pad + 1]

    def prep_view(payload_v, ids_one, starts_one, view_idx):
        padded = jnp.concatenate(
            [payload_v, jnp.zeros((1, binning.PAYLOAD_DIM))], axis=0
        )
        stream = padded[ids_one]  # [s_budget, 16] — the ONE row gather
        loc = jax.lax.dynamic_slice_in_dim(starts_one, g_idx * tpd, tpd + 1)
        stream = rasterize_packed.clip_cotangent_rows(stream, loc[0], loc[-1])
        ch = binning.pack_stream_chunks(
            loc, loc[1:] - loc[:-1], s_budget, gch, c_local,
            out_row_offset=0, sentinel_row=sentinel,
        )
        used = ch.out_row != sentinel
        # row layout: view * tiles_pad + global padded tile, so origins
        # come out of row % tiles_per_view(=tiles_pad) and every device's
        # row slice is static; padded tiles are empty (zeroed, dropped at
        # assembly).
        row = jnp.where(
            used, view_idx * tiles_pad + ch.out_row + g_idx * tpd, sentinel
        )
        ch = ch._replace(
            out_row=row.astype(jnp.int32),
            block_id=ch.block_id + view_idx * (s_budget // gch),
            seg_lo=ch.seg_lo + view_idx * s_budget,
            seg_hi=ch.seg_hi + view_idx * s_budget,
        )
        return stream, ch

    streams, ch_v = jax.vmap(prep_view)(
        payload, ids_v, starts_pv, jnp.arange(v_local, dtype=jnp.int32)
    )
    stream_cat = streams.reshape(v_local * s_budget, binning.PAYLOAD_DIM)
    chunks = binning.StreamChunks(
        block_id=ch_v.block_id.reshape(-1),
        out_row=ch_v.out_row.reshape(-1),
        first=ch_v.first.reshape(-1),
        seg_lo=ch_v.seg_lo.reshape(-1),
        seg_hi=ch_v.seg_hi.reshape(-1),
        block_new=ch_v.block_new.reshape(-1),
        num_chunks=jnp.sum(ch_v.num_chunks),
    )
    statics = CompositeStatics(
        num_views=v_local, ntx=binning.tile_grid(width, height, th, tw)[0],
        nty=binning.tile_grid(width, height, th, tw)[1],
        tile_h=th, tile_w=tw, chunk=gch,
        alpha_clip=cfg.alpha_clip, alpha_threshold=cfg.alpha_threshold,
        backend="pallas", transmittance_eps=cfg.transmittance_eps, prefix=cfg.prefix,
        tiles_per_view=tiles_pad,
    )
    out_full = rasterize_packed.composite_stream(
        stream_cat, chunks, num_rows, statics
    )  # [num_rows, 4, P]; rows outside this device's tiles are junk

    def slice_view(view_idx):
        return jax.lax.dynamic_slice_in_dim(
            out_full, view_idx * tiles_pad + g_idx * tpd, tpd, axis=0
        )

    out4 = jax.vmap(slice_view)(jnp.arange(v_local))  # [v_local, tpd, 4, P]
    return out4, dropped_total


def rasterize_sharded(
    gauss_params,  # dict of [N,...] arrays, N sharded on `gauss`
    viewmats: jnp.ndarray,  # [V,4,4], V sharded on `data` (V % data == 0)
    fx, fy, cx, cy,
    width: int,
    height: int,
    cfg: RasterizeConfig,
    mesh: Mesh,
    sh_degree: int,
    means2d_offset: Optional[jnp.ndarray] = None,  # [N,2] sharded on gauss
):
    """Returns (hdr [V,H,W,3], alphas [V,H,W], radii [V,N])."""
    th, tw = cfg.tile_h, cfg.tile_w
    ntx, nty = binning.tile_grid(width, height, th, tw)
    num_tiles = ntx * nty
    gauss_size = mesh.shape[GAUSS_AXIS]
    data_size = mesh.shape[DATA_AXIS]
    num_views = viewmats.shape[0]
    if num_views % data_size:
        # pad the view batch to the data axis (extras dropped after
        # assembly) so any mesh shape accepts any virtual-view count
        pad = _round_up(num_views, data_size) - num_views
        viewmats = jnp.concatenate(
            [viewmats, jnp.tile(viewmats[-1:], (pad, 1, 1))], axis=0
        )
    tiles_pad = _round_up(num_tiles, gauss_size)
    tpd = tiles_pad // gauss_size
    statics = CompositeStatics(
        num_views=1,  # origins computed per padded-tile index below
        ntx=ntx,
        nty=nty,
        tile_h=th,
        tile_w=tw,
        chunk=cfg.chunk,
        alpha_clip=cfg.alpha_clip,
        alpha_threshold=cfg.alpha_threshold,
        backend=resolve_backend(cfg),
        transmittance_eps=cfg.transmittance_eps, prefix=cfg.prefix,
    )
    if means2d_offset is None:
        means2d_offset = jnp.zeros((gauss_params["means"].shape[0], 2))
    # Streaming compositor under shard_map (VERDICT r1 next-step 2): same
    # condition as the single-chip dispatch in ops/rasterize.rasterize.
    use_packed = cfg.packed and resolve_backend(cfg) == "pallas"

    def body(gp, offset, viewmats_all):
        # local shapes: gp leaves [N/g, ...]; viewmats_all [V, 4, 4]
        # replicated (tiny) — sliced per data row here so its cotangent
        # is a clean psum instead of a data-sharded scatter.
        act = gauss_mod.activate(gp)
        g_idx = jax.lax.axis_index(GAUSS_AXIS)
        d_idx = jax.lax.axis_index(DATA_AXIS)
        v_local = viewmats_all.shape[0] // data_size
        vms = jax.lax.dynamic_slice_in_dim(
            viewmats_all, d_idx * v_local, v_local, axis=0
        )
        # view-batch pad copies (num_views % data_size != 0) must not
        # count toward the dropped diagnostic — they re-bin identically
        real_view = (d_idx * v_local + jnp.arange(v_local)) < num_views

        def per_view(viewmat):
            c2w = lie.se3_inverse(viewmat)
            colors = gauss_mod.colors_for_view(act, c2w, sh_degree)
            proj = project_gaussians(
                act.means3d, act.quats, act.scales, viewmat,
                fx, fy, cx, cy, width, height, near_plane=cfg.near_plane,
                antialias=cfg.antialias,
            )
            proj = proj._replace(means2d=proj.means2d + offset)
            proj = cull_invisible(proj, act.opacities)
            opa = jnp.where(proj.valid, act.opacities * proj.compensation, 0.0)
            payload = binning.build_payload_rows(
                proj.means2d, proj.conics, opa, colors
            )  # [N/g, 16]
            aux = jnp.stack(
                [proj.radii, proj.depths, proj.valid.astype(jnp.float32)], axis=-1
            )
            return payload, aux, proj.radii, proj.depths

        payload_l, aux_l, radii_l, depths_l = jax.vmap(per_view)(vms)

        # P2 -> P1 pivot: gather packets along gauss, then split tiles.
        payload = jax.lax.all_gather(
            payload_l, GAUSS_AXIS, axis=1, tiled=True
        )  # [V/d, N, 16]
        aux = jax.lax.all_gather(aux_l, GAUSS_AXIS, axis=1, tiled=True)

        if use_packed:
            out4, dropped_total = _packed_local_tiles(
                payload, aux, g_idx, cfg, width, height, gauss_size, tpd,
                tiles_pad, num_tiles, real_view,
            )
            return out4, radii_l, depths_l, dropped_total

        def bin_and_gather(payload_v, aux_v):
            tiles = binning.assign_tiles_arrays(
                payload_v[:, binning.COL_MX : binning.COL_MY + 1],
                aux_v[:, 0],
                aux_v[:, 1],
                aux_v[:, 2] > 0.5,
                width, height, th, tw, cfg.tile_capacity,
                cfg.max_tiles_per_gaussian,
            )
            padded = jnp.concatenate(
                [payload_v, jnp.zeros((1, binning.PAYLOAD_DIM))], axis=0
            )
            # pad the tile table to a multiple of the gauss axis, then
            # slice this device's tile range (P1 after the P2 gather)
            table = jnp.concatenate(
                [
                    tiles.indices,
                    jnp.full(
                        (tiles_pad - num_tiles, cfg.tile_capacity),
                        payload_v.shape[0],  # the appended zero pad row
                        jnp.int32,
                    ),
                ],
                axis=0,
            ) if tiles_pad > num_tiles else tiles.indices
            local_tiles = jax.lax.dynamic_slice_in_dim(
                table, g_idx * tpd, tpd, axis=0
            )
            counts_pad = jnp.concatenate(
                [tiles.counts, jnp.zeros((tiles_pad - num_tiles,), jnp.int32)]
            ) if tiles_pad > num_tiles else tiles.counts
            local_counts = jax.lax.dynamic_slice_in_dim(
                counts_pad, g_idx * tpd, tpd, axis=0
            )
            return padded[local_tiles], local_counts, tiles.num_dropped

        gathered, counts_l, dropped = jax.vmap(bin_and_gather)(payload, aux)
        vl = gathered.shape[0]
        flat = gathered.reshape(vl * tpd, cfg.tile_capacity, binning.PAYLOAD_DIM)

        # composite with per-tile origins from the GLOBAL padded tile
        # index: local program i of view v maps to tile g_idx*tpd + i
        # (row-major; padded tiles wrap via the index modulo and are
        # dropped at assembly).
        tile_indices = (
            g_idx * tpd + jnp.tile(jnp.arange(tpd, dtype=jnp.int32), (vl,))
        ) % num_tiles
        out4 = composite_tiles(
            flat, statics, tile_indices, counts=counts_l.reshape(vl * tpd)
        )
        out4 = out4.reshape(vl, tpd, 4, th * tw)
        # overflow diagnostic: reduce to a replicated scalar (every view
        # counts once; the gauss axis all computed identical bins)
        dropped_total = jax.lax.pmean(
            jax.lax.psum(jnp.sum(jnp.where(real_view, dropped, 0)), DATA_AXIS),
            GAUSS_AXIS,
        )
        return out4, radii_l, depths_l, dropped_total

    in_specs = (
        jax.tree.map(lambda _: P(GAUSS_AXIS), gauss_params),
        P(GAUSS_AXIS),
        P(),  # viewmats replicated; sliced per data row in body
    )
    out_specs = (
        P(DATA_AXIS, GAUSS_AXIS),
        P(DATA_AXIS, GAUSS_AXIS),
        P(DATA_AXIS, GAUSS_AXIS),
        P(),
    )
    # check_vma=False: Pallas index_maps combine varying scalar-prefetch
    # operands with unvaried grid indices, which the vma checker rejects
    # (JAX suggests this exact workaround); collective correctness is
    # still exercised by the sharded-vs-single allclose tests.
    out4, radii, depths, dropped = jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )(gauss_params, means2d_offset, viewmats)

    # assembly: the blur average + SSIM loss need full images, so gather
    # the tile outputs to replicated before the tile->image reshuffle
    # (small: V*H*W*4 floats; GSPMD turns this into one all-gather).
    # with_sharding_constraint under trace (device_put would stamp
    # explicit-sharding types that leak into cotangents); device_put in
    # eager mode where the constraint is unavailable.
    def to_replicated(x):
        if isinstance(x, jax.core.Tracer):
            # reshard (not with_sharding_constraint): shard_map outputs are
            # explicitly typed [..@data, ..@gauss]; reshard rewrites the
            # sharding TYPE so downstream reshapes see a replicated array
            return jax.sharding.reshard(x, NamedSharding(mesh, P()))
        return jax.device_put(x, NamedSharding(mesh, P()))

    out4 = to_replicated(out4)
    radii = to_replicated(radii)
    depths = to_replicated(depths)
    v = out4.shape[0]
    # split one axis per reshape (multi-axis splits need explicit output
    # shardings under JAX's sharding-typed reshape rule)
    out4 = out4[:, :num_tiles].reshape(v, nty, ntx, 4, th * tw)
    out4 = out4.reshape(v, nty, ntx, 4, th, tw)
    out4 = out4.transpose(0, 3, 1, 4, 2, 5).reshape(v, 4, nty * th, ntx * tw)
    out4 = out4[:, :, :height, :width]
    hdr = out4[:num_views, :3].transpose(0, 2, 3, 1)
    alphas = jnp.clip(out4[:num_views, 3], 0.0, 1.0)
    return hdr, alphas, radii[:num_views], depths[:num_views], dropped


def render_frame_sharded(
    params,
    scene,
    frame_id,
    cfg: ModelConfig,
    mesh: Mesh,
    sh_degree: Optional[int] = None,
    means2d_offset: Optional[jnp.ndarray] = None,
):
    """Sharded twin of models.image_formation.render_frame: same math,
    mesh-parallel rasterization.  Returns the same FrameRender tuple."""
    from casualhdrsplat_tpu.geometry import spline
    from casualhdrsplat_tpu.models import image_formation as imf
    from casualhdrsplat_tpu.ops.rasterize import RasterizeAux

    n = cfg.num_virtual_views
    deg = cfg.sh_degree if sh_degree is None else sh_degree
    t_i = scene.timestamps[frame_id]
    dt = imf.exposure_of(params, frame_id)
    if cfg.optimize_poses:
        t_k = spline.sample_virtual_times(t_i, dt, n)
        viewmats = imf.poses_at(params, scene, t_k, cfg)
    else:
        viewmats = jnp.tile(
            imf.poses_at(params, scene, jnp.array([t_i]), cfg), (n, 1, 1)
        )

    hdr, alphas, radii, depths, dropped = rasterize_sharded(
        params["gaussians"], viewmats,
        scene.fx, scene.fy, scene.cx, scene.cy, scene.width, scene.height,
        cfg.rasterize, mesh, deg, means2d_offset=means2d_offset,
    )
    if cfg.white_background:
        hdr = hdr + (1.0 - alphas)[..., None]
    ldr = crf_mod.apply(params["crf"], hdr * dt, cfg.crf)
    blurred = jnp.mean(ldr, axis=0)
    # the sharded binner reports one combined counter (overflow + clipped
    # travel together through the collective); clipped stays zero here
    aux = RasterizeAux(radii=radii, depths=depths, num_dropped=dropped,
                       num_clipped=jnp.zeros((), jnp.int32))
    return imf.FrameRender(
        blurred_ldr=blurred, sharp_ldr=ldr, sharp_hdr=hdr, alphas=alphas, aux=aux
    )


