"""Halo-masked streaming compositor — zero-copy Pallas kernels (V2.1).

Row-granular gathers/scatters cost ~10-15 ns/row on this TPU, so layouts
that touch [tiles, capacity] slots (the dense path) or re-align the
intersection stream per tile (a packed-with-padding layout) pay for every
padded slot three times (gather, kernel, gradient scatter).  V2.1 touches
each real intersection ~once:

- binning produces the depth-sorted stream ids `s_gauss` (binning.
  sorted_stream); ONE row gather builds `stream_payload = payload[s_gauss]`
  — its autodiff transpose is the single per-Gaussian gradient reduction;
- kernels DMA BLOCK-ALIGNED windows of the stream directly (regular
  BlockSpec with a scalar-prefetched block index — no realignment);
- a tile whose segment starts or ends mid-block shares that boundary
  block with its neighbors; prefetched (seg_lo, seg_hi) bounds mask the
  foreign slots inside the kernel (one iota compare);
- per-chunk scalars (binning.pack_stream_chunks) also carry the output
  row and a `first` flag driving the transmittance-reset / revisiting-
  accumulation pattern; unused budget chunks alias the sentinel row;
- the backward emits per-chunk-slot gradients [C, G, 16]; the wrapper
  scatter-adds them back onto stream positions (positions are computed
  elementwise from per-chunk scalars — only boundary blocks duplicate),
  and XLA's gather transpose finishes the reduction to Gaussians.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from casualhdrsplat_tpu.ops import binning
from casualhdrsplat_tpu.ops.composite import CompositeStatics, _alpha_terms
from casualhdrsplat_tpu.ops.rasterize_pallas import (
    _mm, _prefix_excl, _prefix_incl, _tri_strict,
)

_HIGHEST = jax.lax.Precision.HIGHEST

# Scalar-prefetch arrays live in SMEM (~1 MB): 6 arrays x ~45k chunks
# overflowed it at production scale (remote compile crash), so out_row and
# the two control flags travel packed in ONE int32, and the segment
# bounds — only ever compared against positions inside one chunk-sized
# block — travel BLOCK-RELATIVE (clamped to [0, chunk]) packed 16|16 in a
# second int32.  3 prefetch words/chunk total; 8 virtual views at 131k
# capacity (69k chunks) overflowed SMEM with 4.
_ROW_MASK = (1 << 24) - 1
_FIRST_BIT = 1 << 24
_NEW_BIT = 1 << 25


def pack_meta(chunks):
    return (
        chunks.out_row
        | chunks.first * _FIRST_BIT
        | chunks.block_new * _NEW_BIT
    ).astype(jnp.int32)


def pack_seg(chunks, g: int):
    """Block-relative (lo, hi) clamped to [0, g], packed lo | hi << 16.
    Empty segments (lo == hi) stay empty after clamping."""
    start = chunks.block_id * g
    lo = jnp.clip(chunks.seg_lo - start, 0, g)
    hi = jnp.clip(chunks.seg_hi - start, 0, g)
    return (lo | (hi << 16)).astype(jnp.int32)


def _origin_coords(out_row, statics: CompositeStatics):
    tiles_per_view = statics.tiles_per_view or statics.ntx * statics.nty
    t = out_row % tiles_per_view
    ox = (t % statics.ntx) * statics.tile_w
    oy = (t // statics.ntx) * statics.tile_h
    p = statics.tile_h * statics.tile_w
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    px = (idx % statics.tile_w + ox).astype(jnp.float32) + 0.5
    py = (idx // statics.tile_w + oy).astype(jnp.float32) + 0.5
    return px, py


def _seg_unpack(seg):
    return seg & 0xFFFF, seg >> 16


def _seg_mask(lo_rel, hi_rel, g: int):
    pos = jax.lax.broadcasted_iota(jnp.int32, (g, 1), 0)
    return jnp.logical_and(pos >= lo_rel, pos < hi_rel)  # (G,1)



# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------


def _fwd_kernel(
    block_ref, meta_ref, seg_ref,
    chunks_ref, out_ref, t_scr, *, statics,
):
    g = statics.chunk
    i = pl.program_id(0)
    meta = meta_ref[i]
    lo_rel, hi_rel = _seg_unpack(seg_ref[i])
    px, py = _origin_coords(meta & _ROW_MASK, statics)

    @pl.when((meta & _FIRST_BIT) != 0)
    def _():
        t_scr[...] = jnp.ones_like(t_scr)
        out_ref[0] = jnp.zeros_like(out_ref[0])

    t_in = t_scr[...]

    # Skip saturated tiles AND empty segments (unused budget chunks carry
    # lo == hi): an all-masked chunk is a no-op, and skipping it makes
    # over-provisioned chunk budgets (the sharded path's worst-case
    # per-device bound) nearly free.
    @pl.when(
        jnp.logical_and(
            jnp.max(t_in) >= statics.transmittance_eps, lo_rel < hi_rel
        )
    )
    def _():
        chunk = chunks_ref[:]  # (G, 16)
        alpha, *_ = _alpha_terms(
            chunk, px, py, statics.alpha_clip, statics.alpha_threshold
        )
        mask = _seg_mask(lo_rel, hi_rel, g)
        alpha = jnp.where(mask, alpha, 0.0)
        log1m = jnp.log1p(-alpha)
        s_excl = _prefix_excl(log1m, statics)
        w = alpha * jnp.exp(s_excl) * t_in
        c4 = chunk[:, binning.COL_R : binning.COL_ONE + 1]
        contrib = jax.lax.dot_general(
            c4, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HIGHEST,
        )
        out_ref[0] = out_ref[0] + contrib
        t_scr[...] = t_in * jnp.exp(jnp.sum(log1m, axis=0, keepdims=True))


def forward(
    stream_payload: jnp.ndarray,  # [M, 16] depth-sorted payload stream
    chunks: binning.StreamChunks,
    num_rows: int,
    statics: CompositeStatics,
) -> jnp.ndarray:
    m, pd = stream_payload.shape
    g = statics.chunk
    c = chunks.block_id.shape[0]
    p = statics.tile_h * statics.tile_w
    kernel = functools.partial(_fwd_kernel, statics=statics)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(c,),
        in_specs=[
            pl.BlockSpec(
                (g, pd),
                lambda i, block_ref, *_: (block_ref[i], 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, 4, p),
            lambda i, block_ref, meta_ref, *_: (meta_ref[i] & _ROW_MASK, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((1, p), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        # vma: under shard_map (parallel/render.py) outputs vary over the
        # same mesh axes as the stream operand; empty set elsewhere.
        out_shape=jax.ShapeDtypeStruct(
            (num_rows, 4, p), jnp.float32, vma=jax.typeof(stream_payload).vma
        ),
        cost_estimate=pl.CostEstimate(
            # dominated by the in-chunk prefix: 2*g*g*p MACs per program
            # for the triangular matmul (the old c*g*p*10 estimate was
            # ~25x under, starving the pipeliner's overlap budget), plus
            # the (4,g)@(g,p) contraction and ~20 elementwise ops/cell
            flops=c * (2 * g * g * p + 8 * g * p + 20 * g * p),
            bytes_accessed=c * (g * pd * 4 + 2 * 4 * p * 4),
            transcendentals=2 * c * g * p,
        ),
        interpret=jax.default_backend() == "cpu",
    )(
        chunks.block_id, pack_meta(chunks), pack_seg(chunks, g),
        stream_payload,
    )


# --------------------------------------------------------------------------
# backward
# --------------------------------------------------------------------------


def _bwd_kernel(
    block_ref, meta_ref, seg_ref,
    chunks_ref, out4_ref, g4_ref, d_ref, t_scr, r_scr,
    *, statics,
):
    g = statics.chunk
    i = pl.program_id(0)
    meta = meta_ref[i]
    lo_rel, hi_rel = _seg_unpack(seg_ref[i])
    px, py = _origin_coords(meta & _ROW_MASK, statics)

    @pl.when((meta & _FIRST_BIT) != 0)
    def _():
        t_scr[...] = jnp.ones_like(t_scr)
        r_scr[...] = jnp.zeros_like(r_scr)

    t_in = t_scr[...]
    live_chunk = jnp.logical_and(
        jnp.max(t_in) >= statics.transmittance_eps, lo_rel < hi_rel
    )

    # d output lives in STREAM space (same revisiting pattern as the
    # forward's tile rows): zero the block on its first visit, accumulate
    # the two boundary visits — no scatter needed afterwards.
    @pl.when((meta & _NEW_BIT) != 0)
    def _():
        d_ref[...] = jnp.zeros_like(d_ref[...])

    @pl.when(live_chunk)
    def _():
        c4_tot = out4_ref[0]
        g4 = g4_ref[0]
        chunk = chunks_ref[:]
        alpha, alpha_raw, expf, dx, dy, (cxx, cxy, cyy) = _alpha_terms(
            chunk, px, py, statics.alpha_clip, statics.alpha_threshold
        )
        mask = _seg_mask(lo_rel, hi_rel, g)
        alpha = jnp.where(mask, alpha, 0.0)
        log1m = jnp.log1p(-alpha)
        s_excl = _prefix_excl(log1m, statics)
        t_k = jnp.exp(s_excl) * t_in
        w = alpha * t_k
        c4 = chunk[:, binning.COL_R : binning.COL_ONE + 1]

        d_c4 = jax.lax.dot_general(
            w, g4, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HIGHEST,
        )

        cg = jax.lax.dot_general(
            c4, g4, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HIGHEST,
        )
        # suffix term via the scalar-carry identity (composite._chunk_bwd):
        # term2[k] = sum_c c4_tot_c*g4_c - r_in - prefix_incl(w * cg);
        # ONE (G,G)@(G,P) prefix matmul instead of the 4x-wide
        # lane-concatenated one — the dominant bwd-kernel cost in round 1.
        tot_dot = jnp.sum(c4_tot * g4, axis=0, keepdims=True)  # (1,P)
        u = w * cg
        cum_u = _prefix_incl(u, statics)
        term2 = tot_dot - r_scr[...] - cum_u
        r_out = r_scr[...] + jnp.sum(u, axis=0, keepdims=True)
        dl_da = jnp.where(alpha > 0.0, t_k * cg - term2 / (1.0 - alpha), 0.0)
        live = jnp.logical_and(alpha > 0.0, alpha_raw < statics.alpha_clip)
        g_a = jnp.where(live, dl_da, 0.0)
        g_pw = g_a * alpha

        d_opa = jnp.sum(g_a * expf, axis=1, keepdims=True)
        d_mx = jnp.sum(g_pw * (cxx * dx + cxy * dy), axis=1, keepdims=True)
        d_my = jnp.sum(g_pw * (cyy * dy + cxy * dx), axis=1, keepdims=True)
        d_cxx = jnp.sum(g_pw * (-0.5 * dx * dx), axis=1, keepdims=True)
        d_cyy = jnp.sum(g_pw * (-0.5 * dy * dy), axis=1, keepdims=True)
        d_cxy = jnp.sum(g_pw * (-dx * dy), axis=1, keepdims=True)
        zeros1 = jnp.zeros_like(d_opa)
        d_chunk = jnp.concatenate(
            [d_mx, d_my, d_cxx, d_cxy, d_cyy, d_opa, d_c4[:, :3]]
            + [zeros1] * (binning.PAYLOAD_DIM - 9),
            axis=1,
        )
        # foreign (masked) slots produced exact zeros, so accumulation
        # across the two visits of a boundary block is exact
        d_ref[...] = d_ref[...] + d_chunk
        t_scr[...] = t_in * jnp.exp(jnp.sum(log1m, axis=0, keepdims=True))
        r_scr[...] = r_out


def backward(
    stream_payload: jnp.ndarray,
    chunks: binning.StreamChunks,
    out4: jnp.ndarray,
    g4: jnp.ndarray,
    statics: CompositeStatics,
) -> jnp.ndarray:
    """Returns d stream_payload [M, 16]."""
    m, pd = stream_payload.shape
    g = statics.chunk
    c = chunks.block_id.shape[0]
    p = statics.tile_h * statics.tile_w
    kernel = functools.partial(_bwd_kernel, statics=statics)
    stream_map = lambda i, block_ref, *_: (block_ref[i], 0)
    row_map = lambda i, block_ref, meta_ref, *_: (meta_ref[i] & _ROW_MASK, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(c,),
        in_specs=[
            pl.BlockSpec((g, pd), stream_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, p), row_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, p), row_map, memory_space=pltpu.VMEM),
        ],
        # d is written DIRECTLY into stream space through the same
        # revisited-block pattern (an XLA position scatter here measured
        # 675 ms — 4x the kernel itself)
        out_specs=pl.BlockSpec((g, pd), stream_map, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, p), jnp.float32),  # transmittance carry
            pltpu.VMEM((1, p), jnp.float32),  # scalar suffix carry r
        ],
    )
    vma = jax.typeof(stream_payload).vma | jax.typeof(g4).vma
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, pd), jnp.float32, vma=vma),
        cost_estimate=pl.CostEstimate(
            # one (g,g)@(g,p) prefix + two thin contractions + ~40
            # elementwise ops/cell (see _bwd_kernel body)
            flops=c * (2 * g * g * p + 16 * g * p + 40 * g * p),
            bytes_accessed=c * (2 * g * pd * 4 + 2 * 2 * 4 * p * 4),
            transcendentals=3 * c * g * p,
        ),
        interpret=jax.default_backend() == "cpu",
    )(
        chunks.block_id, pack_meta(chunks), pack_seg(chunks, g),
        stream_payload, out4, g4,
    )


# --------------------------------------------------------------------------
# custom_vjp wrapper
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _make_composite_stream(statics: CompositeStatics, num_rows: int):
    @jax.custom_vjp
    def composite(stream_payload, block_id, out_row, first, seg_lo, seg_hi, block_new):
        chunks = binning.StreamChunks(
            block_id, out_row, first, seg_lo, seg_hi, block_new, jnp.int32(0)
        )
        return forward(stream_payload, chunks, num_rows, statics)

    def fwd(stream_payload, block_id, out_row, first, seg_lo, seg_hi, block_new):
        chunks = binning.StreamChunks(
            block_id, out_row, first, seg_lo, seg_hi, block_new, jnp.int32(0)
        )
        out4 = forward(stream_payload, chunks, num_rows, statics)
        return out4, (stream_payload, chunks, out4)

    def bwd(res, g4):
        stream_payload, chunks, out4 = res
        d = backward(stream_payload, chunks, out4, g4, statics)
        return d, None, None, None, None, None, None

    composite.defvjp(fwd, bwd)
    return composite


@jax.custom_vjp
def clip_cotangent_rows(x: jnp.ndarray, lo, hi) -> jnp.ndarray:
    """Identity forward; the backward ZEROES cotangent rows outside
    [lo, hi).  The Gaussian-sharded path composites only its own tile
    range, so `backward`'s stream-space output is uninitialized memory at
    blocks no local chunk visits — this clip (placed between the stream
    gather and composite_stream) keeps that garbage out of the
    gather-transpose reduction (parallel/render.py)."""
    return x


def _clip_fwd(x, lo, hi):
    return x, (lo, hi, x.shape[0])


def _clip_bwd(res, g):
    lo, hi, m = res
    pos = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    return jnp.where((pos >= lo) & (pos < hi), g, 0.0), None, None


clip_cotangent_rows.defvjp(_clip_fwd, _clip_bwd)


def composite_stream(
    stream_payload: jnp.ndarray,
    chunks: binning.StreamChunks,
    num_rows: int,
    statics: CompositeStatics,
) -> jnp.ndarray:
    """Depth-sorted payload stream -> [num_rows, 4, P] tile composites."""
    if stream_payload.shape[0] % statics.chunk:
        raise ValueError("stream length must be a multiple of the chunk size")
    return _make_composite_stream(statics, num_rows)(
        stream_payload, chunks.block_id, chunks.out_row, chunks.first,
        chunks.seg_lo, chunks.seg_hi, chunks.block_new,
    )