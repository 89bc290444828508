"""Pallas TPU kernels for per-tile alpha compositing (SURVEY.md C3/C4, M1).

Replaces the reference lineage's CUDA `rasterize_forward` /
`rasterize_backward` (one thread per pixel, shared-memory Gaussian batches,
atomic gradient adds) with a TPU-native formulation:

- grid = one program per image tile; the tile's depth-ordered Gaussian
  payload [capacity, 16] streams through VMEM via the pallas pipeline;
- within a program, Gaussians are processed in chunks of G; transmittance
  prefix products become log-space prefix sums computed as a strictly-
  lower-triangular (G,G)@(G,P) matmul on the MXU;
- color accumulation and all per-Gaussian gradient reductions are
  (4,G)@(G,P) / (G,P)@(P,k) matmuls — MXU again;
- a while-loop early-exits whole chunks once every pixel in the tile is
  saturated (max transmittance < transmittance_eps), the TPU analog of the
  CUDA per-pixel early stop — bounded-error by construction;
- the backward runs FRONT-to-back with carried (transmittance, prefix4)
  state (suffix-sum identity, see ops/composite.py) and writes per-slot
  gradients — no atomics; the caller's gather-transpose segment-sums them.

Numerics: the prefix matmuls run at Precision.HIGHEST (f32 passes) —
bf16's 2^-8 relative error on log-transmittance sums would be visible.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from casualhdrsplat_tpu.ops import binning
from casualhdrsplat_tpu.ops.composite import CompositeStatics, _alpha_terms

TRANSMITTANCE_EPS = 1e-4  # default for CompositeStatics.transmittance_eps
_HIGHEST = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HIGHEST,
    )


def _tri_strict(g: int):
    row = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
    return (row > col).astype(jnp.float32)


def _scan_incl(x):
    """Inclusive prefix sum over axis 0 as a log-depth Hillis-Steele
    ladder of circular rolls + masks (jnp.cumsum has no Mosaic lowering;
    the wrapped rows of each roll are masked off, so the result is exact
    up to summation order)."""
    from jax.experimental.pallas import tpu as pltpu

    g = x.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    acc, k = x, 1
    while k < g:
        sh = pltpu.roll(acc, shift=k, axis=0)
        acc = acc + jnp.where(rows >= k, sh, 0.0)
        k *= 2
    return acc


def _prefix_excl(x, statics):
    """Exclusive prefix sum over the chunk axis: triangular MXU matmul or
    log-depth VPU scan per statics.prefix (identical up to summation
    order)."""
    if statics.prefix == "cumsum":
        return _scan_incl(x) - x
    return _mm(_tri_strict(statics.chunk), x)


def _prefix_incl(x, statics):
    if statics.prefix == "cumsum":
        return _scan_incl(x)
    g = statics.chunk
    return _mm(_tri_strict(g) + jnp.eye(g, dtype=jnp.float32), x)


def _pixel_coords(tile_index, statics: CompositeStatics):
    tiles_per_view = statics.tiles_per_view or statics.ntx * statics.nty
    t = tile_index % tiles_per_view
    ox = (t % statics.ntx) * statics.tile_w
    oy = (t // statics.ntx) * statics.tile_h
    p = statics.tile_h * statics.tile_w
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    px = (idx % statics.tile_w + ox).astype(jnp.float32) + 0.5
    py = (idx // statics.tile_w + oy).astype(jnp.float32) + 0.5
    return px, py


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------


def _fwd_kernel(
    tile_idx_ref, counts_ref, payload_ref, out_ref, *,
    statics: CompositeStatics, cap: int,
):
    g = statics.chunk
    p = statics.tile_h * statics.tile_w
    i = pl.program_id(0)
    px, py = _pixel_coords(tile_idx_ref[i], statics)
    # only the occupied chunks of this tile's list (padding slots are
    # zero-opacity no-ops; skipping them is the big win at low occupancy)
    n_chunks = pl.cdiv(counts_ref[i], g)

    def cond(state):
        ci, t_carry, _ = state
        return jnp.logical_and(
            ci < n_chunks, jnp.max(t_carry) >= statics.transmittance_eps
        )

    def body(state):
        ci, t_carry, acc = state
        chunk = payload_ref[0, pl.ds(ci * g, g), :]  # (G,16)
        alpha, *_ = _alpha_terms(
            chunk, px, py, statics.alpha_clip, statics.alpha_threshold
        )
        log1m = jnp.log1p(-alpha)
        s_excl = _prefix_excl(log1m, statics)
        w = alpha * jnp.exp(s_excl) * t_carry  # (G,P)
        c4 = chunk[:, binning.COL_R : binning.COL_ONE + 1]  # (G,4)
        contrib = jax.lax.dot_general(
            c4, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HIGHEST,
        )  # (4,P)
        total = jnp.sum(log1m, axis=0, keepdims=True)
        return ci + 1, t_carry * jnp.exp(total), acc + contrib

    init = (jnp.int32(0), jnp.ones((1, p), jnp.float32), jnp.zeros((4, p), jnp.float32))
    _, _, acc = jax.lax.while_loop(cond, body, init)
    out_ref[0] = acc


def forward(
    gathered: jnp.ndarray,
    tile_indices: jnp.ndarray,
    counts: jnp.ndarray,
    statics: CompositeStatics,
) -> jnp.ndarray:
    tt, cap, pd = gathered.shape
    p = statics.tile_h * statics.tile_w
    kernel = functools.partial(_fwd_kernel, statics=statics, cap=cap)
    flops_per_tile = cap * (statics.chunk * p * 2 + p * 30)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tt,),
        in_specs=[
            pl.BlockSpec((1, cap, pd), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, 4, p), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        # vma: propagate varying-manual-axes when called under shard_map
        out_shape=jax.ShapeDtypeStruct(
            (tt, 4, p), jnp.float32, vma=jax.typeof(gathered).vma
        ),
        cost_estimate=pl.CostEstimate(
            flops=tt * flops_per_tile,
            bytes_accessed=tt * (cap * pd * 4 + 4 * p * 4),
            transcendentals=tt * cap * p,
        ),
        interpret=jax.default_backend() == "cpu",
    )(tile_indices, counts, gathered)


# --------------------------------------------------------------------------
# backward
# --------------------------------------------------------------------------


def _bwd_kernel(
    tile_idx_ref, counts_ref, payload_ref, out4_ref, g4_ref, d_ref, *,
    statics: CompositeStatics, cap: int,
):
    g = statics.chunk
    p = statics.tile_h * statics.tile_w
    i = pl.program_id(0)
    n_chunks = pl.cdiv(counts_ref[i], g)
    px, py = _pixel_coords(tile_idx_ref[i], statics)

    d_ref[0] = jnp.zeros((cap, binning.PAYLOAD_DIM), jnp.float32)
    c4_tot = out4_ref[0]  # (4,P)
    g4 = g4_ref[0]  # (4,P)
    # suffix term via the scalar-carry identity (see composite._chunk_bwd):
    # term2[k] = tot_dot - r - prefix_incl(w * cg); carry r is (1,P).
    tot_dot = jnp.sum(c4_tot * g4, axis=0, keepdims=True)  # (1,P)

    def cond(state):
        ci, t_carry, _ = state
        return jnp.logical_and(
            ci < n_chunks, jnp.max(t_carry) >= statics.transmittance_eps
        )

    def body(state):
        ci, t_carry, r_carry = state
        chunk = payload_ref[0, pl.ds(ci * g, g), :]
        alpha, alpha_raw, expf, dx, dy, (cxx, cxy, cyy) = _alpha_terms(
            chunk, px, py, statics.alpha_clip, statics.alpha_threshold
        )
        log1m = jnp.log1p(-alpha)
        s_excl = _prefix_excl(log1m, statics)
        t_k = jnp.exp(s_excl) * t_carry
        w = alpha * t_k
        c4 = chunk[:, binning.COL_R : binning.COL_ONE + 1]  # (G,4)

        d_c4 = jax.lax.dot_general(
            w, g4, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HIGHEST,
        )  # (G,4)

        cg = jax.lax.dot_general(
            c4, g4, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HIGHEST,
        )  # (G,P)
        u = w * cg
        cum_u = _prefix_incl(u, statics)  # inclusive prefix over slots
        term2 = tot_dot - r_carry - cum_u
        r_out = r_carry + jnp.sum(u, axis=0, keepdims=True)
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
        )  # (G,16)
        d_ref[0, pl.ds(ci * g, g), :] = d_chunk

        total = jnp.sum(log1m, axis=0, keepdims=True)
        return ci + 1, t_carry * jnp.exp(total), r_out

    init = (jnp.int32(0), jnp.ones((1, p), jnp.float32), jnp.zeros((1, p), jnp.float32))
    jax.lax.while_loop(cond, body, init)


def backward(
    gathered: jnp.ndarray,
    tile_indices: jnp.ndarray,
    counts: jnp.ndarray,
    out4: jnp.ndarray,
    g4: jnp.ndarray,
    statics: CompositeStatics,
) -> jnp.ndarray:
    tt, cap, pd = gathered.shape
    p = statics.tile_h * statics.tile_w
    kernel = functools.partial(_bwd_kernel, statics=statics, cap=cap)
    flops_per_tile = cap * (statics.chunk * p * 12 + p * 80)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tt,),
        in_specs=[
            pl.BlockSpec((1, cap, pd), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, p), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, p), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, cap, pd), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    vma = jax.typeof(gathered).vma | jax.typeof(g4).vma
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tt, cap, pd), jnp.float32, vma=vma),
        cost_estimate=pl.CostEstimate(
            flops=tt * flops_per_tile,
            bytes_accessed=tt * (2 * cap * pd * 4 + 8 * p * 4),
            transcendentals=2 * tt * cap * p,
        ),
        interpret=jax.default_backend() == "cpu",
    )(tile_indices, counts, gathered, out4, g4)
