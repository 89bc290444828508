"""Per-tile alpha compositing, forward + hand-written backward
(SURVEY.md C3/C4) — the differentiable core behind `jax.custom_vjp`.

TPU-native redesign of the CUDA rasterize kernels:

- CUDA: one thread per pixel, sequential front-to-back blend with early
  stop; backward traverses back-to-front and accumulates per-Gaussian
  grads with global atomics.
- here: per tile, Gaussians are processed in depth-ordered CHUNKS of G.
  Within a chunk, transmittance is a prefix-sum in log space
  (T_k = T_in * exp(cumsum_excl log(1-alpha))), turning the whole blend
  into dense [G,P] elementwise work + reductions that XLA/Mosaic map onto
  the VPU/MXU.  The backward runs FRONT-to-back in the same chunk order
  using the suffix-sum identity
      dL/da_k = T_k (c4_k . g4) - [(C4_tot - prefix4_incl(k)) . g4]/(1-a_k)
  (c4 = [r,g,b,1] so the 4th channel carries the accumulated-alpha /
  final-transmittance term), producing per-tile per-slot gradients that
  are later segment-summed by the gather transpose — deterministic, no
  atomics (SURVEY.md hard part #1).

The math lives in `_chunk_fwd` / `_chunk_bwd`, shared verbatim between
the XLA path (vmap over tiles + lax.scan over chunks; runs anywhere) and
the Pallas TPU kernels (ops/rasterize_pallas.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from casualhdrsplat_tpu.ops import binning


class CompositeStatics(NamedTuple):
    """Hashable static config for the custom_vjp (nondiff arg)."""

    num_views: int
    ntx: int
    nty: int
    tile_h: int
    tile_w: int
    chunk: int
    alpha_clip: float
    alpha_threshold: float
    backend: str  # "xla" | "pallas"
    # Kernels may stop/skip once every pixel's transmittance is below this
    # (the oracle and the XLA path have no early stop — CLAUDE.md
    # invariant: approximation strictly below transmittance_eps).
    transmittance_eps: float = 1e-4
    # Output-row stride per view for the tile-origin computation
    # (tile = row % tiles_per_view); 0 = ntx*nty.  The Gaussian-sharded
    # path uses a PADDED stride (tiles rounded up to the gauss axis) so
    # each device's row slice stays static (parallel/render.py).
    tiles_per_view: int = 0
    # In-chunk transmittance prefix inside the Pallas kernels:
    # "matmul" (triangular MXU) | "cumsum" (VPU scan) — see
    # RasterizeConfig.prefix; the XLA path below always uses cumsum.
    prefix: str = "matmul"


def pixel_coords(origin_x, origin_y, tile_h: int, tile_w: int):
    """Flattened pixel-center coordinates of one tile: (1, P) each."""
    p = tile_h * tile_w
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    px = (idx % tile_w + origin_x).astype(jnp.float32) + 0.5
    py = (idx // tile_w + origin_y).astype(jnp.float32) + 0.5
    return px, py


def _alpha_terms(chunk, px, py, alpha_clip, alpha_threshold):
    """Shared forward evaluation of one chunk: [G,16] params x (1,P) pixels
    -> alpha (G,P) plus intermediates needed by the backward."""
    mx = chunk[:, binning.COL_MX : binning.COL_MX + 1]
    my = chunk[:, binning.COL_MY : binning.COL_MY + 1]
    cxx = chunk[:, binning.COL_CXX : binning.COL_CXX + 1]
    cxy = chunk[:, binning.COL_CXY : binning.COL_CXY + 1]
    cyy = chunk[:, binning.COL_CYY : binning.COL_CYY + 1]
    opa = chunk[:, binning.COL_OPA : binning.COL_OPA + 1]
    dx = px - mx
    dy = py - my
    power = -(0.5 * (cxx * dx * dx + cyy * dy * dy) + cxy * dx * dy)
    expf = jnp.exp(jnp.minimum(power, 0.0))  # power <= 0 for PSD conics
    alpha_raw = opa * expf
    alpha = jnp.minimum(alpha_raw, alpha_clip)
    alpha = jnp.where(alpha >= alpha_threshold, alpha, 0.0)
    return alpha, alpha_raw, expf, dx, dy, (cxx, cxy, cyy)


def _chunk_fwd(chunk, px, py, t_in, alpha_clip, alpha_threshold):
    """One chunk of G depth-ordered Gaussians composited over P pixels.

    Args: chunk [G,16]; px/py (1,P); t_in (1,P) incoming transmittance.
    Returns (contrib (4,P), t_out (1,P)).
    """
    alpha, *_ = _alpha_terms(chunk, px, py, alpha_clip, alpha_threshold)
    log1m = jnp.log1p(-alpha)
    s_incl = jnp.cumsum(log1m, axis=0)
    s_excl = s_incl - log1m
    w = alpha * jnp.exp(s_excl) * t_in  # (G,P)
    c4 = chunk[:, binning.COL_R : binning.COL_ONE + 1]  # (G,4)
    contrib = jax.lax.dot_general(
        c4,
        w,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (4,P)
    t_out = t_in * jnp.exp(s_incl[-1:, :])
    return contrib, t_out


def _chunk_bwd(chunk, px, py, t_in, r_in, tot_dot, g4, alpha_clip, alpha_threshold):
    """Backward for one chunk, FRONT-to-back.

    The suffix term needed for dL/dalpha_k is
        term2[k] = sum_c (c4_tot_c - prefix4_incl[k]_c) * g4_c .
    Because g4 does not depend on the slot k, the channel dot commutes
    with the prefix over k:
        term2[k] = tot_dot - r_in - cumsum_incl_k( w * (c4 . g4) ),
    so the carried per-channel prefix collapses to the SCALAR per-pixel
    carry r = sum_c prefix4_c * g4_c and the per-chunk prefix work is one
    (G,P) cumsum of u = w * cg instead of a 4x-wide (G,4,P) one — the 4x
    matmul reduction behind the round-2 backward-kernel speedup.

    Args:
      t_in (1,P): transmittance entering this chunk (recomputed carry).
      r_in (1,P): sum_c (c4-weighted prefix of previous chunks)_c * g4_c.
      tot_dot (1,P): sum_c c4_tot_c * g4_c (full forward output . grad).
      g4 (4,P): upstream gradient d L / d out4.
    Returns (d_chunk [G,16], t_out (1,P), r_out (1,P)).
    """
    alpha, alpha_raw, expf, dx, dy, (cxx, cxy, cyy) = _alpha_terms(
        chunk, px, py, alpha_clip, alpha_threshold
    )
    log1m = jnp.log1p(-alpha)
    s_incl = jnp.cumsum(log1m, axis=0)
    s_excl = s_incl - log1m
    t_k = jnp.exp(s_excl) * t_in  # (G,P)
    w = alpha * t_k
    c4 = chunk[:, binning.COL_R : binning.COL_ONE + 1]  # (G,4)

    # d color (and the discarded constant-1 channel): (G,P)@(P,4)
    d_c4 = jax.lax.dot_general(
        w,
        g4,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (G,4)

    cg = jax.lax.dot_general(
        c4,
        g4,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (G,P): c4_k . g4 per pixel
    u = w * cg  # (G,P)
    term1 = t_k * cg
    term2 = tot_dot - r_in - jnp.cumsum(u, axis=0)
    one_minus = 1.0 - alpha
    dl_da = jnp.where(alpha > 0.0, term1 - term2 / one_minus, 0.0)

    # chain through alpha = min(opa * expf, clip) (zero where clamped)
    live = (alpha > 0.0) & (alpha_raw < alpha_clip)
    g_a = jnp.where(live, dl_da, 0.0)
    d_opa = jnp.sum(g_a * expf, axis=1, keepdims=True)  # (G,1)
    g_pw = g_a * alpha  # d/d power
    d_mx = jnp.sum(g_pw * (cxx * dx + cxy * dy), axis=1, keepdims=True)
    d_my = jnp.sum(g_pw * (cyy * dy + cxy * dx), axis=1, keepdims=True)
    d_cxx = jnp.sum(g_pw * (-0.5 * dx * dx), axis=1, keepdims=True)
    d_cyy = jnp.sum(g_pw * (-0.5 * dy * dy), axis=1, keepdims=True)
    d_cxy = jnp.sum(g_pw * (-dx * dy), axis=1, keepdims=True)

    g_dim = chunk.shape[0]
    d_chunk = jnp.zeros((g_dim, binning.PAYLOAD_DIM), jnp.float32)
    d_chunk = d_chunk.at[:, binning.COL_MX].set(d_mx[:, 0])
    d_chunk = d_chunk.at[:, binning.COL_MY].set(d_my[:, 0])
    d_chunk = d_chunk.at[:, binning.COL_CXX].set(d_cxx[:, 0])
    d_chunk = d_chunk.at[:, binning.COL_CXY].set(d_cxy[:, 0])
    d_chunk = d_chunk.at[:, binning.COL_CYY].set(d_cyy[:, 0])
    d_chunk = d_chunk.at[:, binning.COL_OPA].set(d_opa[:, 0])
    d_chunk = d_chunk.at[:, binning.COL_R : binning.COL_B + 1].set(d_c4[:, :3])

    t_out = t_in * jnp.exp(s_incl[-1:, :])
    r_out = r_in + jnp.sum(u, axis=0, keepdims=True)
    return d_chunk, t_out, r_out


# --------------------------------------------------------------------------
# XLA path: vmap over tiles, scan over chunks.
# --------------------------------------------------------------------------


def _tile_origin(tile_index, statics: CompositeStatics):
    tiles_per_view = statics.tiles_per_view or statics.ntx * statics.nty
    t = tile_index % tiles_per_view
    ox = (t % statics.ntx) * statics.tile_w
    oy = (t // statics.ntx) * statics.tile_h
    return ox, oy


def _forward_xla(
    gathered: jnp.ndarray, tile_indices: jnp.ndarray, statics: CompositeStatics
) -> jnp.ndarray:
    tt, cap, _ = gathered.shape
    g = statics.chunk
    p = statics.tile_h * statics.tile_w

    def tile_fn(payload, tile_index):
        ox, oy = _tile_origin(tile_index, statics)
        px, py = pixel_coords(ox, oy, statics.tile_h, statics.tile_w)
        chunks = payload.reshape(cap // g, g, binning.PAYLOAD_DIM)

        def body(t_carry, chunk):
            contrib, t_out = _chunk_fwd(
                chunk, px, py, t_carry, statics.alpha_clip, statics.alpha_threshold
            )
            return t_out, contrib

        # carry derived from the payload so its type (incl. shard_map
        # varying-manual-axes) matches the body output
        t_init = jnp.ones((1, p)) + 0.0 * payload[0, 0]
        t_fin, contribs = jax.lax.scan(body, t_init, chunks)
        return contribs.sum(axis=0)  # (4,P)

    return jax.vmap(tile_fn)(gathered, tile_indices)


def _backward_xla(
    gathered: jnp.ndarray,
    tile_indices: jnp.ndarray,
    out4: jnp.ndarray,
    g4: jnp.ndarray,
    statics: CompositeStatics,
) -> jnp.ndarray:
    tt, cap, _ = gathered.shape
    g = statics.chunk
    p = statics.tile_h * statics.tile_w

    def tile_fn(payload, c4_tot, grad4, tile_index):
        ox, oy = _tile_origin(tile_index, statics)
        px, py = pixel_coords(ox, oy, statics.tile_h, statics.tile_w)
        chunks = payload.reshape(cap // g, g, binning.PAYLOAD_DIM)
        tot_dot = jnp.sum(c4_tot * grad4, axis=0, keepdims=True)  # (1,P)

        def body(carry, chunk):
            t_in, r_in = carry
            d_chunk, t_out, r_out = _chunk_bwd(
                chunk, px, py, t_in, r_in, tot_dot, grad4,
                statics.alpha_clip, statics.alpha_threshold,
            )
            return (t_out, r_out), d_chunk

        t_init = jnp.ones((1, p)) + 0.0 * payload[0, 0]
        r_init = jnp.zeros((1, p)) + 0.0 * payload[0, 0]
        (_, _), d_chunks = jax.lax.scan(body, (t_init, r_init), chunks)
        return d_chunks.reshape(cap, binning.PAYLOAD_DIM)

    return jax.vmap(tile_fn)(gathered, out4, g4, tile_indices)


# --------------------------------------------------------------------------
# custom_vjp dispatch
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _make_composite(statics: CompositeStatics):
    @jax.custom_vjp
    def composite(gathered, tile_indices, counts):
        return _dispatch_fwd(gathered, tile_indices, counts, statics)

    def fwd(gathered, tile_indices, counts):
        out4 = _dispatch_fwd(gathered, tile_indices, counts, statics)
        return out4, (gathered, tile_indices, counts, out4)

    def bwd(res, g4):
        gathered, tile_indices, counts, out4 = res
        return (
            _dispatch_bwd(gathered, tile_indices, counts, out4, g4, statics),
            None,
            None,
        )

    composite.defvjp(fwd, bwd)
    return composite


def _dispatch_fwd(gathered, tile_indices, counts, statics):
    if statics.backend == "pallas":
        from casualhdrsplat_tpu.ops import rasterize_pallas

        return rasterize_pallas.forward(gathered, tile_indices, counts, statics)
    return _forward_xla(gathered, tile_indices, statics)


def _dispatch_bwd(gathered, tile_indices, counts, out4, g4, statics):
    if statics.backend == "pallas":
        from casualhdrsplat_tpu.ops import rasterize_pallas

        return rasterize_pallas.backward(
            gathered, tile_indices, counts, out4, g4, statics
        )
    return _backward_xla(gathered, tile_indices, out4, g4, statics)


def composite_tiles(
    gathered: jnp.ndarray,
    statics: CompositeStatics,
    tile_indices: jnp.ndarray | None = None,
    counts: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Composite depth-ordered per-tile Gaussian lists.

    Args:
      gathered: [num_tiles_total, capacity, 16] payload table
        (binning.gather_payload output, row-major tiles per view).
      statics: CompositeStatics (hashable; selects backend).
      tile_indices: [num_tiles_total] int32 GLOBAL tile index of each
        entry (origin = index % (ntx*nty) in row-major tile grid); default
        arange — callers compositing a device-local slice of tiles (the
        Gaussian-sharded path) pass their offset indices here.

    Returns: [num_tiles_total, 4, tile_h * tile_w]: RGB radiance
    + accumulated alpha per pixel.  Differentiable w.r.t. `gathered` via the
    hand-written backward.
    """
    if gathered.shape[1] % statics.chunk:
        raise ValueError(
            f"capacity {gathered.shape[1]} must be a multiple of chunk {statics.chunk}"
        )
    if tile_indices is None:
        tile_indices = jnp.arange(gathered.shape[0], dtype=jnp.int32)
    if counts is None:
        counts = jnp.full((gathered.shape[0],), gathered.shape[1], jnp.int32)
    return _make_composite(statics)(gathered, tile_indices, counts)
