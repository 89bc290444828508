"""Tile binning + depth sort with static shapes (SURVEY.md C2).

Reference lineage: gsplat `map_gaussian_to_intersects` + CUB radix sort +
`get_tile_bin_edges` (CUDA, dynamic-length intersection lists).  The TPU
redesign keeps every shape static (XLA requirement, SURVEY.md hard part
#2):

1. every Gaussian emits up to `max_tiles_per_gaussian` (tile_id, depth)
   keys over its clipped screen bbox (invalid -> sentinel tile T);
2. one `jax.lax.sort` over (tile_id, depth) — XLA's sort plays the role
   of CUB's radix sort;
3. per-tile segment starts via `searchsorted`; each entry's slot within
   its tile = rank - segment start;
4. scatter Gaussian ids into a dense `[num_tiles, capacity]` table
   (`mode="drop"` discards overflow — farthest-depth entries drop first
   because slots are depth-ordered).

The dense table then drives an XLA gather of the per-Gaussian payload to
`[num_tiles, capacity, 16]`, whose autodiff transpose is a deterministic
scatter-add — the TPU answer to CUDA's atomic gradient accumulation
(SURVEY.md §3.3).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from casualhdrsplat_tpu.ops.projection import Projected

# Payload column layout (lane-padded to 16 for VMEM friendliness).
# [mx, my, cxx, cxy, cyy, opacity, r, g, b, one, 0, 0, 0, 0, 0, 0]
PAYLOAD_DIM = 16
COL_MX, COL_MY = 0, 1
COL_CXX, COL_CXY, COL_CYY = 2, 3, 4
COL_OPA = 5
COL_R, COL_G, COL_B, COL_ONE = 6, 7, 8, 9


class TileLists(NamedTuple):
    indices: jnp.ndarray  # [num_tiles, capacity] int32 gaussian id (N = pad)
    counts: jnp.ndarray  # [num_tiles] int32 (clipped at capacity)
    num_dropped: jnp.ndarray  # [] int32 — tile-capacity overflow
    num_clipped: jnp.ndarray  # [] int32 — bbox cells cut by the mtpg clamp


def _ceil_log2(x: int) -> int:
    return max(1, (x - 1).bit_length())


def tile_grid(width: int, height: int, tile_h: int, tile_w: int):
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    return ntx, nty


def assign_tiles(
    proj: Projected,
    width: int,
    height: int,
    tile_h: int,
    tile_w: int,
    capacity: int,
    max_tiles_per_gaussian: int,
) -> TileLists:
    return assign_tiles_arrays(
        proj.means2d, proj.radii, proj.depths, proj.valid,
        width, height, tile_h, tile_w, capacity, max_tiles_per_gaussian,
    )


def sorted_stream(
    means2d: jnp.ndarray,
    radii: jnp.ndarray,
    depths: jnp.ndarray,
    valid: jnp.ndarray,
    width: int,
    height: int,
    tile_h: int,
    tile_w: int,
    max_tiles_per_gaussian: int,
):
    """(tile, depth)-ordered intersection stream.

    Returns (s_gauss [N*mtpg] int32 Gaussian ids grouped by tile in depth
    order — invalid/sentinel pairs at the tail, starts [T+1], seg_len [T],
    clipped — scalar count of bbox cells dropped by the mtpg clamp).
    """
    n = means2d.shape[0]
    ntx, nty = tile_grid(width, height, tile_h, tile_w)
    num_tiles = ntx * nty
    mtpg = max_tiles_per_gaussian

    # Depth-presort the Gaussians (cheap: N keys, not N*mtpg), so a single
    # STABLE sort by tile id alone finishes the (tile, depth) ordering —
    # one packed int32 key + one payload operand instead of the 3-operand
    # two-key sort (measured ~2x on the TPU sort, which dominates binning).
    # inverse depth rank per gaussian via double argsort — building keys
    # in ORIGINAL order avoids four row gathers of the per-gaussian arrays
    # (row-granular gathers cost ~10 ns/row on this TPU)
    order = jnp.argsort(depths).astype(jnp.int32)
    inv_rank = jnp.argsort(order).astype(jnp.int32)  # [N] depth rank of i
    mx = means2d[:, 0]
    my = means2d[:, 1]
    r = radii
    valid_o = valid

    tx0 = jnp.clip(jnp.floor((mx - r) / tile_w).astype(jnp.int32), 0, ntx - 1)
    tx1 = jnp.clip(jnp.floor((mx + r) / tile_w).astype(jnp.int32), 0, ntx - 1)
    ty0 = jnp.clip(jnp.floor((my - r) / tile_h).astype(jnp.int32), 0, nty - 1)
    ty1 = jnp.clip(jnp.floor((my + r) / tile_h).astype(jnp.int32), 0, nty - 1)
    w_span = tx1 - tx0 + 1  # [N]
    h_span = ty1 - ty0 + 1

    # A bbox larger than the mtpg slot budget is CENTER-clamped to the
    # biggest aspect-preserving w_c x h_c <= mtpg cell block, and the
    # clipped fringe cells are COUNTED: row-major slot assignment alone
    # kept only the bbox's TOP rows (banded artifacts once shared
    # binning's motion-inflated radii push footprints past mtpg) and the
    # loss was invisible in every dropped-count diagnostic.
    area = w_span * h_span
    over = area > mtpg
    sc = jnp.sqrt(jnp.float32(mtpg) / jnp.maximum(area, 1).astype(jnp.float32))
    h_c = jnp.clip(jnp.floor(h_span * sc).astype(jnp.int32), 1, h_span)
    w_c = jnp.clip(mtpg // h_c, 1, w_span)
    h_c = jnp.clip(mtpg // w_c, 1, h_span)  # re-tighten: w_c*h_c <= mtpg
    w_span_f = jnp.where(over, w_c, w_span)
    h_span_f = jnp.where(over, h_c, h_span)
    tx0 = jnp.where(over, tx0 + (w_span - w_span_f) // 2, tx0)
    ty0 = jnp.where(over, ty0 + (h_span - h_span_f) // 2, ty0)
    clipped = jnp.sum(
        jnp.where(valid_o, area - w_span_f * h_span_f, 0)
    ).astype(jnp.int32)
    w_span, h_span = w_span_f, h_span_f

    # Expand: slot s covers bbox cell (s // w_span, s % w_span), row-major.
    slots = jnp.arange(mtpg, dtype=jnp.int32)  # [mtpg]
    row = slots[None, :] // w_span[:, None]  # [N, mtpg]
    col = slots[None, :] % w_span[:, None]
    in_bbox = (row < h_span[:, None]) & valid_o[:, None]
    tile_ids = jnp.where(
        in_bbox, (ty0[:, None] + row) * ntx + tx0[:, None] + col, num_tiles
    ).astype(jnp.int32)

    # A Gaussian's bbox cells are distinct tiles, so within one tile the
    # depth rank alone is a unique tiebreaker -> key fits 31 bits for
    # scenes up to ~2^(31 - tile_bits) Gaussians.
    rank_bits = _ceil_log2(n)
    if rank_bits + _ceil_log2(num_tiles + 1) <= 31:
        # packed single-key path: key = tile << rank_bits | depth rank
        key = (tile_ids << rank_bits) | inv_rank[:, None]
        gauss_ids = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[:, None], (n, mtpg)
        )
        s_key, s_gauss = jax.lax.sort(
            (key.reshape(-1), gauss_ids.reshape(-1)), num_keys=1
        )
        s_tiles = s_key >> rank_bits
    else:  # huge scene fallback: two-key lexicographic sort
        depth_rank = jnp.broadcast_to(inv_rank[:, None], (n, mtpg))
        gauss_ids = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[:, None], (n, mtpg)
        )
        s_tiles, _, s_gauss = jax.lax.sort(
            (tile_ids.reshape(-1), depth_rank.reshape(-1), gauss_ids.reshape(-1)),
            num_keys=2,
        )

    starts = jnp.searchsorted(
        s_tiles, jnp.arange(num_tiles + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    seg_len = starts[1:] - starts[:-1]
    return s_gauss, starts, seg_len, clipped


def tile_demand(
    means2d: jnp.ndarray,
    radii: jnp.ndarray,
    valid: jnp.ndarray,
    width: int,
    height: int,
    tile_h: int,
    tile_w: int,
    max_tiles_per_gaussian: int,
) -> jnp.ndarray:
    """Total intersection-stream rows this set of footprints demands —
    sum over Gaussians of bbox tiles after the mtpg clamp.  The cheap
    (sort-free) half of sorted_stream's accounting: used by the
    shared-binning self-guard to compare Chebyshev-inflated demand
    against the stream budget BEFORE committing to a compiled regime."""
    ntx, nty = tile_grid(width, height, tile_h, tile_w)
    mx, my, r = means2d[:, 0], means2d[:, 1], radii
    tx0 = jnp.clip(jnp.floor((mx - r) / tile_w).astype(jnp.int32), 0, ntx - 1)
    tx1 = jnp.clip(jnp.floor((mx + r) / tile_w).astype(jnp.int32), 0, ntx - 1)
    ty0 = jnp.clip(jnp.floor((my - r) / tile_h).astype(jnp.int32), 0, nty - 1)
    ty1 = jnp.clip(jnp.floor((my + r) / tile_h).astype(jnp.int32), 0, nty - 1)
    area = (tx1 - tx0 + 1) * (ty1 - ty0 + 1)
    area = jnp.minimum(area, max_tiles_per_gaussian)
    return jnp.sum(jnp.where(valid, area, 0))


def assign_tiles_arrays(
    means2d: jnp.ndarray,
    radii: jnp.ndarray,
    depths: jnp.ndarray,
    valid: jnp.ndarray,
    width: int,
    height: int,
    tile_h: int,
    tile_w: int,
    capacity: int,
    max_tiles_per_gaussian: int,
) -> TileLists:
    n = means2d.shape[0]
    s_gauss, starts, seg_len, clipped = sorted_stream(
        means2d, radii, depths, valid, width, height, tile_h, tile_w,
        max_tiles_per_gaussian,
    )
    counts = jnp.minimum(seg_len, capacity).astype(jnp.int32)
    num_dropped = jnp.sum(jnp.maximum(seg_len - capacity, 0))

    # Dense [T, capacity] table by GATHER from the sorted id stream (an
    # XLA scatter here costs hundreds of ms on TPU; the gather is ~free).
    k = jnp.arange(capacity, dtype=jnp.int32)
    idx = starts[:-1, None] + k[None, :]  # [T, capacity]
    in_seg = k[None, :] < seg_len[:, None]
    total = s_gauss.shape[0]
    gid = s_gauss[jnp.minimum(idx, total - 1)]
    table = jnp.where(in_seg, gid, n)
    return TileLists(indices=table, counts=counts, num_dropped=num_dropped,
                     num_clipped=clipped)


class StreamChunks(NamedTuple):
    """Halo-masked streaming schedule over the depth-sorted intersection
    stream (ops/rasterize_packed.py V2.1).

    The stream itself is never re-laid-out: kernels DMA BLOCK-ALIGNED
    windows of `stream_payload = payload[s_gauss]` directly.  A tile whose
    segment starts/ends mid-block shares boundary blocks with neighbor
    tiles; per-chunk (seg_lo, seg_hi) bounds let the kernel mask foreign
    slots.  Metadata is all [C]-sized — no per-slot gathers.
    """

    block_id: jnp.ndarray  # [C] int32 stream block to DMA (index*chunk)
    out_row: jnp.ndarray  # [C] int32 output row (tile) of the chunk
    first: jnp.ndarray  # [C] int32 1 = first chunk of its tile
    seg_lo: jnp.ndarray  # [C] int32 stream position where the tile starts
    seg_hi: jnp.ndarray  # [C] int32 stream position where the tile ends
    block_new: jnp.ndarray  # [C] int32 1 = first chunk touching its block
    num_chunks: jnp.ndarray  # [] int32 real chunks (diagnostics)


def stream_budget(n: int, mtpg: int, num_tiles: int, chunk: int) -> int:
    """Static chunk-count bound: per tile, blocks spanned <= len/chunk + 1
    (empty tiles contribute exactly 1), so the sum is bounded by
    stream/chunk + num_tiles."""
    return n * mtpg // chunk + num_tiles + 1


def pack_stream_chunks(
    starts: jnp.ndarray,  # [T+1]
    seg_len: jnp.ndarray,  # [T]
    m: int,
    chunk: int,
    budget: int,
    out_row_offset,
    sentinel_row: int,
) -> StreamChunks:
    """`sentinel_row` MUST be a dedicated junk output row (>= the number of
    real tiles): unused budget chunks alias it with first=1, which zeroes
    whatever row they point at (ADVICE r1, low)."""
    num_tiles = seg_len.shape[0]
    g = chunk
    ends = starts[:-1] + seg_len
    first_block = starts[:-1] // g
    last_block = jnp.where(seg_len > 0, (ends - 1) // g, first_block)
    tile_chunks = last_block - first_block + 1  # >= 1 (empty tiles get 1)
    cum = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(tile_chunks).astype(jnp.int32)]
    )
    total = cum[-1]

    c_ids = jnp.arange(budget, dtype=jnp.int32)
    tile_of = jnp.searchsorted(cum, c_ids, side="right").astype(jnp.int32) - 1
    used = c_ids < total
    t = jnp.clip(tile_of, 0, num_tiles - 1)
    first = jnp.where(used, c_ids == cum[t], True)
    block = first_block[t] + (c_ids - cum[t])
    max_block = m // g - 1
    block_id = jnp.where(used, jnp.clip(block, 0, max_block), max_block).astype(
        jnp.int32
    )
    block_new = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (jnp.diff(block_id) != 0).astype(jnp.int32)]
    )
    return StreamChunks(
        block_id=block_id,
        out_row=jnp.where(used, t + out_row_offset, sentinel_row).astype(jnp.int32),
        first=first.astype(jnp.int32),
        seg_lo=jnp.where(used, starts[t], 0).astype(jnp.int32),
        seg_hi=jnp.where(used, ends[t], 0).astype(jnp.int32),
        block_new=block_new,
        num_chunks=total,
    )


def waterfill_segments(seg_len: jnp.ndarray, budget: int):
    """Cap per-tile segment lengths at the largest uniform level `cap`
    such that sum(min(seg_len, cap)) <= budget.

    This is the graceful stream-overflow policy: each overloaded tile
    keeps its NEAREST `cap` intersections (slots are depth-ordered) — the
    same keep-nearest semantics as the dense table's per-tile capacity —
    instead of the previous clip-at-end policy, which truncated the
    stream in tile-major order and erased ENTIRE trailing tiles (the
    bottom of the image) whenever the budget overflowed.

    Returns (seg_c [T] capped lengths, starts_c [T+1] compacted starts).
    O(T log T): one sort + closed-form waterfill level.
    """
    t = seg_len.shape[0]
    s = jnp.sort(seg_len)
    csum0 = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(s)[:-1].astype(jnp.int32)]
    )  # total of the (i) smallest segments, before index i
    rem = (t - jnp.arange(t)).astype(jnp.int32)
    c_i = (budget - csum0) // rem  # best cap if tiles >= i are truncated
    trunc = c_i < s  # tile i cannot be kept whole
    cap = jnp.where(jnp.any(trunc), c_i[jnp.argmax(trunc)], jnp.int32(budget))
    seg_c = jnp.minimum(seg_len, cap).astype(jnp.int32)
    starts_c = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(seg_c).astype(jnp.int32)]
    )
    return seg_c, starts_c


def compact_stream_ids(
    s_gauss: jnp.ndarray,  # [N*mtpg] sorted intersection stream (gaussian ids)
    starts: jnp.ndarray,  # [T+1] uncapped segment starts in s_gauss
    starts_c: jnp.ndarray,  # [T+1] compacted starts (waterfill_segments)
    budget: int,
    pad_id: int,
    unconditional: bool = False,
) -> jnp.ndarray:
    """Gaussian ids of the budget-compacted stream: slot j holds entry
    starts[t] + (j - starts_c[t]) of the sorted stream, t = tile owning
    slot j.

    The per-slot source offset is PIECEWISE CONSTANT over compacted
    segments, so it is built with one T-sized boundary scatter + a cumsum
    (no per-slot searchsorted).  The whole compaction runs under a
    `lax.cond` on the overflow flag: when nothing overflowed the stream is
    the identity prefix of `s_gauss` (a free slice) — overflow is the
    exception, and the big re-gather prices only the exceptional step.
    VMAPPED callers must pass `unconditional=True`: under vmap the cond
    degrades to executing BOTH branches plus a select, and `compacted` is
    already exact in the no-overflow case (zero shifts -> identity), so
    running it alone is strictly cheaper there."""
    t = starts_c.shape[0] - 1
    j = jnp.arange(budget, dtype=jnp.int32)
    total = s_gauss.shape[0]

    def compacted():
        shift_t = (starts[:t] - starts_c[:t]).astype(jnp.int32)  # [T]
        deltas = jnp.diff(
            jnp.concatenate([jnp.zeros((1,), jnp.int32), shift_t])
        )
        shift = jnp.zeros((budget,), jnp.int32).at[starts_c[:t]].add(
            deltas, mode="drop"
        )
        src = j + jnp.cumsum(shift)
        return jnp.where(
            j < starts_c[t], s_gauss[jnp.minimum(src, total - 1)], pad_id
        ).astype(jnp.int32)

    def prefix():
        # budget may exceed the raw stream length (it is chunk-rounded
        # UP from min(N*mtpg, stream_factor*N)); pad rather than slice so
        # the no-overflow branch still traces (mtpg < stream_factor with
        # N*mtpg not a chunk multiple hits this in the shared path).
        if budget <= total:
            pre = s_gauss[:budget]
        else:
            pre = jnp.concatenate(
                [s_gauss, jnp.full((budget - total,), pad_id, s_gauss.dtype)]
            )
        return jnp.where(j < starts_c[t], pre, pad_id).astype(jnp.int32)

    if unconditional:
        return compacted()
    return jax.lax.cond(starts_c[t] < starts[t], compacted, prefix)


def build_payload(
    proj: Projected, colors: jnp.ndarray, opacities: jnp.ndarray
) -> jnp.ndarray:
    """Pack the per-Gaussian screen packet into [N + 1, 16] (row N = zero
    padding row targeted by unused table slots)."""
    opa = jnp.where(proj.valid, opacities * proj.compensation, 0.0)
    rows = build_payload_rows(proj.means2d, proj.conics, opa, colors)
    return jnp.concatenate(
        [rows, jnp.zeros((1, PAYLOAD_DIM), jnp.float32)], axis=0
    )


def build_payload_rows(
    means2d: jnp.ndarray,
    conics: jnp.ndarray,
    opacity_eff: jnp.ndarray,
    colors: jnp.ndarray,
) -> jnp.ndarray:
    """[N, 16] packet rows WITHOUT the padding row — the all-gather payload
    of the Gaussian-sharded path (SURVEY.md P2), which appends its own pad
    row after gathering shards."""
    n = means2d.shape[0]
    payload = jnp.zeros((n, PAYLOAD_DIM), dtype=jnp.float32)
    payload = payload.at[:, COL_MX].set(means2d[:, 0])
    payload = payload.at[:, COL_MY].set(means2d[:, 1])
    payload = payload.at[:, COL_CXX].set(conics[:, 0])
    payload = payload.at[:, COL_CXY].set(conics[:, 1])
    payload = payload.at[:, COL_CYY].set(conics[:, 2])
    payload = payload.at[:, COL_OPA].set(opacity_eff)
    payload = payload.at[:, COL_R : COL_B + 1].set(colors)
    payload = payload.at[:, COL_ONE].set(1.0)
    return payload


def gather_payload(payload: jnp.ndarray, tiles: TileLists) -> jnp.ndarray:
    """[num_tiles, capacity, 16]; autodiff transpose = deterministic
    scatter-add of the per-tile gradients back to the [N+1, 16] store."""
    return payload[tiles.indices]


def tile_origins(width: int, height: int, tile_h: int, tile_w: int) -> jnp.ndarray:
    """[num_tiles, 2] (x0, y0) pixel origin of every tile, row-major."""
    ntx, nty = tile_grid(width, height, tile_h, tile_w)
    ty, tx = jnp.mgrid[0:nty, 0:ntx]
    return jnp.stack([tx.reshape(-1) * tile_w, ty.reshape(-1) * tile_h], axis=-1).astype(
        jnp.int32
    )
