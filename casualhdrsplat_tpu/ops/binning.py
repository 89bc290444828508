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
    num_dropped: jnp.ndarray  # [] int32 — overflow diagnostics


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
    ntx, nty = tile_grid(width, height, tile_h, tile_w)
    num_tiles = ntx * nty
    mtpg = max_tiles_per_gaussian

    mx, my = means2d[:, 0], means2d[:, 1]
    r = radii
    tx0 = jnp.clip(jnp.floor((mx - r) / tile_w).astype(jnp.int32), 0, ntx - 1)
    tx1 = jnp.clip(jnp.floor((mx + r) / tile_w).astype(jnp.int32), 0, ntx - 1)
    ty0 = jnp.clip(jnp.floor((my - r) / tile_h).astype(jnp.int32), 0, nty - 1)
    ty1 = jnp.clip(jnp.floor((my + r) / tile_h).astype(jnp.int32), 0, nty - 1)
    w_span = tx1 - tx0 + 1  # [N]
    h_span = ty1 - ty0 + 1

    # Expand: slot s covers bbox cell (s // w_span, s % w_span), row-major.
    slots = jnp.arange(mtpg, dtype=jnp.int32)  # [mtpg]
    row = slots[None, :] // w_span[:, None]  # [N, mtpg]
    col = slots[None, :] % w_span[:, None]
    in_bbox = (row < h_span[:, None]) & valid[:, None]
    tile_ids = jnp.where(
        in_bbox, (ty0[:, None] + row) * ntx + tx0[:, None] + col, num_tiles
    ).astype(jnp.int32)

    gauss_ids = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, mtpg)
    )
    depths = jnp.broadcast_to(depths[:, None], (n, mtpg)).astype(jnp.float32)

    flat_tiles = tile_ids.reshape(-1)
    flat_depths = depths.reshape(-1)
    flat_gauss = gauss_ids.reshape(-1)

    # Lexicographic sort by (tile, depth) — XLA's stable sort.
    s_tiles, s_depths, s_gauss = jax.lax.sort(
        (flat_tiles, flat_depths, flat_gauss), num_keys=2
    )

    starts = jnp.searchsorted(s_tiles, jnp.arange(num_tiles + 1, dtype=jnp.int32))
    seg_len = starts[1:] - starts[:-1]
    counts = jnp.minimum(seg_len, capacity).astype(jnp.int32)
    num_dropped = jnp.sum(jnp.maximum(seg_len - capacity, 0))

    rank = jnp.arange(flat_tiles.shape[0], dtype=jnp.int32)
    slot_in_tile = rank - starts[jnp.minimum(s_tiles, num_tiles)]
    dest = jnp.where(
        (s_tiles < num_tiles) & (slot_in_tile < capacity),
        s_tiles * capacity + slot_in_tile,
        num_tiles * capacity,  # out of bounds -> dropped
    )
    table = jnp.full((num_tiles * capacity,), n, dtype=jnp.int32)
    table = table.at[dest].set(s_gauss, mode="drop")
    return TileLists(
        indices=table.reshape(num_tiles, capacity),
        counts=counts,
        num_dropped=num_dropped,
    )


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
