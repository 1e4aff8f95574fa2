"""Static-shape tile binning: sort-based duplicate + compact (no scatters).

TPU-native equivalent of the CUDA pipeline's dynamic
``duplicateWithKeys -> CUB radix sort -> identifyTileRanges``
(cuda_rasterizer/rasterizer_impl.cu:70-138, 281-312):

1. every Gaussian emits up to ``max_tiles_per_gaussian`` (tile, depth-rank)
   key pairs — one per tile its screen rect covers, enumerated
   arithmetically (row-major within the rect), with invalid/overflow slots
   keyed past the last tile;
2. ONE ``jax.lax.sort`` over the flattened pairs (two keys: tile id, then
   depth rank — replacing the radix sort over ``tile<<32|depth-bits``);
3. per-tile ranges via ``searchsorted`` and fixed-K per-tile lists via a
   strided gather (replacing ``identifyTileRanges``).

Scatter-free by construction: XLA scatters are pathologically slow on TPU
(both to compile and to run), while sorts, searchsorted and gathers are
well-supported.  Overflow beyond K per tile or beyond the per-gaussian
emission cap is counted and reported, never silently hidden.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class TileLists(NamedTuple):
    idx: jax.Array       # [T, K] int32 Gaussian indices in depth order, -1 pad
    count: jax.Array     # [T] int32 number of overlapping Gaussians (may exceed K)
    n_dropped: jax.Array  # [] int32 overflowed (gaussian, tile) pairs (K cap + emission cap)


def bin_gaussians(
    rect_min: jax.Array,
    rect_max: jax.Array,
    valid: jax.Array,
    depth: jax.Array,
    grid: Tuple[int, int],
    max_per_tile: int,
    chunk: int = 16384,                 # kept for API compatibility (unused)
    max_tiles_per_gaussian: int = 32,
) -> TileLists:
    """Build per-tile depth-ordered index lists.

    Args:
        rect_min/rect_max: [N, 2] int32 (tx, ty) tile rects from preprocess.
        valid: [N] bool.
        depth: [N] f32 view depths.
        grid: (grid_y, grid_x) tile grid.
        max_per_tile: K, static per-tile capacity.
        max_tiles_per_gaussian: static per-gaussian tile-emission capacity
            (the reference's ``tiles_touched`` is unbounded; rects larger
            than this emit only their first cells, counted in n_dropped).
    """
    grid_y, grid_x = grid
    n = depth.shape[0]
    num_tiles = grid_y * grid_x
    k = max_per_tile
    r_cap = max_tiles_per_gaussian

    # Enumerate gaussians in DEPTH order, so pairs emitted row-major are
    # already rank-ordered; one STABLE single-key sort by tile then yields
    # exactly the (tile, depth-rank) order of the CUDA radix sort
    # (rasterizer_impl.cu:70-111, 304-312) with 2 sort operands instead of 3.
    order = jnp.argsort(jnp.where(valid, depth, jnp.inf), stable=True).astype(jnp.int32)

    w_rect = (rect_max[:, 0] - rect_min[:, 0]).astype(jnp.int32)
    touched_all = jnp.where(
        valid, w_rect * (rect_max[:, 1] - rect_min[:, 1]).astype(jnp.int32), 0
    )
    n_dropped_emit = jnp.sum(jnp.maximum(touched_all - r_cap, 0))

    # one [N]-row gather reorders the packed rect data by depth
    packed = jnp.stack(
        [rect_min[:, 0], rect_min[:, 1], jnp.maximum(w_rect, 1), touched_all], -1
    )[order]
    r = jnp.arange(r_cap, dtype=jnp.int32)                    # [R]
    safe_w = packed[:, 2:3]
    cell_x = packed[:, 0:1] + (r[None, :] % safe_w)
    cell_y = packed[:, 1:2] + (r[None, :] // safe_w)
    pair_tile = cell_y * grid_x + cell_x                      # [N, R] (depth order)
    pair_ok = r[None, :] < packed[:, 3:4]
    pair_tile = jnp.where(pair_ok, pair_tile, num_tiles).astype(jnp.int32)

    flat_tile = pair_tile.reshape(-1)
    flat_gauss = jnp.broadcast_to(order[:, None], (n, r_cap)).reshape(-1)

    s_tile, s_gauss = jax.lax.sort(
        (flat_tile, flat_gauss), num_keys=1, is_stable=True
    )

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(s_tile, tile_ids).astype(jnp.int32)
    ends = jnp.searchsorted(s_tile, tile_ids, side="right").astype(jnp.int32)
    counts = ends - starts

    kk = jnp.arange(k, dtype=jnp.int32)
    take = starts[:, None] + kk[None, :]                      # [T, K]
    ok = kk[None, :] < counts[:, None]
    m = s_gauss.shape[0]
    s_gauss_pad = jnp.concatenate([s_gauss, jnp.full((1,), -1, jnp.int32)])
    lists = jnp.where(ok, s_gauss_pad[jnp.minimum(take, m)], -1)

    n_dropped = jnp.sum(jnp.maximum(counts - k, 0)) + n_dropped_emit
    return TileLists(idx=lists, count=counts, n_dropped=n_dropped)
