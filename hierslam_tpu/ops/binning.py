"""Static-shape tile binning: depth sort + per-tile top-K index lists.

TPU-native replacement for the CUDA pipeline's dynamic
``duplicateWithKeys -> CUB radix sort -> identifyTileRanges``
(cuda_rasterizer/rasterizer_impl.cu:70-138, 281-312).  The CUDA code sorts
one duplicated key per (Gaussian, tile) overlap; the per-tile segment of that
sort is simply the tile's overlapping Gaussians in depth order.  We obtain
the same ordering with static shapes:

1. sort Gaussians once globally by view depth (``jax.lax.sort`` — stable, so
   per-tile order matches the radix sort's (tile, depth) key order);
2. for each tile, compact the indices of the Gaussians whose screen rect
   covers it into a fixed-capacity list of K slots (order-preserving), using
   a chunked mask+cumsum+scatter so peak memory is bounded regardless of N.

Overflow beyond K is counted and reported, never silently hidden.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class TileLists(NamedTuple):
    idx: jax.Array       # [T, K] int32 Gaussian indices in depth order, -1 pad
    count: jax.Array     # [T] int32 number of overlapping Gaussians (may exceed K)
    n_dropped: jax.Array  # [] int32 total overflowed (gaussian, tile) pairs


def bin_gaussians(
    rect_min: jax.Array,
    rect_max: jax.Array,
    valid: jax.Array,
    depth: jax.Array,
    grid: Tuple[int, int],
    max_per_tile: int,
    chunk: int = 16384,
) -> TileLists:
    """Build per-tile depth-ordered index lists.

    Args:
        rect_min/rect_max: [N, 2] int32 (tx, ty) tile rects from preprocess.
        valid: [N] bool.
        depth: [N] f32 view depths.
        grid: (grid_y, grid_x) tile grid.
        max_per_tile: K, static capacity per tile.
        chunk: gaussians processed per scan step (bounds peak memory at
            T*chunk int32).
    """
    grid_y, grid_x = grid
    n = depth.shape[0]
    num_tiles = grid_y * grid_x
    k = max_per_tile

    # Depth-sort once; invalid gaussians sink to the end.
    order = jnp.argsort(jnp.where(valid, depth, jnp.inf), stable=True).astype(jnp.int32)
    s_min = rect_min[order]
    s_max = rect_max[order]
    s_valid = valid[order]

    chunk = min(chunk, max(n, 1))
    n_pad = ((n + chunk - 1) // chunk) * chunk
    pad = n_pad - n
    if pad:
        order = jnp.pad(order, (0, pad), constant_values=0)
        s_min = jnp.pad(s_min, ((0, pad), (0, 0)))
        s_max = jnp.pad(s_max, ((0, pad), (0, 0)))
        s_valid = jnp.pad(s_valid, (0, pad), constant_values=False)
    n_chunks = n_pad // chunk

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_tx = (tile_ids % grid_x)[:, None]   # [T, 1]
    tile_ty = (tile_ids // grid_x)[:, None]  # [T, 1]

    def step(carry, c):
        lists, counts = carry
        lo = c * chunk
        cmin = jax.lax.dynamic_slice_in_dim(s_min, lo, chunk, 0)
        cmax = jax.lax.dynamic_slice_in_dim(s_max, lo, chunk, 0)
        cval = jax.lax.dynamic_slice_in_dim(s_valid, lo, chunk, 0)
        cidx = jax.lax.dynamic_slice_in_dim(order, lo, chunk, 0)

        # [T, chunk] tile-overlap mask.
        hit = (
            cval[None, :]
            & (tile_tx >= cmin[None, :, 0])
            & (tile_tx < cmax[None, :, 0])
            & (tile_ty >= cmin[None, :, 1])
            & (tile_ty < cmax[None, :, 1])
        )
        local = jnp.cumsum(hit.astype(jnp.int32), axis=1)
        slot = counts[:, None] + local - 1
        ok = hit & (slot < k)
        flat = jnp.where(ok, tile_ids[:, None] * k + slot, num_tiles * k)
        vals = jnp.broadcast_to(cidx[None, :], flat.shape)
        lists = lists.at[flat.reshape(-1)].set(vals.reshape(-1), mode="drop")
        counts = counts + local[:, -1]
        return (lists, counts), None

    lists0 = jnp.full((num_tiles * k,), -1, dtype=jnp.int32)
    counts0 = jnp.zeros((num_tiles,), dtype=jnp.int32)
    (lists, counts), _ = jax.lax.scan(step, (lists0, counts0), jnp.arange(n_chunks))

    n_dropped = jnp.sum(jnp.maximum(counts - k, 0))
    return TileLists(idx=lists.reshape(num_tiles, k), count=counts, n_dropped=n_dropped)
