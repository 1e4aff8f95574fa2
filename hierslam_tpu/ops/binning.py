"""Static-shape tile binning: sort-based duplicate + compact (no scatters).

TPU-native equivalent of the CUDA pipeline's dynamic
``duplicateWithKeys -> CUB radix sort -> identifyTileRanges``
(cuda_rasterizer/rasterizer_impl.cu:70-138, 281-312):

1. every Gaussian emits one (tile, depth) key pair per tile its screen
   rect covers, enumerated arithmetically (row-major within the rect);
2. ONE ``jax.lax.sort`` over the flattened pairs (two keys: tile id, then
   view depth — replacing the radix sort over ``tile<<32|depth-bits``);
3. per-tile ranges via ``searchsorted`` and fixed-K per-tile lists via a
   strided gather (replacing ``identifyTileRanges``).

Emission is BUDGETED, not dense: a dense [N, R] emission wastes 3-8x of
the sort on sentinel keys (most gaussians touch 1-4 tiles; R=16).  Instead
gaussians are sorted by ``tiles_touched`` DESCENDING, so "emits an r-th
cell" is a PREFIX property of the sorted order: cell-row r only needs a
``B_r``-long emission array, with ``B_r`` shrinking geometrically.  Total
sort keys drop from N*R to ~3N with exact accounting of any budget
overflow (counted in ``n_dropped``, never silent).

Scatter-free by construction: XLA scatters are pathologically slow on TPU
(both to compile and to run), while sorts, searchsorted and gathers are
well-supported.  Overflow beyond K per tile, beyond the per-gaussian
emission cap, or beyond a row budget is counted and reported.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


class TileLists(NamedTuple):
    idx: jax.Array       # [T, K] int32 Gaussian indices in depth order, -1 pad
    count: jax.Array     # [T] int32 number of overlapping Gaussians (may exceed K)
    n_dropped: jax.Array  # [] int32 overflowed (gaussian, tile) pairs (K cap + emission caps)


class EscalatedLists(NamedTuple):
    """Extended depth-ordered lists for the heaviest-overlap tiles.

    The CUDA reference renders EVERY overlap (rasterizer_impl.cu:281-312);
    a static per-tile K instead truncates dense tiles, and the truncation
    error concentrates in the few tiles whose true count exceeds K.  The
    top ``n_escalate`` tiles by count get a second list at ``escalate_k``
    slots; the renderer re-blends exactly those tiles and replaces their
    pixels, so the effective cap is ``escalate_k`` where it matters while
    everything else stays at the cheap K.
    """

    tile_ids: jax.Array  # [OB] int32 tile ids (top counts, unordered)
    idx: jax.Array       # [OB, K_big] int32 indices in depth order, -1 pad
    count: jax.Array     # [OB] int32 true overlap counts of those tiles


def default_emission_budgets(n: int, r_cap: int) -> Tuple[int, ...]:
    """Per-cell-row emission budgets.

    Row 0 must cover every valid gaussian (budget n).  Later rows shrink:
    only gaussians whose rect has > r cells emit a row-r cell, and real
    rect-size distributions fall off fast (radius 3-30 px at 16x16 tiles).
    The floor keeps tiny test scenes exact.
    """
    out = []
    for r in range(r_cap):
        if r < 2:
            b = n
        elif r < 4:
            b = -(-n // 2)
        elif r < 8:
            b = -(-n // 4)
        else:
            b = -(-n // 16)
        out.append(min(n, max(b, 4096)))
    return tuple(out)


def bin_gaussians(
    rect_min: jax.Array,
    rect_max: jax.Array,
    valid: jax.Array,
    depth: jax.Array,
    grid: Tuple[int, int],
    max_per_tile: int,
    chunk: int = 16384,                 # kept for API compatibility (unused)
    max_tiles_per_gaussian: int = 32,
    emission_budgets: Optional[Sequence[int]] = None,
    n_escalate: int = 0,
    escalate_k: int = 0,
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
        emission_budgets: optional per-cell-row emission budgets (length
            ``max_tiles_per_gaussian``); defaults to
            :func:`default_emission_budgets`.
        n_escalate / escalate_k: when > 0, also return
            :class:`EscalatedLists` for the ``n_escalate`` highest-count
            tiles at ``escalate_k`` slots (see its docstring); pairs those
            lists recover are not counted in ``n_dropped``.

    Returns:
        ``(TileLists, EscalatedLists | None)``.
    """
    grid_y, grid_x = grid
    n = depth.shape[0]
    num_tiles = grid_y * grid_x
    k = max_per_tile
    r_cap = max_tiles_per_gaussian
    budgets = (
        tuple(emission_budgets)
        if emission_budgets is not None
        else default_emission_budgets(n, r_cap)
    )
    assert len(budgets) >= r_cap

    w_rect = (rect_max[:, 0] - rect_min[:, 0]).astype(jnp.int32)
    touched_all = jnp.where(
        valid, w_rect * (rect_max[:, 1] - rect_min[:, 1]).astype(jnp.int32), 0
    )
    n_dropped_emit = jnp.sum(jnp.maximum(touched_all - r_cap, 0))
    touched = jnp.minimum(touched_all, r_cap)

    # Sort gaussians by touched DESCENDING (invalid = 0 touched sorts last):
    # "touches > r tiles" becomes a prefix of this order, so cell-row r only
    # needs its first B_r entries.  Unstable: equal-touched order is
    # irrelevant (it only picks WHICH gaussians drop if a row budget
    # overflows, which is counted either way) and stability would add an
    # iota operand to a 2M-row sort.
    order = jnp.argsort(-touched, stable=False).astype(jnp.int32)
    # ONE 8-column gather reorders rects + depth together: C=8 int32 rows
    # ride the fast packed-row gather path (~3 ns/row), while a separate
    # 1-column f32 depth gather would pay its own ~6 ns/row pass.  Depth
    # travels as bitcast int32 (exact round-trip).
    packed_src = jax.lax.optimization_barrier(
        jnp.stack(
            [
                rect_min[:, 0],
                rect_min[:, 1],
                jnp.maximum(w_rect, 1),
                touched,
                jax.lax.bitcast_convert_type(depth, jnp.int32),
                jnp.zeros_like(touched),
                jnp.zeros_like(touched),
                jnp.zeros_like(touched),
            ],
            -1,
        )
    )
    # barriers pin the packed-8-int32-row gather fast path (XLA otherwise
    # fuses the stack into the gather and falls off to ~17 ns/row)
    packed = jax.lax.optimization_barrier(packed_src[order])  # [N, 8] int32
    depth_s = jax.lax.bitcast_convert_type(packed[:, 4], jnp.float32)

    # budget-overflow accounting: row r drops (count(touched > r) - B_r)+
    cnt_gt = jnp.stack(
        [jnp.sum((touched > r).astype(jnp.int32)) for r in range(r_cap)]
    )
    buds = jnp.asarray(budgets[:r_cap], jnp.int32)
    n_dropped_budget = jnp.sum(jnp.maximum(cnt_gt - buds, 0))

    tiles_parts = []
    depth_parts = []
    gauss_parts = []
    for r in range(r_cap):
        b = budgets[r]
        pk = packed[:b]
        cell_x = pk[:, 0] + r % pk[:, 2]
        cell_y = pk[:, 1] + r // pk[:, 2]
        ok = r < pk[:, 3]
        tiles_parts.append(
            jnp.where(ok, cell_y * grid_x + cell_x, num_tiles).astype(jnp.int32)
        )
        depth_parts.append(depth_s[:b])
        gauss_parts.append(order[:b])

    flat_tile = jnp.concatenate(tiles_parts)
    flat_depth = jnp.concatenate(depth_parts)
    flat_gauss = jnp.concatenate(gauss_parts)

    # exact (tile, depth) order — no depth quantization.  The gaussian id
    # is the THIRD sort key instead of a stability flag: (tile, depth) ties
    # resolve to ascending gaussian id, which is exactly the CUDA radix
    # sort's tie order (duplicateWithKeys emits in gaussian-index order,
    # rasterizer_impl.cu:70-111), and an unstable 3-key sort carries one
    # fewer operand than a stable 2-key one (XLA adds an iota tiebreaker
    # for is_stable) — ~25% off the binning sort, its largest term.
    s_tile, _, s_gauss = jax.lax.sort(
        (flat_tile, flat_depth, flat_gauss), num_keys=3, is_stable=False
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
    # NOTE a round-3 attempt widened this to an 8-int32-column source to
    # chase the packed-small-row gather class; measured on hardware at the
    # bench shape (2M gaussians, 9M-row source, [T,K]=3.3M takes) the
    # widened gather is 1.7x SLOWER (98.9 vs 57.7 ms) — the packed class
    # does not apply at this source size and the 8x extra traffic loses.
    lists = jnp.where(ok, s_gauss_pad[jnp.minimum(take, m)], -1)

    n_dropped = (
        jnp.sum(jnp.maximum(counts - k, 0)) + n_dropped_emit + n_dropped_budget
    )

    esc = None
    if n_escalate > 0 and escalate_k > k:
        ob = min(n_escalate, num_tiles)
        kb = escalate_k
        _, big_ids = jax.lax.top_k(counts, ob)
        big_ids = big_ids.astype(jnp.int32)
        big_counts = counts[big_ids]
        kkb = jnp.arange(kb, dtype=jnp.int32)
        take_b = starts[big_ids][:, None] + kkb[None, :]          # [OB, Kb]
        ok_b = kkb[None, :] < big_counts[:, None]
        big_idx = jnp.where(ok_b, s_gauss_pad[jnp.minimum(take_b, m)], -1)
        esc = EscalatedLists(tile_ids=big_ids, idx=big_idx, count=big_counts)
        # pairs in (K, min(count, Kb)] of the escalated tiles DO render now
        recovered = jnp.sum(
            jnp.minimum(big_counts, kb) - jnp.minimum(big_counts, k)
        )
        n_dropped = n_dropped - recovered

    return TileLists(idx=lists, count=counts, n_dropped=n_dropped), esc
