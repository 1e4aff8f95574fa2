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


class BucketedLists(NamedTuple):
    """Depth-ordered per-tile lists in rank-assigned capacity classes.

    The CUDA reference renders every overlap but terminates each PIXEL the
    moment its transmittance drops below 1e-4 (forward.cu:358-366), so its
    real per-tile work is saturation-bounded, not count-bounded.  The
    static-shape TPU equivalent: tiles are ranked by how many depth-ordered
    Gaussians they actually NEED (``k_eff`` — the true overlap count, or a
    conservative saturation bound when ``sat_margin`` is on) and assigned
    to a static ladder of capacity classes (``bucket_spec``); each tile is
    rendered exactly once, at its class capacity, on a per-class virtual
    tile grid.  Overflow past a class capacity is counted in ``n_dropped``;
    pairs masked because transmittance provably saturates above them are
    counted separately in ``n_sat_masked`` (they contribute nothing to the
    forward OR the backward — ``committed`` would zero them anyway).
    """

    tile_ids: Tuple[jax.Array, ...]  # per class: [n_b] int32 tile ids
    idx: Tuple[jax.Array, ...]       # per class: [n_b, k_b] int32, -1 pad
    count: jax.Array                 # [T] true per-tile overlap counts
    k_eff: jax.Array                 # [T] per-tile need used for ranking
    n_refs: jax.Array                # [] total non-pad (tile, slot) refs
    n_dropped: jax.Array             # [] pairs lost to budgets/class caps
    n_sat_masked: jax.Array          # [] provably-invisible masked pairs
    # visible-rank compaction (None unless visible_budget > 0): idx entries
    # are then RANKS into the touched-descending order, vis_ids[r] is the
    # original gaussian id at rank r, and rank_of is the inverse
    # permutation (>= V outside the prefix).  Every downstream per-gaussian
    # cost — emission sort, inverse-map probes, per-iteration transforms /
    # table builds / gradient heads — scales with V instead of N (a real
    # camera sees 30-60% of a room-scale map).
    vis_ids: Optional[jax.Array] = None   # [V] int32
    rank_of: Optional[jax.Array] = None   # [N] int32


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


SAT_SCALE = 255                  # per-quadrant alpha quantization steps
T_DONE_LOG = -9.210340371976182  # ln(1e-4), the blend's committed cutoff


def resolve_bucket_spec(spec, num_tiles: int):
    """Resolve a bucket spec against a concrete tile count.

    ``spec``: ((n_tiles, k), ..., (-1, k_min)) with k strictly descending,
    every k a positive multiple of 128 and of k_min (so class lists reshape
    into k_min-wide rows for ONE combined gather/inverse map), and exactly
    the last entry taking the remainder (n = -1).  Returns a tuple of
    (n, k) with n >= 0 summing to ``num_tiles`` (zero-size classes kept:
    static shapes must not depend on the runtime tile count).
    """
    spec = tuple((int(n), int(k)) for n, k in spec)
    if not spec or spec[-1][0] != -1:
        raise ValueError("bucket_spec's last entry must be (-1, k_min)")
    ks = [k for _, k in spec]
    k_min = ks[-1]
    if any(k <= 0 or k % k_min for k in ks):
        raise ValueError(f"bucket ks must be positive multiples of the "
                         f"last class's k ({k_min}): {ks}")
    if any(a <= b for a, b in zip(ks, ks[1:])):
        raise ValueError(f"bucket ks must be strictly descending: {ks}")
    if any(n < 0 for n, _ in spec[:-1]):
        raise ValueError("only the last bucket may have n = -1")
    out, left = [], num_tiles
    for n, k in spec[:-1]:
        n = min(n, left)
        out.append((n, k))
        left -= n
    out.append((left, k_min))
    return tuple(out)


class SortedPairs(NamedTuple):
    """Shared emission+sort+saturation core output (see `_emit_sort_sat`)."""

    s_gauss: jax.Array        # [M] gaussian ids (or visible RANKS) sorted by (tile, depth)
    starts: jax.Array         # [T] per-tile run starts in the sorted order
    ends: jax.Array           # [T]
    counts: jax.Array         # [T] true overlap counts
    k_eff: jax.Array          # [T] saturation-bounded per-tile need
    n_sat_masked: jax.Array   # []
    n_dropped_pre: jax.Array  # [] emission-cap + row-budget drops
    order: jax.Array          # [N] touched-descending gaussian order
    v_budget: int             # 0 or the applied visible budget


def _emit_sort_sat(
    rect_min, rect_max, valid, depth, grid, tile_shape,
    r_cap, emission_budgets, sat_margin, sat_floor,
    xy, conic, opacity, visible_budget,
) -> SortedPairs:
    """Budgeted prefix emission -> one 3-key sort -> per-tile runs +
    saturation-bounded need.  The shared front half of :func:`bin_bucketed`
    and :func:`bin_stream` (see their docstrings for the semantics)."""
    grid_y, grid_x = grid
    th, tw = tile_shape
    n = depth.shape[0]
    num_tiles = grid_y * grid_x
    # visible-rank compaction: emission only covers the first V rows of
    # the touched-descending order, so budgets (and every sort fed by
    # them) shrink from O(N) to O(V); gaussians ranked past V are counted
    # into n_dropped (the pipeline warns on overflow).
    v_budget = min(visible_budget, n) if visible_budget > 0 else 0
    base_n = v_budget if v_budget else n
    budgets = (
        tuple(emission_budgets)
        if emission_budgets is not None
        else default_emission_budgets(base_n, r_cap)
    )
    budgets = tuple(min(b, base_n) for b in budgets)
    assert len(budgets) >= r_cap
    with_sat = sat_margin > 0.0
    if with_sat and (xy is None or conic is None or opacity is None):
        raise ValueError("sat_margin > 0 requires xy/conic/opacity")

    w_rect = (rect_max[:, 0] - rect_min[:, 0]).astype(jnp.int32)
    touched_all = jnp.where(
        valid, w_rect * (rect_max[:, 1] - rect_min[:, 1]).astype(jnp.int32), 0
    )
    n_dropped_emit = jnp.sum(jnp.maximum(touched_all - r_cap, 0))
    touched = jnp.minimum(touched_all, r_cap)

    # sort by touched DESCENDING so row-r emission is a prefix property
    # (see bin_gaussians); ONE packed int32 gather reorders everything the
    # emission needs, saturation columns included.
    order = jnp.argsort(-touched, stable=False).astype(jnp.int32)
    cols = [
        rect_min[:, 0],
        rect_min[:, 1],
        jnp.maximum(w_rect, 1),
        touched,
        jax.lax.bitcast_convert_type(depth, jnp.int32),
    ]
    if with_sat:
        cols += [
            jax.lax.bitcast_convert_type(xy[:, 0].astype(jnp.float32), jnp.int32),
            jax.lax.bitcast_convert_type(xy[:, 1].astype(jnp.float32), jnp.int32),
            jax.lax.bitcast_convert_type(conic[:, 0].astype(jnp.float32), jnp.int32),
            jax.lax.bitcast_convert_type(conic[:, 1].astype(jnp.float32), jnp.int32),
            jax.lax.bitcast_convert_type(conic[:, 2].astype(jnp.float32), jnp.int32),
            jax.lax.bitcast_convert_type(
                opacity.reshape(-1).astype(jnp.float32), jnp.int32
            ),
        ]
    width = 16 if with_sat else 8
    cols += [jnp.zeros_like(touched)] * (width - len(cols))
    packed_src = jax.lax.optimization_barrier(jnp.stack(cols, -1))
    # barriers pin the packed-int32-row gather fast path (XLA otherwise
    # fuses the stack into the gather and falls off the packed-row class).
    # Only the first base_n rows of the order are ever read (every budget
    # is clamped to base_n), so the gather stops there — at N=2M/V=1.5M
    # this trims 25% off the trace's hottest binning op.
    packed = jax.lax.optimization_barrier(
        packed_src[order[:base_n]]
    )  # [base_n, width]
    depth_s = jax.lax.bitcast_convert_type(packed[:, 4], jnp.float32)
    if with_sat:
        sxy_x = jax.lax.bitcast_convert_type(packed[:, 5], jnp.float32)
        sxy_y = jax.lax.bitcast_convert_type(packed[:, 6], jnp.float32)
        sc_a = jax.lax.bitcast_convert_type(packed[:, 7], jnp.float32)
        sc_b = jax.lax.bitcast_convert_type(packed[:, 8], jnp.float32)
        sc_c = jax.lax.bitcast_convert_type(packed[:, 9], jnp.float32)
        sopa = jax.lax.bitcast_convert_type(packed[:, 10], jnp.float32)

    cnt_gt = jnp.stack(
        [jnp.sum((touched > r).astype(jnp.int32)) for r in range(r_cap)]
    )
    buds = jnp.asarray(budgets[:r_cap], jnp.int32)
    n_dropped_budget = jnp.sum(jnp.maximum(cnt_gt - buds, 0))

    tiles_parts, depth_parts, gauss_parts, alpha_parts = [], [], [], []
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
        # under compaction, lists carry RANKS into the touched-descending
        # order (the compact row index), not original gaussian ids
        gauss_parts.append(
            jnp.arange(b, dtype=jnp.int32) if v_budget else order[:b]
        )
        if with_sat:
            # per-quadrant conservative alpha lower bounds: the falloff
            # exponent is concave in pixel position, so each quadrant's
            # minimum sits at one of its corners — 9 evaluations on the
            # tile's 3x3 corner grid, min-combined per quadrant.
            # Quantized FLOOR-ward (underestimates alpha -> overestimates
            # surviving transmittance -> never truncates a contributor).
            x0 = (cell_x * tw).astype(jnp.float32)
            y0 = (cell_y * th).astype(jnp.float32)
            hw, hh = (tw - 1) * 0.5, (th - 1) * 0.5
            pgrid = []
            for cy in (y0, y0 + hh, y0 + (th - 1)):
                row = []
                for cx in (x0, x0 + hw, x0 + (tw - 1)):
                    dx = sxy_x[:b] - cx
                    dy = sxy_y[:b] - cy
                    row.append(
                        -0.5 * (sc_a[:b] * dx * dx + sc_c[:b] * dy * dy)
                        - sc_b[:b] * dx * dy
                    )
                pgrid.append(row)
            pay = jnp.zeros((b,), jnp.uint32)
            for qi, (iy, ix) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
                pmin = jnp.minimum(
                    jnp.minimum(pgrid[iy][ix], pgrid[iy][ix + 1]),
                    jnp.minimum(pgrid[iy + 1][ix], pgrid[iy + 1][ix + 1]),
                )
                alpha_lb = jnp.minimum(sopa[:b] * jnp.exp(pmin), 0.99)
                # below the blend's ALPHA_MIN skip there is no guaranteed
                # contribution at every pixel -> no transmittance credit
                alpha_lb = jnp.where(alpha_lb >= 1.0 / 255.0, alpha_lb, 0.0)
                aq = jnp.floor(alpha_lb / 0.99 * SAT_SCALE).astype(jnp.uint32)
                pay = pay | (jnp.where(ok, aq, 0) << (8 * qi))
            alpha_parts.append(pay)

    flat_tile = jnp.concatenate(tiles_parts)
    flat_depth = jnp.concatenate(depth_parts)
    flat_gauss = jnp.concatenate(gauss_parts)

    # (tile, depth, gauss) keys — ascending gaussian id resolves (tile,
    # depth) ties exactly like the CUDA radix sort (see bin_gaussians);
    # the quadrant alpha bounds ride along as a pure payload operand.
    if with_sat:
        s_tile, _, s_gauss, s_alpha = jax.lax.sort(
            (flat_tile, flat_depth, flat_gauss, jnp.concatenate(alpha_parts)),
            num_keys=3, is_stable=False,
        )
    else:
        s_tile, _, s_gauss = jax.lax.sort(
            (flat_tile, flat_depth, flat_gauss), num_keys=3, is_stable=False
        )

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(s_tile, tile_ids).astype(jnp.int32)
    ends = jnp.searchsorted(s_tile, tile_ids, side="right").astype(jnp.int32)
    counts = ends - starts
    m = s_gauss.shape[0]

    n_sat_masked = jnp.zeros((), jnp.int32)
    if with_sat:
        # Per quadrant: ln T upper bound just BEFORE each sorted pair is an
        # exclusive global cumsum of ln(1p(-alpha_lb)) — globally monotone
        # nonincreasing (terms <= 0), so the per-tile saturation rank is
        # ONE searchsorted against the run-start offsets (3k queries, not
        # an M-row gather).  A tile saturates at the LAST of its quadrants.
        k_need = jnp.zeros((num_tiles,), jnp.int32)
        for qi in range(4):
            alpha_deq = (
                (s_alpha >> (8 * qi)) & SAT_SCALE
            ).astype(jnp.float32) * (0.99 / SAT_SCALE)
            csh = jnp.concatenate(
                [jnp.zeros((1,), jnp.float32),
                 jnp.cumsum(jnp.log1p(-alpha_deq))[:-1]]
            )
            csh_start = csh[jnp.minimum(starts, m - 1)]
            # number of positions p >= start_t with csh[p] > csh_start +
            # lnT: csh nonincreasing -> count = searchsorted - start
            thresh = csh_start + T_DONE_LOG
            hits = jnp.searchsorted(-csh, -thresh, side="right").astype(jnp.int32)
            k_need = jnp.maximum(k_need, jnp.clip(hits - starts, 0, counts))
        k_eff = jnp.minimum(
            counts,
            jnp.maximum(
                jnp.int32(sat_floor),
                jnp.ceil(sat_margin * k_need.astype(jnp.float32)).astype(jnp.int32),
            ),
        )
        n_sat_masked = jnp.sum(counts - k_eff)
    else:
        k_eff = counts

    return SortedPairs(
        s_gauss=s_gauss,
        starts=starts,
        ends=ends,
        counts=counts,
        k_eff=k_eff,
        n_sat_masked=n_sat_masked,
        n_dropped_pre=n_dropped_emit + n_dropped_budget,
        order=order,
        v_budget=v_budget,
    )


def _vis_fields(sp: SortedPairs, n: int):
    if not sp.v_budget:
        return None, None
    vis_ids = sp.order[: sp.v_budget]
    # inverse permutation by one sort: position i where order[i] == g
    _, rank_of = jax.lax.sort(
        (sp.order, jnp.arange(n, dtype=jnp.int32)), num_keys=1
    )
    return vis_ids, rank_of


def bin_bucketed(
    rect_min: jax.Array,
    rect_max: jax.Array,
    valid: jax.Array,
    depth: jax.Array,
    grid: Tuple[int, int],
    bucket_spec,
    tile_shape: Tuple[int, int],
    max_tiles_per_gaussian: int = 16,
    emission_budgets: Optional[Sequence[int]] = None,
    sat_margin: float = 0.0,
    sat_floor: int = 64,
    xy: Optional[jax.Array] = None,
    conic: Optional[jax.Array] = None,
    opacity: Optional[jax.Array] = None,
    visible_budget: int = 0,
) -> BucketedLists:
    """Rank-bucketed per-tile lists (see :class:`BucketedLists`).

    Same budgeted emission + one 3-key sort as :func:`bin_gaussians`; the
    per-tile lists are then extracted at RANK-assigned class capacities
    instead of one uniform K.

    With ``sat_margin > 0`` (requires ``xy``/``conic``/``opacity``), each
    emitted (gaussian, tile) pair carries QUANTIZED conservative lower
    bounds of the gaussian's alpha over each of the tile's four 8x8
    QUADRANTS: the blend's falloff exponent is concave in pixel position,
    so its minimum over a quadrant rectangle sits at one of its corners —
    evaluated on the tile's 3x3 corner grid.  (Quadrant resolution matters:
    a whole-tile bound is ~100x too weak when gaussians are smaller than
    the 16px tile, because no single pixel realizes every pair's worst
    corner at once.)  The four 8-bit bounds ride the sort as one extra
    uint32 payload operand; after the sort, four global cumsums of
    ``log1p(-alpha_lb)`` (each monotone nonincreasing) give, per tile, the
    first depth rank where EVERY quadrant's transmittance provably falls
    below the blend's 1e-4 cutoff at all of its pixels
    (forward.cu:358-366).  ``k_eff`` is then ``min(count, max(sat_floor,
    ceil(sat_margin * k_need)))`` — the margin covers parameter drift
    while amortized lists stay live — and pairs beyond it are masked out
    of the lists (counted in ``n_sat_masked``).
    """
    grid_y, grid_x = grid
    num_tiles = grid_y * grid_x
    n = depth.shape[0]
    spec = resolve_bucket_spec(bucket_spec, num_tiles)
    sp = _emit_sort_sat(
        rect_min, rect_max, valid, depth, grid, tile_shape,
        max_tiles_per_gaussian, emission_budgets, sat_margin, sat_floor,
        xy, conic, opacity, visible_budget,
    )
    s_gauss, starts, counts, k_eff = sp.s_gauss, sp.starts, sp.counts, sp.k_eff
    m = s_gauss.shape[0]

    # rank-assign tiles to capacity classes by need
    rank_order = jnp.argsort(-k_eff, stable=False).astype(jnp.int32)
    s_gauss_pad = jnp.concatenate([s_gauss, jnp.full((1,), -1, jnp.int32)])
    ids_out, idx_out = [], []
    n_class_dropped = jnp.zeros((), jnp.int32)
    n_refs = jnp.zeros((), jnp.int32)
    off = 0
    for n_b, k_b in spec:
        ids_b = rank_order[off:off + n_b]
        off += n_b
        lim_b = jnp.minimum(k_eff[ids_b], k_b)             # [n_b]
        kk = jnp.arange(k_b, dtype=jnp.int32)
        take = starts[ids_b][:, None] + kk[None, :]
        ok = kk[None, :] < lim_b[:, None]
        idx_b = jnp.where(ok, s_gauss_pad[jnp.minimum(take, m)], -1)
        ids_out.append(ids_b)
        idx_out.append(idx_b)
        n_refs = n_refs + jnp.sum(lim_b)
        # real pairs (within k_eff) lost to this class's capacity
        n_class_dropped = n_class_dropped + jnp.sum(
            jnp.maximum(jnp.minimum(k_eff[ids_b], counts[ids_b]) - k_b, 0)
        )

    n_dropped = n_class_dropped + sp.n_dropped_pre
    vis_ids, rank_of = _vis_fields(sp, n)
    return BucketedLists(
        tile_ids=tuple(ids_out),
        idx=tuple(idx_out),
        count=counts,
        k_eff=k_eff,
        n_refs=n_refs,
        n_dropped=n_dropped,
        n_sat_masked=sp.n_sat_masked,
        vis_ids=vis_ids,
        rank_of=rank_of,
    )


class StreamLists(NamedTuple):
    """Ragged depth-ordered pair stream, quantized to ``rw``-pair rows.

    The TRUE static-shape analogue of the CUDA pipeline's render-every-
    overlap-until-saturation (rasterizer_impl.cu:281-312 + the per-pixel
    ``T<1e-4`` stop, forward.cu:358-366): each tile gets exactly
    ``ceil(k_alloc / rw)`` consecutive rows of the stream, where
    ``k_alloc`` is its saturation-bounded need ``k_eff`` (capped at
    ``k_cap``) granted under a GLOBAL pair budget by waterfilling — all
    tiles share one ceiling ``c`` chosen as the largest value for which
    ``sum(min(rows_needed, c))`` fits the budget, with leftover rows going
    to the highest-need tiles.  Unlike a capacity-class ladder there is no
    per-class padding: blended pairs ~= the real saturation-bounded count.

    ``idx`` is [R, rw] with rows grouped by ascending tile id; PAD slots
    hold ``sentinel`` (= the row count of the gather table, pointing at an
    appended all-zero row whose opacity logit is very negative — they blend
    to nothing and route no gradient).  Under visible compaction entries
    are RANKS (compact row ids) like :class:`BucketedLists`.
    """

    idx: jax.Array          # [R, rw] int32 (sentinel-padded)
    row_off: jax.Array      # [T+1] int32 row offsets per tile (ascending)
    count: jax.Array        # [T] true overlap counts
    k_eff: jax.Array        # [T] saturation-bounded need
    k_alloc: jax.Array      # [T] granted slots (multiple of rw, or k_eff rounded)
    n_refs: jax.Array       # [] kept (non-pad) pairs
    n_rows: jax.Array       # [] used rows (<= R)
    n_dropped: jax.Array    # [] real pairs lost (budget + caps + emission)
    n_sat_masked: jax.Array
    # pad value (the sentinel row index) is NOT carried: it equals the
    # gather table's row count minus one, which callers know statically
    # (all fields must be stackable arrays for lax.map over window frames)
    vis_ids: Optional[jax.Array] = None
    rank_of: Optional[jax.Array] = None


def bin_stream(
    rect_min: jax.Array,
    rect_max: jax.Array,
    valid: jax.Array,
    depth: jax.Array,
    grid: Tuple[int, int],
    tile_shape: Tuple[int, int],
    stream_rows: int,
    k_cap: int = 4096,
    rw: int = 128,
    max_tiles_per_gaussian: int = 16,
    emission_budgets: Optional[Sequence[int]] = None,
    sat_margin: float = 0.0,
    sat_floor: int = 64,
    xy: Optional[jax.Array] = None,
    conic: Optional[jax.Array] = None,
    opacity: Optional[jax.Array] = None,
    visible_budget: int = 0,
) -> StreamLists:
    """Build the ragged pair stream (see :class:`StreamLists`).

    ``stream_rows`` (static) is the global budget in ``rw``-pair rows;
    ``k_cap`` bounds any single tile (static, sets the renderer's per-tile
    scratch).  Sharing the emission/sort/saturation core with
    :func:`bin_bucketed`.
    """
    grid_y, grid_x = grid
    num_tiles = grid_y * grid_x
    n = depth.shape[0]
    assert k_cap % rw == 0
    sp = _emit_sort_sat(
        rect_min, rect_max, valid, depth, grid, tile_shape,
        max_tiles_per_gaussian, emission_budgets, sat_margin, sat_floor,
        xy, conic, opacity, visible_budget,
    )
    counts, k_eff, starts = sp.counts, sp.k_eff, sp.starts
    m = sp.s_gauss.shape[0]
    mrt = k_cap // rw

    # --- waterfill: one global row ceiling c* + leftover to top need -----
    rows_need = -(-jnp.minimum(k_eff, k_cap) // rw)          # [T]
    # f(j) = sum(min(rows_need, j)) is monotone in j; pick the largest
    # j <= mrt with f(j) <= stream_rows (j=0..mrt is a SMALL static range)
    f = jnp.stack(
        [jnp.sum(jnp.minimum(rows_need, j)) for j in range(mrt + 1)]
    )                                                         # [mrt+1]
    j_star = jnp.sum((f <= stream_rows).astype(jnp.int32)) - 1  # >= 0 (f(0)=0)
    rows_alloc = jnp.minimum(rows_need, j_star)
    # leftover rows raise the hardest tiles one row at a time: tiles with
    # unmet need, in descending-need order, until the budget is exhausted
    leftover = stream_rows - jnp.sum(rows_alloc)
    unmet = rows_need - rows_alloc                            # [T] >= 0
    deficit_order = jnp.argsort(-unmet, stable=False)
    gets_extra = jnp.zeros((num_tiles,), jnp.int32).at[deficit_order].set(
        (jnp.arange(num_tiles) < leftover).astype(jnp.int32)
        * (unmet[deficit_order] > 0).astype(jnp.int32)
    )
    rows_alloc = rows_alloc + gets_extra
    k_alloc = jnp.minimum(rows_alloc * rw, jnp.minimum(k_eff, k_cap))

    row_off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(rows_alloc).astype(jnp.int32)]
    )                                                         # [T+1]
    n_rows = row_off[-1]

    # --- stream extraction ----------------------------------------------
    r_ids = jnp.arange(stream_rows, dtype=jnp.int32)
    # tile of row r: last t with row_off[t] <= r (pad rows -> num_tiles-1,
    # masked below by r < n_rows)
    tile_of_row = (
        jnp.searchsorted(row_off[1:], r_ids, side="right").astype(jnp.int32)
    )
    tile_of_row = jnp.minimum(tile_of_row, num_tiles - 1)
    base = (r_ids - row_off[tile_of_row]) * rw                # [R]
    lim = jnp.minimum(k_alloc, counts)[tile_of_row]           # [R]
    lane = jnp.arange(rw, dtype=jnp.int32)
    take = starts[tile_of_row][:, None] + base[:, None] + lane[None, :]
    ok = (
        (base[:, None] + lane[None, :] < lim[:, None])
        & (r_ids[:, None] < n_rows)
    )
    sentinel = sp.v_budget if sp.v_budget else n
    s_gauss_pad = jnp.concatenate(
        [sp.s_gauss, jnp.full((1,), sentinel, jnp.int32)]
    )
    idx = jnp.where(ok, s_gauss_pad[jnp.minimum(take, m)], sentinel)

    kept = jnp.minimum(k_alloc, counts)
    n_refs = jnp.sum(kept)
    n_dropped = sp.n_dropped_pre + jnp.sum(
        jnp.maximum(jnp.minimum(k_eff, counts) - kept, 0)
    )
    vis_ids, rank_of = _vis_fields(sp, n)
    return StreamLists(
        idx=idx,
        row_off=row_off,
        count=counts,
        k_eff=k_eff,
        k_alloc=k_alloc,
        n_refs=n_refs,
        n_rows=n_rows,
        n_dropped=n_dropped,
        n_sat_masked=sp.n_sat_masked,
        vis_ids=vis_ids,
        rank_of=rank_of,
    )


