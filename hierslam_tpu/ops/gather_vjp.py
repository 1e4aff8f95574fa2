"""Scatter-free gradient routing for per-tile gathers.

The VJP of a gather is a scatter-add; XLA scatters on TPU are catastrophic
(~100ms+ per call, minutes to compile).  This module instead routes the
cotangents through a per-binning *inverse permutation*: the flat (tile,
slot) positions sorted by the Gaussian they reference.  The gather's
backward is then

1. ONE row-gather that permutes the [T*K, C] cotangent table into
   gaussian-sorted order (row-gathers cost ~20ns/row on TPU — this is the
   floor, and it is 3x fewer rows than a per-gaussian [N, R] gather);
2. a Hillis-Steele *segmented suffix-sum* over the sorted rows — ``log2(
   max_run)`` masked shift-adds, pure VPU work, no gathers;
3. one [N]-row gather of each run's head.

Unlike a fixed-R inverse list, this reduction is EXACT for every cap
configuration: a Gaussian referenced by any number of (tile, slot) pairs
(bounded by ``max_tiles_per_gaussian``) gets its full gradient.

``build_inverse_map`` is scatter-free too: one ``jax.lax.sort`` of the
flattened (gaussian_id, position) pairs + ``searchsorted``.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

# Measured on v5e (tools/micro_prims.py): random row gathers run ~2.4
# ns/row when the row is a whole number of 128-lane vector rows, but 10-30
# ns/row at partial widths (e.g. C=38) — the gather degrades to a
# lane-masked slow path.  Padding the table to a 128-column multiple and
# slicing after the gather is a ~5x win, but ONLY behind
# ``optimization_barrier``s: XLA otherwise fuses the slice back into the
# gather and re-materializes the slow narrow form (measured identical to
# the unpadded gather).  The pad/slice copies are bandwidth-bound (~10 ms
# total at the 3.3M-row mapping shapes vs ~90 ms saved).
LANE = 128


def pad_cols_for_gather(x: jax.Array) -> jax.Array:
    """Pad the last axis to the next 128-lane multiple (zero fill)."""
    c = x.shape[-1]
    pad = (-c) % LANE
    if pad == 0:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])


def pack_cols_table(cols, width_mult: int = LANE) -> jax.Array:
    """Assemble 1-D [N] columns into a lane-aligned [N, 128·k] gather table.

    ``width_mult`` overrides the 128-lane padding: the packed-table mapping
    scan keeps its table (and Adam moments, and the scan's double buffers
    of both) at the USED width padded to a sublane multiple (8) instead —
    at N=2M the 94 dead f32 columns otherwise cost ~6 GB of HBM across
    those buffers.  :func:`aligned_gather_rows` re-pads to 128 lanes
    transiently whenever such a table feeds a row gather.

    A 2-D f32 array tiles as T(8, 128): any materialized [N, c<128]
    intermediate pads its minor dim to 128 lanes (a [1.5M, 2] xy costs
    732MB, 64x its data), and rematerialized autodiff is free to
    materialize padded copies of every stack/concat operand — ~14 such
    copies (10GB of padding) OOM'd the N=2M mapper.  This helper builds
    the table in FLAT 1-D space instead (1-D arrays tile losslessly):
    one [width·N] concat of the columns plus a zero tail, one reshape,
    one transpose — exactly one padded buffer, already lane-aligned for
    the fast full-row gather path.  The transpose is a single
    bandwidth-bound pass (~2ms at the mapping shape); its VJP is the
    mirror transpose + split, still scatter-free.
    """
    n = cols[0].shape[0]
    ncol = len(cols)
    width = -(-ncol // width_mult) * width_mult
    pieces = [c.astype(jnp.float32).reshape(-1) for c in cols]
    if width > ncol:
        pieces.append(jnp.zeros(((width - ncol) * n,), jnp.float32))
    flat = jnp.concatenate(pieces, 0)
    return flat.reshape(width, n).T


def aligned_gather_rows(arr: jax.Array, idx: jax.Array) -> jax.Array:
    """``arr[idx]`` routed through the fast full-lane-row gather path."""
    c = arr.shape[-1]
    if c % LANE == 0:
        return arr[idx]
    arr_p = jax.lax.optimization_barrier(pad_cols_for_gather(arr))
    return jax.lax.optimization_barrier(arr_p[idx])[..., :c]


class InverseMap(NamedTuple):
    spos: jax.Array      # [T*K] flat (tile, slot) positions, sorted by gaussian id
    # [N] END of each gaussian's run in the sorted order.  starts/n_ref are
    # derived per use (starts[g] = ends[g-1], n_ref = ends - starts): the
    # map is stacked per window frame by the mapping phase, and every extra
    # [N]-sized leaf costs N*4B*window HBM (a redundant starts+n_ref pair
    # plus a runtime-dead skey tipped the N=2M/24-frame mapper 25MB over
    # the v5e's 16GB).
    ends: jax.Array
    # [T*K] int8 bit-planes: bit p set at position i iff skey[i] ==
    # skey[i + 2**p] — the segment masks of the backward's doubling passes.
    # They only depend on the sorted gaussian ids, so they are computed
    # ONCE per binning and reused across every optimizer iteration (the
    # per-iteration pred compare + packed-bool layout copies showed up at
    # ~25 ms/iter in the N=2M device trace).
    run_masks: jax.Array
    # NOTE: the static run-length bound (max_tiles_per_gaussian) lives in
    # RasterConfig, not here — pytree leaves must stay arrays for lax.map.

    @property
    def starts(self) -> jax.Array:
        return jnp.concatenate(
            [jnp.zeros((1,), self.ends.dtype), self.ends[:-1]]
        )

    @property
    def n_ref(self) -> jax.Array:
        return self.ends - self.starts


def rank_probes(keys: jax.Array, num_probes: int) -> jax.Array:
    """``ends[g] = #{i: keys[i] <= g}`` for every g in [0, num_probes).

    Equivalent to ``searchsorted(sort(keys), arange(P), side="right")`` but
    computed by MERGING: probe sentinels are sorted together with the data
    and their landing positions read off by inverting the permutation
    (a second sort).  On TPU a batched ``searchsorted`` lowers to a
    binary-search ``while`` doing log2(M) rounds of random gathers over the
    whole query set (~85 ms/iter at the bench shape — the single hottest
    op in round-1 mapping); two extra ``lax.sort`` calls cost ~3 ms.

    ``keys`` need not be pre-sorted.  Values must lie in [0, 2**30).
    """
    m = keys.shape[0]
    # probes sort AFTER equal-valued data: (value, tag) packed as 2v / 2g+1
    all_keys = jnp.concatenate(
        [keys * 2, jnp.arange(num_probes, dtype=jnp.int32) * 2 + 1]
    )
    pos = jnp.arange(m + num_probes, dtype=jnp.int32)
    _, perm = jax.lax.sort((all_keys, pos), num_keys=1)
    _, ranks = jax.lax.sort((perm, pos), num_keys=1)
    return ranks[m:] - jnp.arange(num_probes, dtype=jnp.int32)


def build_inverse_map(
    tile_idx: jax.Array, num_gaussians: int, max_run: int = 0
) -> InverseMap:
    """Invert [T, K] per-tile gaussian-index lists (-1 padded).

    ``max_run`` is accepted for signature compatibility; the static bound
    is supplied at the :func:`gather_rows` call instead.
    """
    flat = tile_idx.reshape(-1)
    m = flat.shape[0]
    pos = jnp.arange(m, dtype=jnp.int32)
    # sort pairs by gaussian id; -1 pads sort LAST via remap to num_gaussians
    key = jnp.where(flat < 0, num_gaussians, flat)
    skey, spos = jax.lax.sort((key, pos), num_keys=1)
    ends = rank_probes(key, num_gaussians)
    masks = jnp.zeros((m,), jnp.int8)
    s, p = 1, 0
    while s < (max_run or 16):
        same = (skey[:-s] == skey[s:]).astype(jnp.int8) << p
        masks = masks + jnp.pad(same, (0, s))
        s, p = s * 2, p + 1
    return InverseMap(spos=spos, ends=ends.astype(jnp.int32), run_masks=masks)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def gather_rows(
    arr: jax.Array,
    tile_idx: jax.Array,
    spos: jax.Array,
    ends: jax.Array,
    run_masks: jax.Array,
    max_run: int = 16,
    n_diff: int = 0,
    pair_budget: int = 0,
    grad_bf16: bool = False,
) -> jax.Array:
    """``arr[max(tile_idx, 0)]`` with a scatter-free, exact backward.

    arr: [N, C]; tile_idx: [T, K] (-1 pad); (spos, ends) from
    :func:`build_inverse_map`.  Output [T, K, C]; padded slots gather
    row 0 (callers mask by validity, and their cotangents are excluded from
    the backward by construction).

    ``n_diff`` (static): only the first n_diff columns carry gradient —
    trailing columns (e.g. stop-gradient rect-culling data riding the same
    gather) are excluded from the backward's permute/suffix/head traffic
    and return zero cotangent.  0 means all columns.

    ``pair_budget`` (static): cap on the number of REFERENCED (tile, slot)
    positions the backward routes.  In the gaussian-sorted order all valid
    references form a prefix (pad slots sort last), so truncating to the
    budget only drops gradient contributions when the scene's true overlap
    count exceeds it — callers surface ``count_grad_dropped`` of the
    binning.  0 means route all T*K positions (always exact).

    ``grad_bf16`` (static): permute the cotangent rows AND run the
    doubling passes in bfloat16 (both are HBM-bandwidth-bound: permutation
    48 -> 28 ms, suffix passes halved at the bench shape); the final head
    values are cast back to f32.  Each gaussian's gradient is then a <=
    max_run-term sum accumulated in bf16 (~0.4% relative rounding).  Off
    by default — parity tests assert f32-exact routing.
    """
    return aligned_gather_rows(arr, jnp.maximum(tile_idx, 0))


def _gather_fwd(arr, tile_idx, spos, ends, run_masks,
                max_run, n_diff, pair_budget, grad_bf16):
    out = aligned_gather_rows(arr, jnp.maximum(tile_idx, 0))
    return out, (spos, ends, run_masks)


def _gather_bwd(max_run, n_diff, pair_budget, grad_bf16, res, g):
    spos, ends, run_masks = res
    starts = jnp.concatenate([jnp.zeros((1,), ends.dtype), ends[:-1]])
    n_ref = ends - starts
    t, k, c = g.shape
    m = t * k
    if pair_budget and pair_budget < m:
        # valid references occupy a prefix of the gaussian-sorted order
        spos = spos[:pair_budget]
        run_masks = run_masks[:pair_budget]
        m = pair_budget
    nd = c if n_diff == 0 else min(n_diff, c)
    g_flat = g.reshape(t * k, c)[:, :nd]
    if grad_bf16:
        g_flat = g_flat.astype(jnp.bfloat16)
    # 1. permute cotangent rows into gaussian-sorted order (one row-gather,
    #    lane-padded for the fast gather path, sliced back for the suffix)
    y = aligned_gather_rows(g_flat, spos)
    if not grad_bf16:
        y = y.astype(jnp.float32)
    # 2. segmented suffix-sum: after ceil(log2(max_run)) doubling passes,
    #    y[i] = sum of g over i's run-suffix.  The run-boundary masks are
    #    PRECOMPUTED bit-planes in the inverse map (iteration-invariant),
    #    applied as multiplies — no per-iteration pred compares or packed
    #    bool layout copies.
    s, p = 1, 0
    while s < max_run:
        mf = ((run_masks[: m - s] >> p) & 1).astype(y.dtype)[:, None]
        y = jnp.concatenate([y[:-s] + y[s:] * mf, y[-s:]], axis=0)
        s, p = s * 2, p + 1
    # 3. each gaussian's total = its run head (masked for unreferenced rows;
    # under a pair budget, also for runs starting past the truncation)
    head = aligned_gather_rows(y, jnp.minimum(starts, m - 1)).astype(jnp.float32)
    grad = jnp.where(((n_ref > 0) & (starts < m))[:, None], head, 0.0)
    if nd < c:
        grad = jnp.pad(grad, ((0, 0), (0, c - nd)))
    return grad, None, None, None, None


gather_rows.defvjp(_gather_fwd, _gather_bwd)


@jax.custom_vjp
def compact_rows(arr: jax.Array, vis: jax.Array, rank_of: jax.Array) -> jax.Array:
    """``arr[vis]`` — compact [N, C] rows to the [V] visible-rank prefix.

    ``vis`` ([V] int32, unique row ids) and ``rank_of`` ([N] int32, the
    inverse permutation: ``rank_of[vis[r]] == r``, >= V for rows outside
    the prefix) come from visible-rank binning.  Because ``vis`` is a
    permutation PREFIX, the backward is scatter-free: one [N]-row gather
    through the inverse permutation (a scatter-add would be pathological
    on TPU; a plain gather VJP would emit one).
    """
    return aligned_gather_rows(arr, vis)


def _compact_fwd(arr, vis, rank_of):
    return aligned_gather_rows(arr, vis), (rank_of,)


def _compact_bwd(res, g):
    (rank_of,) = res
    v = g.shape[0]
    g_pad = jnp.concatenate([g, jnp.zeros((1,) + g.shape[1:], g.dtype)])
    out = aligned_gather_rows(g_pad, jnp.minimum(rank_of, v))
    return out, None, None


compact_rows.defvjp(_compact_fwd, _compact_bwd)
