"""Scatter-free gradient routing for per-tile gathers.

The VJP of a gather is a scatter-add; XLA scatters on TPU are catastrophic
(~100ms+ per call, minutes to compile).  This module replaces them with the
CUDA pipeline's *inverse* view built once per binning: for every Gaussian,
the list of flat (tile, slot) positions that reference it.  The gather's
backward then becomes per-Gaussian GATHERS of the cotangent rows plus a
small dense reduction — no scatter anywhere.

``build_inverse_map`` itself is scatter-free too: it sorts the flattened
(gaussian_id, position) pairs (jax.lax.sort — fast on TPU) and reads runs
out with searchsorted + strided gathers.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class InverseMap(NamedTuple):
    slots: jax.Array      # [N, R] flat positions into [T*K] (T*K = invalid pad)
    n_ref: jax.Array      # [N] number of referencing (tile, slot) pairs
    n_dropped: jax.Array  # [] pairs beyond R per-gaussian capacity


def build_inverse_map(tile_idx: jax.Array, num_gaussians: int, max_refs: int) -> InverseMap:
    """Invert [T, K] per-tile gaussian-index lists (-1 padded).

    Returns, for each gaussian, up to ``max_refs`` flat positions
    ``t * K + k`` where it appears.
    """
    flat = tile_idx.reshape(-1)
    m = flat.shape[0]
    pos = jnp.arange(m, dtype=jnp.int32)
    # sort pairs by gaussian id; -1 pads sort first -> remap to num_gaussians
    key = jnp.where(flat < 0, num_gaussians, flat)
    skey, spos = jax.lax.sort((key, pos), num_keys=1)
    # start of each gaussian's run
    starts = jnp.searchsorted(skey, jnp.arange(num_gaussians, dtype=jnp.int32))
    ends = jnp.searchsorted(
        skey, jnp.arange(num_gaussians, dtype=jnp.int32), side="right"
    )
    n_ref = (ends - starts).astype(jnp.int32)
    r = jnp.arange(max_refs, dtype=jnp.int32)
    take = starts[:, None] + r[None, :]            # [N, R]
    ok = r[None, :] < n_ref[:, None]
    take = jnp.where(ok & (take < m), take, m)
    spos_pad = jnp.concatenate([spos, jnp.full((1,), m, jnp.int32)])
    slots = jnp.where(ok, spos_pad[jnp.minimum(take, m)], m)
    n_dropped = jnp.sum(jnp.maximum(n_ref - max_refs, 0))
    return InverseMap(slots=slots, n_ref=n_ref, n_dropped=n_dropped)


@partial(jax.custom_vjp, nondiff_argnums=())
def gather_rows(arr: jax.Array, tile_idx: jax.Array, inv_slots: jax.Array) -> jax.Array:
    """``arr[max(tile_idx, 0)]`` with a scatter-free backward.

    arr: [N, C]; tile_idx: [T, K] (-1 pad); inv_slots: [N, R] flat positions
    (from :func:`build_inverse_map`).  Output [T, K, C]; padded slots gather
    row 0 (callers mask by validity).
    """
    return arr[jnp.maximum(tile_idx, 0)]


def _gather_fwd(arr, tile_idx, inv_slots):
    return gather_rows(arr, tile_idx, inv_slots), inv_slots


def _gather_bwd(inv_slots, g):
    t, k, c = g.shape
    g_flat = jnp.concatenate(
        [g.reshape(t * k, c), jnp.zeros((1, c), g.dtype)], axis=0
    )
    # per-gaussian: sum of cotangent rows at its referencing slots
    grad = jnp.sum(g_flat[inv_slots], axis=1)
    return grad, None, None


gather_rows.defvjp(_gather_fwd, _gather_bwd)
