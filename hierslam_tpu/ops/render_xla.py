"""Differentiable tile-parallel alpha compositing (pure XLA).

TPU-native re-formulation of ``renderCUDA`` / ``renderCUDA_SEM``
(cuda_rasterizer/forward.cu:261-538).  Instead of one thread per pixel
walking a shared-memory batch, each tile composites a [P_pixels, G_chunk]
block at a time:

* the Gaussian->pixel falloff ``alpha`` is a [P, G] VPU block;
* front-to-back transmittance is a cumulative product along the Gaussian
  axis (carried across chunks), so per-Gaussian blend weights
  ``w = alpha * T_before`` come out in closed form;
* all channel accumulation (RGB + depth + opacity-mass + semantic) is ONE
  matmul ``w @ features`` on the MXU.

The blend consumes PRE-GATHERED per-tile arrays ([T, K, ...]) — the gather
happens once per render through a scatter-free custom-VJP
(hierslam_tpu.ops.gather_vjp), because XLA scatter (the default gather
backward) is pathologically slow on TPU.

Early-termination semantics match the CUDA kernel exactly:
``alpha = min(0.99, opa*exp(power))`` with the ``power > 0`` and
``alpha < 1/255`` skips (forward.cu:346-356), contribution committed only
while the running transmittance stays >= 1e-4 (forward.cu:357-362), median
depth = view depth of the Gaussian where T crosses 0.5, default 15.0
(forward.cu:370-376).

Because transmittance is monotone decreasing, "done" (T < 1e-4) is a prefix
property: a Gaussian is committed iff its own post-blend transmittance is
>= 1e-4, which vectorizes with no sequential flag.

Gradients come from JAX autodiff through the (rematerialized) chunk scan —
numerically the same recurrence the hand-written CUDA backward
(cuda_rasterizer/backward.cu:472-899) reconstructs, including the discrete
routing of the median-depth gradient (backward.cu:623-626) via the
``jnp.where`` selections.  Note the CUDA semantic backward reads an
uninitialized buffer for the alpha-path contribution of the semantic loss
(rasterizer_impl.cu:673-674, backward.cu:834); autodiff here yields the
*correct* gradient instead.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_DONE = 1e-4
MEDIAN_DEFAULT = 15.0


def _blend_tile_batch(
    g_xy: jax.Array,      # [B, K, 2]
    g_con: jax.Array,     # [B, K, 3]
    g_opa: jax.Array,     # [B, K] (0 where slot invalid)
    g_dep: jax.Array,     # [B, K]
    g_feat: jax.Array,    # [B, K, C] blend features (last two cols: depth, ones)
    g_ok: jax.Array,      # [B, K] slot validity
    tile_id_b: jax.Array,  # [B] int32
    *,
    tile_shape: Tuple[int, int],
    grid_x: int,
    chunk: int,
):
    th, tw = tile_shape
    P = th * tw
    B, K = g_opa.shape
    C = g_feat.shape[-1]

    ox = (tile_id_b % grid_x) * tw
    oy = (tile_id_b // grid_x) * th
    lin = jnp.arange(P, dtype=jnp.int32)
    px = (ox[:, None] + lin[None, :] % tw).astype(jnp.float32)  # [B, P]
    py = (oy[:, None] + lin[None, :] // tw).astype(jnp.float32)

    n_chunks = (K + chunk - 1) // chunk

    def chunk_step(carry, c):
        prod_T, final_T, med, acc = carry
        lo = c * chunk
        cxy = jax.lax.dynamic_slice_in_dim(g_xy, lo, chunk, 1)
        ccon = jax.lax.dynamic_slice_in_dim(g_con, lo, chunk, 1)
        copa = jax.lax.dynamic_slice_in_dim(g_opa, lo, chunk, 1)
        cdep = jax.lax.dynamic_slice_in_dim(g_dep, lo, chunk, 1)
        cfeat = jax.lax.dynamic_slice_in_dim(g_feat, lo, chunk, 1)
        cvalid = jax.lax.dynamic_slice_in_dim(g_ok, lo, chunk, 1)

        dx = cxy[:, None, :, 0] - px[:, :, None]     # [B, P, G]
        dy = cxy[:, None, :, 1] - py[:, :, None]
        a_, b_, c_ = (ccon[:, None, :, 0], ccon[:, None, :, 1], ccon[:, None, :, 2])
        power = -0.5 * (a_ * dx * dx + c_ * dy * dy) - b_ * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, copa[:, None, :] * jnp.exp(power))
        contrib = (power <= 0.0) & (alpha >= ALPHA_MIN) & cvalid[:, None, :]
        a_eff = jnp.where(contrib, alpha, 0.0)

        cp = jnp.cumprod(1.0 - a_eff, axis=-1)
        R = prod_T[:, :, None] * cp                              # T after each gaussian
        T_before = jnp.concatenate([prod_T[:, :, None], R[:, :, :-1]], axis=-1)
        committed = R >= T_DONE
        w = a_eff * T_before * committed                          # [B, P, G]

        acc = acc + jnp.einsum("bpg,bgc->bpc", w, cfeat, preferred_element_type=jnp.float32)

        crossing = contrib & committed & (T_before > 0.5) & (R < 0.5)
        med = jnp.where(
            jnp.any(crossing, -1), jnp.sum(jnp.where(crossing, cdep[:, None, :], 0.0), -1), med
        )
        final_T = jnp.minimum(final_T, jnp.min(jnp.where(committed, R, jnp.inf), -1))
        prod_T = R[:, :, -1]
        return (prod_T, final_T, med, acc), None

    init = (
        jnp.ones((B, P), jnp.float32),
        jnp.ones((B, P), jnp.float32),
        jnp.full((B, P), MEDIAN_DEFAULT, jnp.float32),
        jnp.zeros((B, P, C), jnp.float32),
    )
    (prod_T, final_T, med, acc), _ = jax.lax.scan(
        chunk_step, init, jnp.arange(n_chunks, dtype=jnp.int32)
    )
    return acc, final_T, med


def blend_tiles(
    g_xy: jax.Array,      # [T, K, 2]
    g_conic: jax.Array,   # [T, K, 3]
    g_opacity: jax.Array,  # [T, K]
    g_depth: jax.Array,   # [T, K]
    g_features: jax.Array,  # [T, K, F] (rgb [+ semantic])
    g_valid: jax.Array,   # [T, K]
    *,
    image_shape: Tuple[int, int],
    tile_shape: Tuple[int, int],
    grid: Tuple[int, int],
    chunk: int = 256,
    tile_batch: int = 64,
):
    """Composite all tiles from pre-gathered per-tile arrays.

    Returns per-pixel ``(channels [F+2, H, W], final_T, median)`` — the F
    feature channels, then alpha-blended depth, then accumulated weight
    mass (``out_mask = sum alpha*T``, forward.cu:368,396).
    """
    H, W = image_shape
    th, tw = tile_shape
    grid_y, grid_x = grid
    T_tiles = grid_y * grid_x
    F = g_features.shape[-1]

    # append depth + ones columns so all channel accumulation is one matmul
    feat = jnp.concatenate(
        [g_features, g_depth[..., None], jnp.ones_like(g_depth[..., None])], axis=-1
    )

    nb = (T_tiles + tile_batch - 1) // tile_batch
    T_pad = nb * tile_batch

    def pad_t(x, fill=0):
        pads = [(0, T_pad - T_tiles)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pads, constant_values=fill)

    g_xy_p, g_con_p, g_opa_p = pad_t(g_xy), pad_t(g_conic), pad_t(g_opacity)
    g_dep_p, feat_p, ok_p = pad_t(g_depth), pad_t(feat), pad_t(g_valid, False)
    tid_p = jnp.arange(T_pad, dtype=jnp.int32)

    body = functools.partial(
        _blend_tile_batch, tile_shape=tile_shape, grid_x=grid_x, chunk=chunk
    )
    body = jax.checkpoint(body)

    def scan_step(_, inp):
        return None, body(*inp)

    _, (acc, final_T, med) = jax.lax.scan(
        scan_step,
        None,
        tuple(
            x.reshape((nb, tile_batch) + x.shape[1:])
            for x in (g_xy_p, g_con_p, g_opa_p, g_dep_p, feat_p, ok_p, tid_p)
        ),
    )
    # [nb, B, P, C] -> [C, H, W]
    C = F + 2
    acc = acc.reshape(T_pad, th, tw, C)[:T_tiles]
    acc = acc.reshape(grid_y, grid_x, th, tw, C).transpose(4, 0, 2, 1, 3)
    acc = acc.reshape(C, grid_y * th, grid_x * tw)[:, :H, :W]

    def to_img(x):
        x = x.reshape(T_pad, th, tw)[:T_tiles]
        x = x.reshape(grid_y, grid_x, th, tw).transpose(0, 2, 1, 3)
        return x.reshape(grid_y * th, grid_x * tw)[:H, :W]

    return acc, to_img(final_T), to_img(med)


def rect_recheck_mask(
    tile_idx: jax.Array,   # [T, K]
    rect_min: jax.Array,   # [N, 2] current-pose tile rects
    rect_max: jax.Array,
    valid: jax.Array,      # [N]
    grid: Tuple[int, int],
) -> jax.Array:
    """Per-slot mask re-applying the CURRENT pose's tile-rect culling to
    (possibly stale) cached tile lists, preserving the reference's
    rect-culling semantics under amortized binning."""
    grid_y, grid_x = grid
    t_ids = jnp.arange(tile_idx.shape[0], dtype=jnp.int32)
    tx = (t_ids % grid_x)[:, None]
    ty = (t_ids // grid_x)[:, None]
    safe = jnp.maximum(tile_idx, 0)
    rmin = rect_min[safe]
    rmax = rect_max[safe]
    ok = (
        (tile_idx >= 0)
        & valid[safe]
        & (tx >= rmin[..., 0]) & (tx < rmax[..., 0])
        & (ty >= rmin[..., 1]) & (ty < rmax[..., 1])
    )
    return ok
