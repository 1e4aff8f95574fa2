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
    idx_b: jax.Array,     # [B, K] int32, -1 padded
    tile_id_b: jax.Array,  # [B] int32
    xy: jax.Array,        # [N, 2]
    conic: jax.Array,     # [N, 3]
    opacity: jax.Array,   # [N]
    depth: jax.Array,     # [N]
    feat: jax.Array,      # [N, C] blend features (last two cols: depth, ones)
    *,
    tile_shape: Tuple[int, int],
    grid_x: int,
    chunk: int,
):
    th, tw = tile_shape
    P = th * tw
    B, K = idx_b.shape
    C = feat.shape[1]

    safe = jnp.maximum(idx_b, 0)
    slot_valid = idx_b >= 0
    g_xy = xy[safe]                                  # [B, K, 2]
    g_con = conic[safe]                              # [B, K, 3]
    g_opa = jnp.where(slot_valid, opacity[safe], 0.0)  # [B, K]
    g_dep = depth[safe]                              # [B, K]
    g_feat = feat[safe]                              # [B, K, C]

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
        cvalid = jax.lax.dynamic_slice_in_dim(slot_valid, lo, chunk, 1)

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


def render_tiles(
    tile_idx: jax.Array,   # [T, K]
    xy: jax.Array,
    conic: jax.Array,
    opacity: jax.Array,
    depth: jax.Array,
    features: jax.Array,   # [N, F] (rgb [+ semantic])
    *,
    image_shape: Tuple[int, int],
    tile_shape: Tuple[int, int],
    grid: Tuple[int, int],
    chunk: int = 256,
    tile_batch: int = 64,
):
    """Composite all tiles; returns per-pixel (channels, final_T, median).

    Output ``channels`` has layout [F + 2, H, W]: the F feature channels,
    then alpha-blended depth, then accumulated weight mass
    (``out_mask = sum alpha*T``, forward.cu:368,396).
    """
    H, W = image_shape
    th, tw = tile_shape
    grid_y, grid_x = grid
    T_tiles = grid_y * grid_x
    F = features.shape[1]

    feat = jnp.concatenate(
        [features, depth[:, None], jnp.ones_like(depth[:, None])], axis=1
    )  # [N, F+2]

    nb = (T_tiles + tile_batch - 1) // tile_batch
    T_pad = nb * tile_batch
    idx_p = jnp.pad(tile_idx, ((0, T_pad - T_tiles), (0, 0)), constant_values=-1)
    tid_p = jnp.arange(T_pad, dtype=jnp.int32)

    body = functools.partial(
        _blend_tile_batch, tile_shape=tile_shape, grid_x=grid_x, chunk=chunk
    )
    body = jax.checkpoint(body)

    def scan_step(_, inp):
        ib, tb = inp
        return None, body(ib, tb, xy, conic, opacity, depth, feat)

    _, (acc, final_T, med) = jax.lax.scan(
        scan_step,
        None,
        (idx_p.reshape(nb, tile_batch, -1), tid_p.reshape(nb, tile_batch)),
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
