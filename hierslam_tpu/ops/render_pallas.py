"""Fused Pallas TPU kernels for the tile blend (forward + custom VJP).

The XLA blend (render_xla.blend_tiles) materializes ~10 [P, G] f32
intermediates per chunk in HBM; at 1200x680/K=512 that is ~17GB of traffic
per render.  These kernels keep the whole [P, K] working set in VMEM: one
grid step per tile reads its K gathered Gaussian rows (~90KB), does all
falloff/transmittance math in registers/VMEM, and writes P pixel outputs.

Math identical to render_xla.blend_tiles (and therefore to the reference
CUDA kernels, forward.cu:261-538):

* alpha = min(0.99, opa * exp(power)), power>0 and alpha<1/255 skips;
* front-to-back transmittance via exp(cumsum(log1p(-alpha)));
* contribution committed while T stays >= 1e-4 (prefix property);
* median depth at the T=0.5 crossing, default 15.0;
* channel accumulation (rgb/semantic + depth + mass) as ONE [P,K]@[K,C]
  MXU matmul.

The backward kernel implements the closed-form suffix-sum gradients the
CUDA backward reconstructs back-to-front (backward.cu:472-899):

  dL/da_i = c_i [ s_i Tb_i - (S_i + gT_final * T_final) / (1 - a_i) ]

with s_i = gacc . f_i, S_i the suffix sum of s_j w_j, then chain rules to
opacity / conic / screen mean / depth.  Cotangents leave the kernel in the
per-(tile, slot) table layout; per-Gaussian reduction happens through the
scatter-free inverse map (ops/gather_vjp.py).

Table column layout (matching ops/rasterize.py): [xy(2), conic(3), opa(1),
depth(1), features(F)].
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_DONE = 1e-4
MEDIAN_DEFAULT = 15.0


def _pixel_grid(tile_id, tile_shape, grid_x):
    th, tw = tile_shape
    P = th * tw
    ox = (tile_id % grid_x) * tw
    oy = (tile_id // grid_x) * th
    lin = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)[:, 0]
    px = (ox + lin % tw).astype(jnp.float32)[:, None]   # [P, 1]
    py = (oy + lin // tw).astype(jnp.float32)[:, None]
    return px, py


def _cumsum_last(x):
    """Inclusive cumsum along the last axis as a triangular MXU matmul
    (Mosaic has no native cumsum; [P,K] @ [K,K] upper-triangular ones)."""
    k = x.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    tri = (rows <= cols).astype(x.dtype)
    return jnp.dot(x, tri, preferred_element_type=jnp.float32)


def _forward_core(table, ok, tile_id, tile_shape, grid_x, n_feat):
    """Shared [P,K] forward math.  table: [K, 7+F] f32; ok: [K] bool."""
    px, py = _pixel_grid(tile_id, tile_shape, grid_x)
    xy_x = table[:, 0][None, :]
    xy_y = table[:, 1][None, :]
    c_a = table[:, 2][None, :]
    c_b = table[:, 3][None, :]
    c_c = table[:, 4][None, :]
    opa = table[:, 5][None, :]
    dx = xy_x - px                                   # [P, K]
    dy = xy_y - py
    power = -0.5 * (c_a * dx * dx + c_c * dy * dy) - c_b * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, opa * jnp.exp(power))
    contrib = (power <= 0.0) & (alpha >= ALPHA_MIN) & ok[None, :]
    a = jnp.where(contrib, alpha, 0.0)
    logu = jnp.log1p(-a)
    cs = _cumsum_last(logu)
    Ta = jnp.exp(cs)          # T after each gaussian
    Tb = jnp.exp(cs - logu)   # T before (exclusive)
    committed = Ta >= T_DONE
    w = a * Tb * committed                           # [P, K]
    return dx, dy, power, alpha, contrib, a, Ta, Tb, committed, w


def _fwd_kernel(table_ref, ok_ref, acc_ref, ft_ref, med_ref, *,
                tile_shape, grid_x, n_feat):
    table = table_ref[0]
    ok = ok_ref[0, 0] != 0
    tile_id = pl.program_id(0)
    dep = table[:, 6]
    (dx, dy, power, alpha, contrib, a, Ta, Tb, committed, w) = _forward_core(
        table, ok, tile_id, tile_shape, grid_x, n_feat
    )
    feats = jnp.concatenate(
        [table[:, 7:], dep[:, None], jnp.ones_like(dep[:, None])], axis=1
    )  # [K, F+2]
    acc_ref[0] = jnp.dot(w, feats, preferred_element_type=jnp.float32)
    ft_ref[0, 0] = jnp.min(jnp.where(committed, Ta, 1.0), axis=-1)
    crossing = contrib & committed & (Tb > 0.5) & (Ta < 0.5)
    med_ref[0, 0] = jnp.where(
        jnp.any(crossing, -1),
        jnp.sum(jnp.where(crossing, dep[None, :], 0.0), -1),
        MEDIAN_DEFAULT,
    )


def _bwd_kernel(table_ref, ok_ref, gacc_ref, gft_ref, gmed_ref,
                dtab_ref, *, tile_shape, grid_x, n_feat):
    table = table_ref[0]
    ok = ok_ref[0, 0] != 0
    tile_id = pl.program_id(0)
    gacc = gacc_ref[0]        # [P, F+2]
    gft = gft_ref[0, 0]       # [P]
    gmed = gmed_ref[0, 0]     # [P]
    dep = table[:, 6]
    (dx, dy, power, alpha, contrib, a, Ta, Tb, committed, w) = _forward_core(
        table, ok, tile_id, tile_shape, grid_x, n_feat
    )
    feats = jnp.concatenate(
        [table[:, 7:], dep[:, None], jnp.ones_like(dep[:, None])], axis=1
    )
    # s_i = gacc . f_i ; suffix sums S_i = sum_{j>i} s_j w_j
    s = jnp.dot(gacc, feats.T, preferred_element_type=jnp.float32)  # [P, K]
    sw = s * w
    S = jnp.sum(sw, axis=-1, keepdims=True) - _cumsum_last(sw)
    u = 1.0 - a
    T_final = jnp.min(jnp.where(committed, Ta, 1.0), axis=-1, keepdims=True)
    da = committed * contrib * (
        s * Tb - (S + gft[:, None] * T_final) / u
    )
    # alpha = min(0.99, opa e^p): clamp kills the gradient (forward.cu:354)
    live = (alpha < ALPHA_MAX) & contrib
    dopa_pix = jnp.where(live, jnp.exp(power) * da, 0.0)     # [P, K]
    dpow = jnp.where(live, alpha * da, 0.0)

    ones_p = jnp.ones((dpow.shape[0], 1), jnp.float32)

    def colsum(x):  # [P, K] -> [K]
        return jnp.dot(x.T, ones_p, preferred_element_type=jnp.float32)[:, 0]

    d_ca = colsum(-0.5 * dx * dx * dpow)
    d_cb = colsum(-dx * dy * dpow)
    d_cc = colsum(-0.5 * dy * dy * dpow)
    ca = table[:, 2][None, :]
    cb = table[:, 3][None, :]
    cc = table[:, 4][None, :]
    d_x = colsum(dpow * (-(ca * dx + cb * dy)))
    d_y = colsum(dpow * (-(cc * dy + cb * dx)))
    d_opa = colsum(dopa_pix)

    dfeats = jnp.dot(w.T, gacc, preferred_element_type=jnp.float32)  # [K, F+2]
    crossing = contrib & committed & (Tb > 0.5) & (Ta < 0.5)
    d_dep = dfeats[:, n_feat] + colsum(crossing * gmed[:, None])

    dtab = jnp.concatenate(
        [
            d_x[:, None], d_y[:, None],
            d_ca[:, None], d_cb[:, None], d_cc[:, None],
            d_opa[:, None], d_dep[:, None],
            dfeats[:, :n_feat],
        ],
        axis=1,
    )
    dtab_ref[0] = dtab


def _run_fwd(table, ok, grid, tile_shape, interpret):
    T, K, C = table.shape
    n_feat = C - 7
    th, tw = tile_shape
    P = th * tw
    grid_y, grid_x = grid
    kern = functools.partial(
        _fwd_kernel, tile_shape=tile_shape, grid_x=grid_x, n_feat=n_feat
    )
    acc, ft, med = pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, K, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, P, n_feat + 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, P, n_feat + 2), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
        ],
        interpret=interpret,
    )(table, ok.astype(jnp.int32)[:, None, :])
    return acc, ft[:, 0], med[:, 0]


def _run_bwd(table, ok, gacc, gft, gmed, grid, tile_shape, interpret):
    T, K, C = table.shape
    n_feat = C - 7
    th, tw = tile_shape
    P = th * tw
    grid_y, grid_x = grid
    kern = functools.partial(
        _bwd_kernel, tile_shape=tile_shape, grid_x=grid_x, n_feat=n_feat
    )
    return pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, K, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, n_feat + 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, K, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((T, K, C), jnp.float32)],
        interpret=interpret,
    )(table, ok.astype(jnp.int32)[:, None, :], gacc,
      gft[:, None, :], gmed[:, None, :])[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def blend_tiles_pallas(table, ok, grid, tile_shape, interpret=False):
    """Fused tile blend.  table [T,K,7+F], ok [T,K] bool ->
    (acc [T,P,F+2], final_T [T,P], med [T,P])."""
    return tuple(_run_fwd(table, ok, grid, tile_shape, interpret))


def _blend_fwd(table, ok, grid, tile_shape, interpret):
    out = _run_fwd(table, ok, grid, tile_shape, interpret)
    return tuple(out), (table, ok)


def _blend_bwd(grid, tile_shape, interpret, res, cots):
    table, ok = res
    gacc, gft, gmed = cots
    dtab = _run_bwd(table, ok, gacc, gft, gmed, grid, tile_shape, interpret)
    return dtab, None


blend_tiles_pallas.defvjp(_blend_fwd, _blend_bwd)


def render_tiles_pallas(
    table: jax.Array,    # [T, K, 7+F]
    slot_ok: jax.Array,  # [T, K]
    *,
    image_shape: Tuple[int, int],
    tile_shape: Tuple[int, int],
    grid: Tuple[int, int],
    interpret: bool = False,
):
    """blend_tiles-compatible wrapper: returns (channels [F+2,H,W],
    final_T [H,W], median [H,W])."""
    H, W = image_shape
    th, tw = tile_shape
    grid_y, grid_x = grid
    acc, ft, med = blend_tiles_pallas(table, slot_ok, grid, tile_shape, interpret)
    C = acc.shape[-1]
    acc = acc.reshape(grid_y, grid_x, th, tw, C).transpose(4, 0, 2, 1, 3)
    acc = acc.reshape(C, grid_y * th, grid_x * tw)[:, :H, :W]

    def to_img(x):
        x = x.reshape(grid_y, grid_x, th, tw).transpose(0, 2, 1, 3)
        return x.reshape(grid_y * th, grid_x * tw)[:H, :W]

    return acc, to_img(ft), to_img(med)
