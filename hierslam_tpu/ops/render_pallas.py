"""Fused Pallas TPU kernels for the tile blend (forward + custom VJP).

The XLA blend (render_xla.blend_tiles) materializes ~10 [P, G] f32
intermediates per chunk in HBM; at 1200x680/K=512 that is ~17GB of traffic
per render.  These kernels keep the whole [P, K] working set in VMEM: one
grid step per tile reads its K gathered Gaussian rows (~90KB), does all
falloff/transmittance math in registers/VMEM, and writes P pixel outputs.

LAYOUT NOTE: inside the kernel the per-tile table lives TRANSPOSED as
[C, K] — attribute rows in sublanes, Gaussians in lanes — so per-attribute
slices are natural lane vectors.  (Column slices of a [K, C] block force
sublane->lane relayouts that cost ~40s of Mosaic compile time EACH.)

Math identical to render_xla.blend_tiles (and therefore to the reference
CUDA kernels, forward.cu:261-538):

* alpha = min(0.99, opa * exp(power)), power>0 and alpha<1/255 skips;
* front-to-back transmittance via exp(cumsum(log1p(-alpha))) — the cumsum
  is a triangular-ones MXU matmul (Mosaic has no native cumsum);
* contribution committed while T stays >= 1e-4 (prefix property);
* median depth at the T=0.5 crossing, default 15.0;
* channel accumulation (rgb/semantic + depth + mass) as ONE MXU matmul.

The backward kernel implements the closed-form suffix-sum gradients the
CUDA backward reconstructs back-to-front (backward.cu:472-899):

  dL/da_i = c_i [ s_i Tb_i - (S_i + gT_final * T_final) / (1 - a_i) ]

with s_i = gacc . f_i, S_i the suffix sum of s_j w_j, then chain rules to
opacity / conic / screen mean / depth.  Cotangents leave the kernel in the
per-(tile, slot) table layout; per-Gaussian reduction happens through the
scatter-free inverse map (ops/gather_vjp.py).

External table column layout (matching ops/rasterize.py): [xy(2), conic(3),
opa(1), depth(1), features(F)].
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


def _cumsum_lanes(x):
    """Inclusive cumsum along lanes as a triangular MXU matmul."""
    k = x.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    tri = (rows <= cols).astype(x.dtype)
    return jnp.dot(x, tri, preferred_element_type=jnp.float32)


def _forward_core(tab, ok, tile_id, tile_shape, grid_x):
    """Shared [P, K] forward math.  tab: [C, K] f32; ok: [K] bool (as [1,K])."""
    th, tw = tile_shape
    P = th * tw
    ox = (tile_id % grid_x) * tw
    oy = (tile_id // grid_x) * th
    lin = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (ox + lin % tw).astype(jnp.float32)            # [P, 1]
    py = (oy + lin // tw).astype(jnp.float32)

    xy_x = tab[0:1]    # [1, K]
    xy_y = tab[1:2]
    c_a = tab[2:3]
    c_b = tab[3:4]
    c_c = tab[4:5]
    opa = tab[5:6]
    dx = xy_x - px                                       # [P, K]
    dy = xy_y - py
    power = -0.5 * (c_a * dx * dx + c_c * dy * dy) - c_b * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, opa * jnp.exp(power))
    contrib = (power <= 0.0) & (alpha >= ALPHA_MIN) & ok
    a = jnp.where(contrib, alpha, 0.0)
    logu = jnp.log1p(-a)
    cs = _cumsum_lanes(logu)
    Ta = jnp.exp(cs)          # T after each gaussian
    Tb = jnp.exp(cs - logu)   # T before (exclusive)
    committed = Ta >= T_DONE
    w = a * Tb * committed                               # [P, K]
    return dx, dy, power, alpha, contrib, a, Ta, Tb, committed, w


def _feats_t(tab):
    """[F+2, K]: feature rows + depth row + ones row."""
    dep = tab[6:7]
    return jnp.concatenate([tab[7:], dep, jnp.ones_like(dep)], axis=0)


def _fwd_kernel(tab_ref, ok_ref, acc_ref, ft_ref, med_ref, *, tile_shape,
                grid_x, tile_batch):
    # tile_batch tiles per grid step amortizes per-step overhead
    for j in range(tile_batch):
        tab = tab_ref[j]                  # [C, K]
        ok = ok_ref[j, 0:1] != 0          # [1, K]
        tile_id = pl.program_id(0) * tile_batch + j
        (dx, dy, power, alpha, contrib, a, Ta, Tb, committed, w) = _forward_core(
            tab, ok, tile_id, tile_shape, grid_x
        )
        feats = _feats_t(tab)             # [F+2, K]
        acc_ref[j] = jax.lax.dot_general(
            w, feats, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ft_ref[j, 0] = jnp.min(jnp.where(committed, Ta, 1.0), axis=-1)
        dep = tab[6:7]
        crossing = contrib & committed & (Tb > 0.5) & (Ta < 0.5)
        med_ref[j, 0] = jnp.where(
            jnp.any(crossing, -1),
            jnp.sum(jnp.where(crossing, dep, 0.0), -1),
            MEDIAN_DEFAULT,
        )


def _bwd_kernel(tab_ref, ok_ref, gacc_ref, gft_ref, gmed_ref, dtab_ref, *,
                tile_shape, grid_x, tile_batch):
  for j in range(tile_batch):
    tab = tab_ref[j]                  # [C, K]
    ok = ok_ref[j, 0:1] != 0
    tile_id = pl.program_id(0) * tile_batch + j
    gacc = gacc_ref[j]                # [P, F+2]
    gft = gft_ref[j]                  # [P, 1]
    gmed = gmed_ref[j]                # [P, 1]
    (dx, dy, power, alpha, contrib, a, Ta, Tb, committed, w) = _forward_core(
        tab, ok, tile_id, tile_shape, grid_x
    )
    feats = _feats_t(tab)             # [F+2, K]
    # s_i = gacc . f_i ; suffix sums S_i = sum_{j>i} s_j w_j
    s = jax.lax.dot_general(
        gacc, feats, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                  # [P, K]
    sw = s * w
    S = jnp.sum(sw, axis=-1, keepdims=True) - _cumsum_lanes(sw)
    u = 1.0 - a
    T_final = jnp.min(jnp.where(committed, Ta, 1.0), axis=-1, keepdims=True)
    da = committed * contrib * (s * Tb - (S + gft * T_final) / u)
    # alpha = min(0.99, opa e^p): the clamp kills the gradient
    live = (alpha < ALPHA_MAX) & contrib
    dopa_pix = jnp.where(live, jnp.exp(power) * da, 0.0)     # [P, K]
    dpow = jnp.where(live, alpha * da, 0.0)

    def colsum(x):  # [P, K] -> [1, K]
        return jnp.sum(x, axis=0, keepdims=True)

    c_a = tab[2:3]
    c_b = tab[3:4]
    d_x = colsum(dpow * (-(c_a * dx + c_b * dy)))
    c_c = tab[4:5]
    d_y = colsum(dpow * (-(c_c * dy + c_b * dx)))
    d_ca = colsum(-0.5 * dx * dx * dpow)
    d_cb = colsum(-dx * dy * dpow)
    d_cc = colsum(-0.5 * dy * dy * dpow)
    d_opa = colsum(dopa_pix)

    # dfeats_t[ch, k] = sum_p gacc[p, ch] w[p, k]
    dfeats = jax.lax.dot_general(
        gacc, w, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                  # [F+2, K]
    n_feat = tab.shape[0] - 7
    crossing = contrib & committed & (Tb > 0.5) & (Ta < 0.5)
    d_dep = dfeats[n_feat : n_feat + 1] + colsum(crossing * gmed)

    dtab_ref[j] = jnp.concatenate(
        [d_x, d_y, d_ca, d_cb, d_cc, d_opa, d_dep, dfeats[:n_feat]], axis=0
    )


def _tb_fwd(k):
    # tiles per forward grid step: amortize per-step overhead while the
    # ~10 [P,K] f32 temps stay under the 16MB VMEM cap
    return max(1, min(8, 4096 // k))


def _tb_bwd(k):
    # backward holds ~15 [P,K] f32 temps (15MB at K=1024); single-tile
    # steps above K=512, batched below
    return 4 if k <= 512 else 1


def _pad_tiles(x, t_pad, fill=0.0):
    pads = [(0, t_pad - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pads, constant_values=fill)


def _run_fwd(table, ok, grid, tile_shape, interpret):
    T, K, C = table.shape
    n_feat = C - 7
    th, tw = tile_shape
    P = th * tw
    grid_y, grid_x = grid
    tb = _tb_fwd(K)
    nsteps = (T + tb - 1) // tb
    t_pad = nsteps * tb
    tab_t = _pad_tiles(jnp.swapaxes(table, 1, 2), t_pad)  # [Tp, C, K]
    okp = _pad_tiles(ok.astype(jnp.int32)[:, None, :], t_pad)
    kern = functools.partial(
        _fwd_kernel, tile_shape=tile_shape, grid_x=grid_x, tile_batch=tb
    )
    acc, ft, med = pl.pallas_call(
        kern,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((tb, C, K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1, K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, P, n_feat + 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1, P), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, P, n_feat + 2), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, 1, P), jnp.float32),
        ],
        interpret=interpret,
    )(tab_t, okp)
    return acc[:T], ft[:T, 0], med[:T, 0]


def _run_bwd(table, ok, gacc, gft, gmed, grid, tile_shape, interpret):
    T, K, C = table.shape
    n_feat = C - 7
    th, tw = tile_shape
    P = th * tw
    grid_y, grid_x = grid
    tb = _tb_bwd(K)
    nsteps = (T + tb - 1) // tb
    t_pad = nsteps * tb
    tab_t = _pad_tiles(jnp.swapaxes(table, 1, 2), t_pad)
    okp = _pad_tiles(ok.astype(jnp.int32)[:, None, :], t_pad)
    kern = functools.partial(
        _bwd_kernel, tile_shape=tile_shape, grid_x=grid_x, tile_batch=tb
    )
    dtab_t = pl.pallas_call(
        kern,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((tb, C, K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1, K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, P, n_feat + 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, P, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, P, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, C, K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((t_pad, C, K), jnp.float32)],
        interpret=interpret,
    )(tab_t, okp, _pad_tiles(gacc, t_pad),
      _pad_tiles(gft[:, :, None], t_pad), _pad_tiles(gmed[:, :, None], t_pad))[0]
    return jnp.swapaxes(dtab_t[:T], 1, 2)


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
