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

EARLY-EXIT NOTE (measured and rejected): a variant gating each chunk body
under ``pl.when`` on the tile's true overlap count plus a carried
"any pixel still transmits" scalar (the CUDA kernel's per-pixel T<1e-4
stop, forward.cu:358) was bit-identical but 2.6x SLOWER end-to-end
(N=2M mapping 325 -> 842 ms/iter; blend micro fwd+bwd 140 -> 336 ms):
the [tb, C, K] table DMA happens regardless of predication, the blend
compute it can skip is only ~35 ms/iter, and the per-chunk scalar
predicates broke Mosaic's software pipelining.  The kernels therefore run
the dense unrolled chunk loop; ``counts`` is accepted in the public API
(callers already plumb it) for host-side levers like per-population K
classes, not in-kernel skipping.
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


def _chunk_core(tab_c, ok_c, logT, px, py):
    """Per-chunk blend math.  tab_c: [C, Q]; ok_c: [1, Q]; logT: [P, 1]
    log-transmittance entering the chunk.  Returns the per-chunk values
    plus the updated logT."""
    xy_x = tab_c[0:1]    # [1, Q]
    xy_y = tab_c[1:2]
    c_a = tab_c[2:3]
    c_b = tab_c[3:4]
    c_c = tab_c[4:5]
    opa = tab_c[5:6]
    dx = xy_x - px                                       # [P, Q]
    dy = xy_y - py
    power = -0.5 * (c_a * dx * dx + c_c * dy * dy) - c_b * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, opa * jnp.exp(power))
    contrib = (power <= 0.0) & (alpha >= ALPHA_MIN) & ok_c
    a = jnp.where(contrib, alpha, 0.0)
    logu = jnp.log1p(-a)
    cs = _cumsum_lanes(logu)
    Ta = jnp.exp(logT + cs)          # T after each gaussian
    Tb = jnp.exp(logT + cs - logu)   # T before (exclusive)
    committed = Ta >= T_DONE
    w = a * Tb * committed                               # [P, Q]
    logT_next = logT + cs[:, -1:]
    return dx, dy, power, alpha, contrib, a, Ta, Tb, committed, w, logT_next


def _feats_t(tab_c):
    """[F+2, Q]: feature rows + depth row + ones row."""
    dep = tab_c[6:7]
    return jnp.concatenate([tab_c[7:], dep, jnp.ones_like(dep)], axis=0)


def _pixel_grid(tile_id, tile_shape, grid_x):
    th, tw = tile_shape
    P = th * tw
    ox = (tile_id % grid_x) * tw
    oy = (tile_id // grid_x) * th
    lin = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (ox + lin % tw).astype(jnp.float32)            # [P, 1]
    py = (oy + lin // tw).astype(jnp.float32)
    return px, py


def _fwd_kernel(tab_ref, ok_ref, acc_ref, ft_ref, med_ref, *, tile_shape,
                grid_x, tile_batch, chunk):
    # tile_batch tiles per grid step amortizes per-step overhead; the K axis
    # is processed in chunks of `chunk` with carried log-transmittance, so
    # VMEM stays bounded for any K (and the triangular cumsum matmul cost
    # is K*Q instead of K^2 per pixel row).
    K = tab_ref.shape[-1]
    n_ch = (K + chunk - 1) // chunk
    th, tw = tile_shape
    P = th * tw
    for j in range(tile_batch):
        tile_id = pl.program_id(0) * tile_batch + j
        px, py = _pixel_grid(tile_id, tile_shape, grid_x)
        logT = jnp.zeros((P, 1), jnp.float32)
        acc = jnp.zeros((P, tab_ref.shape[1] - 7 + 2), jnp.float32)
        ft = jnp.ones((P,), jnp.float32)
        med_sum = jnp.zeros((P,), jnp.float32)
        med_found = jnp.zeros((P,), jnp.bool_)
        for c in range(n_ch):
            tab = tab_ref[j, :, c * chunk:(c + 1) * chunk]    # [C, Q]
            ok = ok_ref[j, 0:1, c * chunk:(c + 1) * chunk] != 0
            (dx, dy, power, alpha, contrib, a, Ta, Tb, committed, w,
             logT) = _chunk_core(tab, ok, logT, px, py)
            feats = _feats_t(tab)             # [F+2, Q]
            acc = acc + jax.lax.dot_general(
                w, feats, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ft = jnp.minimum(ft, jnp.min(jnp.where(committed, Ta, 1.0), axis=-1))
            dep = tab[6:7]
            crossing = contrib & committed & (Tb > 0.5) & (Ta < 0.5)
            med_sum = med_sum + jnp.sum(jnp.where(crossing, dep, 0.0), -1)
            med_found = med_found | jnp.any(crossing, -1)
        acc_ref[j] = acc
        ft_ref[j, 0] = ft
        med_ref[j, 0] = jnp.where(med_found, med_sum, MEDIAN_DEFAULT)


def _bwd_kernel(tab_ref, ok_ref, gacc_ref, gft_ref, gmed_ref, dtab_ref, *,
                tile_shape, grid_x, tile_batch, chunk):
  K = tab_ref.shape[-1]
  n_ch = (K + chunk - 1) // chunk
  th, tw = tile_shape
  P = th * tw
  for j in range(tile_batch):
    tile_id = pl.program_id(0) * tile_batch + j
    px, py = _pixel_grid(tile_id, tile_shape, grid_x)
    gacc = gacc_ref[j]                # [P, F+2]
    gft = gft_ref[j]                  # [P, 1]
    gmed = gmed_ref[j]                # [P, 1]

    # pass 1 (front-to-back): per-chunk entry log-transmittance + T_final
    logTs = [jnp.zeros((P, 1), jnp.float32)]
    T_final = jnp.ones((P, 1), jnp.float32)
    for c in range(n_ch):
        tab = tab_ref[j, :, c * chunk:(c + 1) * chunk]
        ok = ok_ref[j, 0:1, c * chunk:(c + 1) * chunk] != 0
        (_, _, _, _, _, _, Ta, _, committed, _, logT_next) = _chunk_core(
            tab, ok, logTs[-1], px, py
        )
        T_final = jnp.minimum(
            T_final, jnp.min(jnp.where(committed, Ta, 1.0), axis=-1, keepdims=True)
        )
        logTs.append(logT_next)

    # pass 2 (back-to-front): global suffix sums via the carried S
    S_carry = jnp.zeros((P, 1), jnp.float32)
    for c in reversed(range(n_ch)):
        tab = tab_ref[j, :, c * chunk:(c + 1) * chunk]
        ok = ok_ref[j, 0:1, c * chunk:(c + 1) * chunk] != 0
        (dx, dy, power, alpha, contrib, a, Ta, Tb, committed, w,
         _) = _chunk_core(tab, ok, logTs[c], px, py)
        feats = _feats_t(tab)             # [F+2, Q]
        # s_i = gacc . f_i ; suffix sums S_i = sum_{j>i} s_j w_j (global)
        s = jax.lax.dot_general(
            gacc, feats, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                  # [P, Q]
        sw = s * w
        sw_tot = jnp.sum(sw, axis=-1, keepdims=True)
        S = sw_tot - _cumsum_lanes(sw) + S_carry
        S_carry = S_carry + sw_tot
        u = 1.0 - a
        da = committed * contrib * (s * Tb - (S + gft * T_final) / u)
        # alpha = min(0.99, opa e^p): the clamp kills the gradient
        live = (alpha < ALPHA_MAX) & contrib
        dopa_pix = jnp.where(live, jnp.exp(power) * da, 0.0)     # [P, Q]
        dpow = jnp.where(live, alpha * da, 0.0)

        def colsum(x):  # [P, Q] -> [1, Q]
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

        # dfeats_t[ch, q] = sum_p gacc[p, ch] w[p, q]
        dfeats = jax.lax.dot_general(
            gacc, w, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                  # [F+2, Q]
        n_feat = tab.shape[0] - 7
        crossing = contrib & committed & (Tb > 0.5) & (Ta < 0.5)
        d_dep = dfeats[n_feat : n_feat + 1] + colsum(crossing * gmed)

        dtab_ref[j, :, c * chunk:(c + 1) * chunk] = jnp.concatenate(
            [d_x, d_y, d_ca, d_cb, d_cc, d_opa, d_dep, dfeats[:n_feat]], axis=0
        )


def _tb_fwd(k, q):
    # tiles per forward grid step: the live temps are per-CHUNK ([P, Q]),
    # so the batch is sized by Q, not K; the [C, K] table block itself is
    # small (~300KB at K=2048)
    return max(1, min(8, 2048 // q))


def _tb_bwd(k, q):
    # backward holds ~15 [P, Q] f32 temps per chunk (~4MB at Q=256); the
    # unrolled two-pass structure keeps several alive, so batch conservatively
    return max(1, min(2, 512 // q))


def _pad_tiles(x, t_pad, fill=0.0):
    pads = [(0, t_pad - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pads, constant_values=fill)


def _chunk_q(k, chunk):
    # chunks are the kernel's lane width: keep them full lane-rows (x128) —
    # Mosaic cannot concatenate sub-lane-row vectors with mismatched lane
    # offsets ('result/input offset mismatch on non-concat dimension')
    q = max(128, (min(k, chunk) // 128) * 128)
    # K must divide into equal chunks; fall back to K itself otherwise
    return q if k % q == 0 else k


def _pad_k(table, ok, k_pad):
    """Pad the K (lane) axis to a full-lane multiple: Mosaic cannot
    concatenate sub-lane-row vectors with mismatched lane offsets
    (observed at K<128: 'result/input offset mismatch on non-concat
    dimension').  Padded slots carry ok=0/zero rows -> zero contribution."""
    K = table.shape[1]
    if k_pad == K:
        return table, ok
    return (
        jnp.pad(table, ((0, 0), (0, k_pad - K), (0, 0))),
        jnp.pad(ok, ((0, 0), (0, k_pad - K))),
    )


def _run_fwd(table, ok, grid, tile_shape, interpret, chunk=256):
    T, K, C = table.shape
    k_pad = max(128, -(-K // 128) * 128)
    table, ok = _pad_k(table, ok, k_pad)
    K = k_pad
    n_feat = C - 7
    th, tw = tile_shape
    P = th * tw
    grid_y, grid_x = grid
    q = _chunk_q(K, chunk)
    tb = _tb_fwd(K, q)
    nsteps = (T + tb - 1) // tb
    t_pad = nsteps * tb
    tab_t = _pad_tiles(jnp.swapaxes(table, 1, 2), t_pad)  # [Tp, C, K]
    okp = _pad_tiles(ok.astype(jnp.int32)[:, None, :], t_pad)
    kern = functools.partial(
        _fwd_kernel, tile_shape=tile_shape, grid_x=grid_x, tile_batch=tb,
        chunk=q,
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(tab_t, okp)
    return acc[:T], ft[:T, 0], med[:T, 0]


def _run_bwd(table, ok, gacc, gft, gmed, grid, tile_shape, interpret, chunk=256):
    T, K_in, C = table.shape
    K = max(128, -(-K_in // 128) * 128)
    table, ok = _pad_k(table, ok, K)
    n_feat = C - 7
    th, tw = tile_shape
    P = th * tw
    grid_y, grid_x = grid
    q = _chunk_q(K, chunk)
    tb = _tb_bwd(K, q)
    nsteps = (T + tb - 1) // tb
    t_pad = nsteps * tb
    tab_t = _pad_tiles(jnp.swapaxes(table, 1, 2), t_pad)
    okp = _pad_tiles(ok.astype(jnp.int32)[:, None, :], t_pad)
    kern = functools.partial(
        _bwd_kernel, tile_shape=tile_shape, grid_x=grid_x, tile_batch=tb,
        chunk=q,
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(tab_t, okp, _pad_tiles(gacc, t_pad),
      _pad_tiles(gft[:, :, None], t_pad), _pad_tiles(gmed[:, :, None], t_pad))[0]
    return jnp.swapaxes(dtab_t[:T], 1, 2)[:, :K_in]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def blend_tiles_pallas(table, ok, counts, grid, tile_shape, interpret=False,
                       chunk=256):
    """Fused tile blend.  table [T,K,7+F], ok [T,K] bool, counts [T] int32
    true per-tile overlap counts (unused hint; see EARLY-EXIT NOTE) ->
    (acc [T,P,F+2], final_T [T,P], med [T,P])."""
    del counts
    return tuple(_run_fwd(table, ok, grid, tile_shape, interpret, chunk))


def _blend_fwd(table, ok, counts, grid, tile_shape, interpret, chunk):
    del counts
    out = _run_fwd(table, ok, grid, tile_shape, interpret, chunk)
    return tuple(out), (table, ok)


def _blend_bwd(grid, tile_shape, interpret, chunk, res, cots):
    table, ok = res
    gacc, gft, gmed = cots
    dtab = _run_bwd(table, ok, gacc, gft, gmed, grid, tile_shape, interpret, chunk)
    return dtab, None, None


blend_tiles_pallas.defvjp(_blend_fwd, _blend_bwd)


def render_tiles_pallas(
    table: jax.Array,    # [T, K, 7+F]
    slot_ok: jax.Array,  # [T, K]
    *,
    image_shape: Tuple[int, int],
    tile_shape: Tuple[int, int],
    grid: Tuple[int, int],
    interpret: bool = False,
    chunk: int = 256,
    counts: jax.Array = None,   # [T] true overlap counts (unused hint)
):
    """blend_tiles-compatible wrapper: returns (channels [F+2,H,W],
    final_T [H,W], median [H,W])."""
    H, W = image_shape
    th, tw = tile_shape
    grid_y, grid_x = grid
    acc, ft, med = blend_tiles_pallas(
        table, slot_ok, counts, grid, tile_shape, interpret, chunk
    )
    C = acc.shape[-1]
    acc = acc.reshape(grid_y, grid_x, th, tw, C).transpose(4, 0, 2, 1, 3)
    acc = acc.reshape(C, grid_y * th, grid_x * tw)[:, :H, :W]

    def to_img(x):
        x = x.reshape(grid_y, grid_x, th, tw).transpose(0, 2, 1, 3)
        return x.reshape(grid_y * th, grid_x * tw)[:H, :W]

    return acc, to_img(ft), to_img(med)
