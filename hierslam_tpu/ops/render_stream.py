"""Streamed per-tile renderer: raw-attribute pairs + in-kernel projection.

The round-4 device trace (BREAKDOWN_r04.md) showed the mapping iteration is
dominated by data movement AROUND the blend — building, transposing and
routing padded per-tile tables of screen-space quantities (~210 of 363
ms/iter) — while the blend math itself is nearly free.  This module removes
that machinery structurally:

* the per-pair gather reads RAW Gaussian attributes (world mean, log scale,
  opacity logit, features) straight from one packed parameter table — there
  is no screen-space table to pack, transpose, or un-pack;
* the camera projection (world->camera transform, EWA covariance, conic,
  rect/frustum culling — the math of ``preprocessCUDA``,
  cuda_rasterizer/forward.cu:74-113,156-256) runs INSIDE the Pallas kernel
  on each 128-pair row, with the pose as a tiny scalar input;
* tiles are rendered by a sequential per-tile grid over a RAGGED row
  stream (ops/binning.bin_stream): each tile owns ``ceil(k_alloc/128)``
  consecutive rows, so blended pairs track the true saturation-bounded
  need instead of a padded capacity-class ladder, and each tile's outputs
  are written directly at its tile id — no strip assembly;
* the backward kernel re-derives the suffix-sum gradients
  (backward.cu:472-899) in ONE back-to-front pass per tile seeded by the
  forward kernel's saved exit log-transmittance (row-entry values are
  reconstructed algebraically from it), and chains them all
  the way to the RAW attributes (the ``computeCov2DCUDA`` +
  ``preprocessCUDA`` chain, backward.cu:144-412) — cotangents leave in the
  same [rows, 128, C] stream layout and route through the scatter-free
  inverse map (ops/gather_vjp.py).

Isotropic Gaussians only (``log_scales`` width 1 — every shipped config;
anisotropic maps use the general ``ops/rasterize`` path).

Stream table column layout (STREAM_COLS):
    0:3   means3D (world frame)
    3     log_scale (isotropic)
    4     opacity logit
    5:5+F features (rgb, then semantic embedding)
The caller appends a SENTINEL row (zeros, opacity logit -100) at table row
``V``; pad slots of the stream index point at it and therefore blend to
nothing and route no gradient.

Scalar input layout (make_scalars): [R(9), t(3), P0(4), P1(4), P3(4),
fx, fy, limx, limy] padded to (1, 32).
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

COL_MEAN = 0
COL_LOGS = 3
COL_LOGIT = 4
COL_FEAT = 5
SENTINEL_LOGIT = -100.0

RW = 128          # pairs per stream row
CH = 4            # stream rows per DMA chunk


def make_scalars(w2c: jax.Array, camera) -> jax.Array:
    """Pack pose + projection constants into the kernel's (1, 32) input."""
    full = jnp.asarray(camera.full_proj, jnp.float32)
    vals = jnp.concatenate(
        [
            w2c[:3, :3].reshape(-1).astype(jnp.float32),   # 0:9
            w2c[:3, 3].astype(jnp.float32),                # 9:12
            full[0, :],                                    # 12:16
            full[1, :],                                    # 16:20
            full[3, :],                                    # 20:24
            jnp.asarray(
                [camera.focal_x, camera.focal_y,
                 1.3 * camera.tan_fovx, 1.3 * camera.tan_fovy],
                jnp.float32,
            ),                                             # 24:28
        ]
    )
    return jnp.pad(vals, (0, 32 - vals.shape[0])).reshape(1, 32)


def _project_row(tab_t, sc, tile_x, tile_y, row_ok, *, tile_shape):
    """Per-row projection: raw attrs [C, Q] -> screen-space rows [1, Q].

    Reproduces preprocessCUDA's isotropic math (forward.cu:74-113,156-256;
    identical to ops/render_tracked.render_tracked) including the exact
    current-pose rect/frustum culling of the tile (getRect,
    auxiliary.h:46-56).  Returns everything the blend and the backward
    chain need.
    """
    th, tw = tile_shape
    mx = tab_t[COL_MEAN:COL_MEAN + 1]
    my = tab_t[COL_MEAN + 1:COL_MEAN + 2]
    mz = tab_t[COL_MEAN + 2:COL_MEAN + 3]
    logs = tab_t[COL_LOGS:COL_LOGS + 1]
    logit = tab_t[COL_LOGIT:COL_LOGIT + 1]

    R00, R01, R02 = sc[0, 0], sc[0, 1], sc[0, 2]
    R10, R11, R12 = sc[0, 3], sc[0, 4], sc[0, 5]
    R20, R21, R22 = sc[0, 6], sc[0, 7], sc[0, 8]
    t0, t1, t2 = sc[0, 9], sc[0, 10], sc[0, 11]
    fx, fy = sc[0, 24], sc[0, 25]
    limx, limy = sc[0, 26], sc[0, 27]

    mcx = R00 * mx + R01 * my + R02 * mz + t0
    mcy = R10 * mx + R11 * my + R12 * mz + t1
    mcz = R20 * mx + R21 * my + R22 * mz + t2
    in_front = mcz > 0.2  # auxiliary.h:139-162 (near cull only)

    ph_x = sc[0, 12] * mcx + sc[0, 13] * mcy + sc[0, 14] * mcz + sc[0, 15]
    ph_y = sc[0, 16] * mcx + sc[0, 17] * mcy + sc[0, 18] * mcz + sc[0, 19]
    ph_w = sc[0, 20] * mcx + sc[0, 21] * mcy + sc[0, 22] * mcz + sc[0, 23]
    p_w = 1.0 / (ph_w + 1e-7)

    # ndc2pix needs the image dims; they ride as compile-time constants via
    # the closure (W = grid_x * tw is NOT right for crops, so the caller
    # bakes the true W, H into the kernel partial).
    return dict(
        mx=mx, my=my, mz=mz, logs=logs, logit=logit,
        mcx=mcx, mcy=mcy, mcz=mcz, in_front=in_front,
        ph_x=ph_x, ph_y=ph_y, ph_w=ph_w, p_w=p_w,
        fx=fx, fy=fy, limx=limx, limy=limy, row_ok=row_ok,
        tile_x=tile_x, tile_y=tile_y,
    )


def _screen_quantities(pr, *, img_w, img_h, tile_shape):
    """Continue projection: screen xy, conic, radius, rect test, opacity."""
    th, tw = tile_shape
    px_s = ((pr["ph_x"] * pr["p_w"] + 1.0) * img_w - 1.0) * 0.5
    py_s = ((pr["ph_y"] * pr["p_w"] + 1.0) * img_h - 1.0) * 0.5

    mcz = pr["mcz"]
    safe_z = jnp.where(mcz == 0.0, 1.0, mcz)
    inv_z = 1.0 / safe_z
    txc = jnp.clip(pr["mcx"] * inv_z, -pr["limx"], pr["limx"])
    tyc = jnp.clip(pr["mcy"] * inv_z, -pr["limy"], pr["limy"])
    j00 = pr["fx"] * inv_z
    j02 = -pr["fx"] * txc * inv_z
    j11 = pr["fy"] * inv_z
    j12 = -pr["fy"] * tyc * inv_z
    s = jnp.exp(pr["logs"])
    s2 = s * s
    c_xx = s2 * (j00 * j00 + j02 * j02) + 0.3
    c_xy = s2 * (j02 * j12)
    c_yy = s2 * (j11 * j11 + j12 * j12) + 0.3
    det = c_xx * c_yy - c_xy * c_xy
    det_ok = det != 0.0
    det_inv = 1.0 / jnp.where(det_ok, det, 1.0)
    ca = c_yy * det_inv
    cb = -c_xy * det_inv
    cc = c_xx * det_inv

    mid = 0.5 * (c_xx + c_yy)
    sq = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(mid + sq, mid - sq)))
    rminx = jnp.floor((px_s - radius) / tw)
    rminy = jnp.floor((py_s - radius) / th)
    rmaxx = jnp.floor((px_s + radius + tw - 1) / tw)
    rmaxy = jnp.floor((py_s + radius + th - 1) / th)
    tx = pr["tile_x"]
    ty = pr["tile_y"]
    rect_ok = (tx >= rminx) & (tx < rmaxx) & (ty >= rminy) & (ty < rmaxy)

    opa = jax.nn.sigmoid(pr["logit"])
    valid = pr["in_front"] & det_ok & rect_ok & pr["row_ok"]
    return dict(
        px=px_s, py=py_s, ca=ca, cb=cb, cc=cc, opa=opa, valid=valid,
        # backward-chain intermediates
        inv_z=inv_z, txc=txc, tyc=tyc, j00=j00, j02=j02, j11=j11, j12=j12,
        s2=s2, c_xx=c_xx, c_xy=c_xy, c_yy=c_yy, det=det, det_ok=det_ok,
        det_inv=det_inv,
    )


def _cumsum_lanes(x):
    """Inclusive cumsum along lanes as a triangular MXU matmul."""
    k = x.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    tri = (rows <= cols).astype(x.dtype)
    return jnp.dot(x, tri, preferred_element_type=jnp.float32)


def _row_alpha(sq_, px, py):
    """[P, Q] alpha half of the blend for one stream row: everything that
    does not depend on the carried transmittance."""
    dx = sq_["px"] - px                                   # [P, Q]
    dy = sq_["py"] - py
    power = -0.5 * (sq_["ca"] * dx * dx + sq_["cc"] * dy * dy) - sq_["cb"] * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, sq_["opa"] * jnp.exp(power))
    contrib = (power <= 0.0) & (alpha >= ALPHA_MIN) & sq_["valid"]
    a = jnp.where(contrib, alpha, 0.0)
    logu = jnp.log1p(-a)
    cs = _cumsum_lanes(logu)
    return dx, dy, power, alpha, contrib, a, cs


def _row_transmit(a, cs, logT):
    """Transmittance half: T after/before each gaussian given the row-entry
    log-transmittance ``logT`` [P, 1]."""
    Ta = jnp.exp(logT + cs)            # T after each gaussian
    Tb = Ta / (1.0 - a)                # T before (exclusive; a <= 0.99)
    committed = Ta >= T_DONE
    w = a * Tb * committed
    logT_next = logT + cs[:, -1:]
    return Ta, Tb, committed, w, logT_next


def _blend_row(sq_, dep, logT, px, py):
    """[P, Q] blend core for one stream row (math of render_pallas).

    ``dep`` is the camera-space depth row [1, Q]; returns the chunk values
    plus the updated carried log-transmittance."""
    dx, dy, power, alpha, contrib, a, cs = _row_alpha(sq_, px, py)
    Ta, Tb, committed, w, logT_next = _row_transmit(a, cs, logT)
    return dx, dy, power, alpha, contrib, a, Ta, Tb, committed, w, logT_next


def _pixel_grid(tile_x, tile_y, tile_shape):
    th, tw = tile_shape
    P = th * tw
    lin = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (tile_x * tw + lin % tw).astype(jnp.float32)     # [P, 1]
    py = (tile_y * th + lin // tw).astype(jnp.float32)
    return px, py


def _feats_row(tab_t, dep, n_feat):
    """[F+2, Q]: feature rows + depth row + ones row."""
    return jnp.concatenate(
        [tab_t[COL_FEAT:COL_FEAT + n_feat], dep, jnp.ones_like(dep)], axis=0
    )


def _fwd_kernel(row_off_ref, sc_ref, tab_hbm, acc_ref, ft_ref, med_ref,
                lte_ref, tab_vmem, dma_sems, *, tile_shape, grid_x, n_feat,
                img_w, img_h):
    th, tw = tile_shape
    P = th * tw
    t = pl.program_id(0)
    r0 = row_off_ref[t]
    nr = row_off_ref[t + 1] - r0
    nch = (nr + CH - 1) // CH
    tile_x = (t % grid_x).astype(jnp.float32)
    tile_y = (t // grid_x).astype(jnp.float32)
    px, py = _pixel_grid(tile_x, tile_y, tile_shape)

    def get_dma(slot, ci):
        return pltpu.make_async_copy(
            tab_hbm.at[pl.ds(r0 + ci * CH, CH)],
            tab_vmem.at[slot],
            dma_sems.at[slot],
        )

    @pl.when(nch > 0)
    def _():
        get_dma(0, 0).start()

    def chunk_body(ci, carry):
        logT, acc, ft, med_sum, med_found = carry
        slot = ci % 2

        @pl.when(ci + 1 < nch)
        def _():
            get_dma((ci + 1) % 2, ci + 1).start()

        get_dma(slot, ci).wait()
        for j in range(CH):
            row_ok = (ci * CH + j) < nr
            # columns-first stream: a row slice already IS [C, Q] — no
            # per-row 128x128 in-kernel transpose (which dominated the
            # row-major layout's runtime)
            tab_t = tab_vmem[slot, j]                      # [C, Q]
            pr = _project_row(tab_t, sc_ref, tile_x, tile_y, row_ok,
                              tile_shape=tile_shape)
            sq_ = _screen_quantities(pr, img_w=img_w, img_h=img_h,
                                     tile_shape=tile_shape)
            dep = pr["mcz"]
            (dx, dy, power, alpha, contrib, a, Ta, Tb, committed, w,
             logT) = _blend_row(sq_, dep, logT, px, py)
            feats = _feats_row(tab_t, dep, n_feat)         # [F+2, Q]
            acc = acc + jax.lax.dot_general(
                w, feats, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # all carries stay 2-D [P, 1] f32 — Mosaic cannot legalize an
            # scf.for whose carries mix 1-D / bool vector layouts
            ft = jnp.minimum(
                ft, jnp.min(jnp.where(committed, Ta, 1.0), -1, keepdims=True)
            )
            crossing = contrib & committed & (Tb > 0.5) & (Ta < 0.5)
            med_sum = med_sum + jnp.sum(
                jnp.where(crossing, dep, 0.0), -1, keepdims=True
            )
            med_found = jnp.maximum(
                med_found,
                jnp.max(crossing.astype(jnp.float32), -1, keepdims=True),
            )
        return logT, acc, ft, med_sum, med_found

    init = (
        jnp.zeros((P, 1), jnp.float32),
        jnp.zeros((P, n_feat + 2), jnp.float32),
        jnp.ones((P, 1), jnp.float32),
        jnp.zeros((P, 1), jnp.float32),
        jnp.zeros((P, 1), jnp.float32),
    )
    logT, acc, ft, med_sum, med_found = jax.lax.fori_loop(
        0, nch, chunk_body, init
    )
    acc_ref[0] = acc
    ft_ref[0, 0] = ft[:, 0]
    med_ref[0, 0] = jnp.where(
        med_found[:, 0] > 0.0, med_sum[:, 0], MEDIAN_DEFAULT
    )
    # residuals for the backward: per-pixel exit log-transmittance (the
    # back-to-front sweep reconstructs row-entry values from it) and, via
    # ft_ref above, the final committed T — so the backward needs no
    # forward re-sweep (pass A) of its own
    lte_ref[0, 0] = logT[:, 0]


def _bwd_kernel(row_off_ref, sc_ref, tab_hbm, gacc_ref, gft_ref, gmed_ref,
                lte_ref, tfin_ref, dtab_zeros, dtab_hbm, tab_all, dtab_row,
                in_sem, out_sem, *, tile_shape, grid_x, n_feat, img_w,
                img_h, mrt):
    # dtab_zeros is aliased to dtab_hbm (input_output_aliases): the output
    # buffer starts zeroed, so stream pad rows no tile writes (everything
    # past row_off[T]) carry exact zero cotangents instead of uninitialized
    # HBM — a NaN there would poison the suffix-sum routing passes.
    del dtab_zeros
    th, tw = tile_shape
    P = th * tw
    t = pl.program_id(0)
    r0 = row_off_ref[t]
    nr = row_off_ref[t + 1] - r0
    nch = (nr + CH - 1) // CH
    tile_x = (t % grid_x).astype(jnp.float32)
    tile_y = (t // grid_x).astype(jnp.float32)
    px, py = _pixel_grid(tile_x, tile_y, tile_shape)

    # ---- load all of this tile's rows (<= mrt) into VMEM ----------------
    def load_body(ci, _):
        dma = pltpu.make_async_copy(
            tab_hbm.at[pl.ds(r0 + ci * CH, CH)],
            tab_all.at[pl.ds(ci * CH, CH)],
            in_sem,
        )
        dma.start()
        dma.wait()
        return 0

    jax.lax.fori_loop(0, nch, load_body, 0)

    # residuals saved by the forward kernel: no forward re-sweep needed.
    # (Entry transmittances are NOT stored per row: Mosaic forbids dynamic
    # lane-column stores, and pass B reconstructs each row's entry logT
    # from the carried exit value minus the row's own log1p(-a) sum, which
    # it recomputes anyway.)
    logT_exit = lte_ref[0, 0][:, None]  # [P, 1]
    T_final = tfin_ref[0, 0][:, None]   # [P, 1]

    gacc = gacc_ref[0]                 # [P, F+2]
    gft = gft_ref[0, 0][:, None]       # [P, 1]
    gmed = gmed_ref[0, 0][:, None]     # [P, 1]

    # ---- pass B: back-to-front suffix-sum gradients + raw-attr chain ----
    def passB(jj, carry):
        S_carry, logT_after = carry
        j = nr - 1 - jj
        row_ok = j < nr
        tab_t = tab_all[j]                                 # [C, Q]
        pr = _project_row(tab_t, sc_ref, tile_x, tile_y, row_ok,
                          tile_shape=tile_shape)
        sq_ = _screen_quantities(pr, img_w=img_w, img_h=img_h,
                                 tile_shape=tile_shape)
        dep = pr["mcz"]
        dx, dy, power, alpha, contrib, a, cs = _row_alpha(sq_, px, py)
        logT = logT_after - cs[:, -1:]     # reconstructed row-entry logT
        Ta, Tb, committed, w, _ = _row_transmit(a, cs, logT)
        feats = _feats_row(tab_t, dep, n_feat)             # [F+2, Q]
        s = jax.lax.dot_general(
            gacc, feats, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # [P, Q]
        sw = s * w
        sw_tot = jnp.sum(sw, axis=-1, keepdims=True)
        S = sw_tot - _cumsum_lanes(sw) + S_carry
        S_carry = S_carry + sw_tot
        u = 1.0 - a
        da = committed * contrib * (s * Tb - (S + gft * T_final) / u)
        live = (alpha < ALPHA_MAX) & contrib
        dopa_pix = jnp.where(live, jnp.exp(power) * da, 0.0)
        dpow = jnp.where(live, alpha * da, 0.0)

        def colsum(x):  # [P, Q] -> [1, Q]
            return jnp.sum(x, axis=0, keepdims=True)

        ca, cb, cc = sq_["ca"], sq_["cb"], sq_["cc"]
        d_px = colsum(dpow * (-(ca * dx + cb * dy)))
        d_py = colsum(dpow * (-(cc * dy + cb * dx)))
        d_ca = colsum(-0.5 * dx * dx * dpow)
        d_cb = colsum(-dx * dy * dpow)
        d_cc = colsum(-0.5 * dy * dy * dpow)
        d_opa = colsum(dopa_pix)
        dfeats = jax.lax.dot_general(
            gacc, w, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # [F+2, Q]
        crossing = contrib & committed & (Tb > 0.5) & (Ta < 0.5)
        d_dep = dfeats[n_feat:n_feat + 1] + colsum(crossing * gmed)

        # ---- chain to raw attributes (computeCov2DCUDA + preprocessCUDA,
        # backward.cu:144-412, isotropic) -----------------------------
        # conic = adj(cov2d)/det: with A=c_xx, B=c_xy, C=c_yy,
        #   ca=C/det, cb=-B/det, cc=A/det
        A, B, C = sq_["c_xx"], sq_["c_xy"], sq_["c_yy"]
        det_inv = sq_["det_inv"]
        d2 = det_inv * det_inv
        g_A = (-C * C * d_ca + B * C * d_cb - B * B * d_cc) * d2
        g_B = (2 * B * C * d_ca - (sq_["det"] + 2 * B * B) * d_cb
               + 2 * A * B * d_cc) * d2
        g_C = (-B * B * d_ca + A * B * d_cb - A * A * d_cc) * d2
        # cov2d from s2, J (c_xx = s2(j00^2+j02^2)+.3 etc.)
        j00, j02 = sq_["j00"], sq_["j02"]
        j11, j12 = sq_["j11"], sq_["j12"]
        s2 = sq_["s2"]
        g_s2 = (g_A * (j00 * j00 + j02 * j02) + g_B * (j02 * j12)
                + g_C * (j11 * j11 + j12 * j12))
        g_j00 = g_A * s2 * 2 * j00
        g_j02 = g_A * s2 * 2 * j02 + g_B * s2 * j12
        g_j11 = g_C * s2 * 2 * j11
        g_j12 = g_C * s2 * 2 * j12 + g_B * s2 * j02
        # J from inv_z, clamped tx/ty
        fx, fy = pr["fx"], pr["fy"]
        inv_z = sq_["inv_z"]
        g_txc = -fx * inv_z * g_j02
        g_tyc = -fy * inv_z * g_j12
        g_inv_z = (fx * g_j00 + fy * g_j11
                   - fx * sq_["txc"] * g_j02 - fy * sq_["tyc"] * g_j12)
        # txc = clip(mcx * inv_z): zero grad outside the FoV limits
        # (x_grad_mul, backward.cu:175-176)
        in_x = jnp.abs(pr["mcx"] * inv_z) < pr["limx"]
        in_y = jnp.abs(pr["mcy"] * inv_z) < pr["limy"]
        g_mcx = jnp.where(in_x, inv_z * g_txc, 0.0)
        g_mcy = jnp.where(in_y, inv_z * g_tyc, 0.0)
        g_inv_z = g_inv_z + (jnp.where(in_x, pr["mcx"] * g_txc, 0.0)
                             + jnp.where(in_y, pr["mcy"] * g_tyc, 0.0))
        g_mcz = -inv_z * inv_z * g_inv_z
        # screen xy from the projective transform
        W2, H2 = img_w * 0.5, img_h * 0.5
        p_w = pr["p_w"]
        g_phx = d_px * W2 * p_w
        g_phy = d_py * H2 * p_w
        g_pw = d_px * W2 * pr["ph_x"] + d_py * H2 * pr["ph_y"]
        g_phw = -g_pw * p_w * p_w
        g_mcx = g_mcx + sc_ref[0, 12] * g_phx + sc_ref[0, 16] * g_phy + sc_ref[0, 20] * g_phw
        g_mcy = g_mcy + sc_ref[0, 13] * g_phx + sc_ref[0, 17] * g_phy + sc_ref[0, 21] * g_phw
        g_mcz = g_mcz + sc_ref[0, 14] * g_phx + sc_ref[0, 18] * g_phy + sc_ref[0, 22] * g_phw
        # depth channel reads mcz directly
        g_mcz = g_mcz + d_dep
        # world mean: d_mw = R^T d_mc
        g_mwx = sc_ref[0, 0] * g_mcx + sc_ref[0, 3] * g_mcy + sc_ref[0, 6] * g_mcz
        g_mwy = sc_ref[0, 1] * g_mcx + sc_ref[0, 4] * g_mcy + sc_ref[0, 7] * g_mcz
        g_mwz = sc_ref[0, 2] * g_mcx + sc_ref[0, 5] * g_mcy + sc_ref[0, 8] * g_mcz
        # log-scale (s2 = exp(2 logs) * mod^2 -> d logs = 2 s2 g_s2)
        g_logs = 2.0 * s2 * g_s2
        # opacity logit (sigmoid chain)
        opa = sq_["opa"]
        g_logit = d_opa * opa * (1.0 - opa)

        # ---- assemble dtab row [C, Q] (native layout) and DMA out -------
        rows = [g_mwx, g_mwy, g_mwz, g_logs, g_logit]
        rows += [dfeats[i:i + 1] for i in range(n_feat)]
        used = jnp.concatenate(rows, axis=0)               # [5+F, Q]
        dtab_row[:] = jnp.pad(
            used, ((0, tab_t.shape[0] - used.shape[0]), (0, 0))
        )
        dma = pltpu.make_async_copy(
            dtab_row, dtab_hbm.at[r0 + j], out_sem
        )
        dma.start()
        dma.wait()
        return S_carry, logT

    jax.lax.fori_loop(
        0, nr, passB, (jnp.zeros((P, 1), jnp.float32), logT_exit)
    )


def _run_fwd(tab, scalars, row_off, grid, tile_shape, n_feat, img_shape,
             interpret):
    R, Cp, rw = tab.shape
    grid_y, grid_x = grid
    T = grid_y * grid_x
    th, tw = tile_shape
    P = th * tw
    img_h, img_w = img_shape
    tab_p = jnp.pad(tab, ((0, CH), (0, 0), (0, 0)))
    kern = functools.partial(
        _fwd_kernel, tile_shape=tile_shape, grid_x=grid_x, n_feat=n_feat,
        img_w=float(img_w), img_h=float(img_h),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, P, n_feat + 2), lambda t, ro: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda t, ro: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda t, ro: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda t, ro: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, CH, Cp, rw), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    acc, ft, med, lte = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, P, n_feat + 2), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(row_off, scalars, tab_p)
    return acc, ft[:, 0], med[:, 0], lte[:, 0]


def _run_bwd(tab, scalars, row_off, gacc, gft, gmed, lte, tfin, grid,
             tile_shape, n_feat, img_shape, k_cap, interpret):
    R, Cp, rw = tab.shape
    grid_y, grid_x = grid
    T = grid_y * grid_x
    th, tw = tile_shape
    P = th * tw
    img_h, img_w = img_shape
    mrt = -(-k_cap // rw)
    mrt_pad = -(-mrt // CH) * CH
    tab_p = jnp.pad(tab, ((0, mrt_pad), (0, 0), (0, 0)))
    kern = functools.partial(
        _bwd_kernel, tile_shape=tile_shape, grid_x=grid_x, n_feat=n_feat,
        img_w=float(img_w), img_h=float(img_h), mrt=mrt_pad,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, P, n_feat + 2), lambda t, ro: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda t, ro: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda t, ro: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda t, ro: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda t, ro: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((mrt_pad, Cp, rw), jnp.float32),
            pltpu.VMEM((Cp, rw), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    zeros_dtab = jnp.zeros((R + mrt_pad, Cp, rw), jnp.float32)
    dtab = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((R + mrt_pad, Cp, rw), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            has_side_effects=True,
        ),
        # aliased: the 8th operand (after the scalar-prefetch arg) IS the
        # output buffer -> pad rows start as exact zeros
        input_output_aliases={8: 0},
        interpret=interpret,
    )(row_off, scalars, tab_p, gacc, gft[:, None, :], gmed[:, None, :],
      lte[:, None, :], tfin[:, None, :], zeros_dtab)[0]
    return dtab[:R]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def blend_stream(tab, scalars, row_off, grid, tile_shape, n_feat,
                 img_shape, k_cap, interpret=False):
    """Streamed ragged blend.  tab [R, Cp, 128] columns-first raw-attribute
    rows (STREAM_COLS layout on the Cp axis — a row slice is directly the
    [C, Q] the in-kernel projection consumes, and Cp carries only the USED
    columns padded to a sublane multiple, not the gather table's 128-lane
    width), scalars (1, 32) from :func:`make_scalars`, row_off [T+1]
    -> (acc [T, P, F+2], final_T [T, P], med [T, P])."""
    return tuple(_run_fwd(tab, scalars, row_off, grid, tile_shape, n_feat,
                          img_shape, interpret))[:3]


def _blend_stream_fwd(tab, scalars, row_off, grid, tile_shape, n_feat,
                      img_shape, k_cap, interpret):
    acc, ft, med, lte = _run_fwd(tab, scalars, row_off, grid, tile_shape,
                                 n_feat, img_shape, interpret)
    # ft (final committed T) and lte (exit log-transmittance) double as
    # backward residuals: the gradient kernel runs only the back-to-front
    # sweep, no forward re-sweep
    return (acc, ft, med), (tab, scalars, row_off, ft, lte)


def _blend_stream_bwd(grid, tile_shape, n_feat, img_shape, k_cap, interpret,
                      res, cots):
    tab, scalars, row_off, tfin, lte = res
    gacc, gft, gmed = cots
    dtab = _run_bwd(tab, scalars, row_off, gacc, gft, gmed, lte, tfin,
                    grid, tile_shape, n_feat, img_shape, k_cap, interpret)
    return dtab, None, None


blend_stream.defvjp(_blend_stream_fwd, _blend_stream_bwd)


class StreamBinning:
    """Amortized stream binning: ragged lists + ONE inverse gradient map."""

    def __init__(self, lists, inverse):
        self.lists = lists
        self.inverse = inverse

    # registered as a pytree so lax.map can stack per-window-frame binnings
    def tree_flatten(self):
        return (self.lists, self.inverse), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    StreamBinning, StreamBinning.tree_flatten, StreamBinning.tree_unflatten
)


def compute_stream_binning(
    means_cam, scales, rotations, camera, config, active=None,
    margin_px: float = 0.0, opacities=None, compact: bool = False,
):
    """Ragged stream lists + inverse gradient map at the given camera-frame
    means (the stream analogue of ops.rasterize.compute_binning)."""
    from hierslam_tpu.ops import binning, projection
    from hierslam_tpu.ops.gather_vjp import build_inverse_map

    if scales.ndim == 2 and scales.shape[1] == 1:
        scales = jnp.tile(scales, (1, 3))
    prep = projection.preprocess(
        jax.lax.stop_gradient(means_cam),
        jax.lax.stop_gradient(scales),
        jax.lax.stop_gradient(rotations),
        camera, config.tile_shape, active=active, radius_margin_px=margin_px,
    )
    grid = config.grid(camera.height, camera.width)
    sat = config.sat_margin > 0.0 and opacities is not None
    lists = binning.bin_stream(
        prep.rect_min, prep.rect_max, prep.valid,
        jax.lax.stop_gradient(prep.depth), grid, config.tile_shape,
        stream_rows=config.stream_rows_for(grid),
        k_cap=config.stream_cap,
        max_tiles_per_gaussian=config.max_tiles_per_gaussian,
        sat_margin=config.sat_margin if sat else 0.0,
        sat_floor=config.sat_floor,
        xy=jax.lax.stop_gradient(prep.xy) if sat else None,
        conic=jax.lax.stop_gradient(prep.conic) if sat else None,
        opacity=jax.lax.stop_gradient(opacities) if sat else None,
        visible_budget=config.visible_budget if compact else 0,
    )
    n_rows = (
        lists.vis_ids.shape[0] if lists.vis_ids is not None
        else means_cam.shape[0]
    ) + 1  # + sentinel row
    inverse = build_inverse_map(
        lists.idx, n_rows, config.max_tiles_per_gaussian
    )
    pb = config.grad_pair_budget
    if pb and pb < inverse.spos.shape[0]:
        # the gradient router only ever reads the first pair_budget
        # positions of the gaussian-sorted order (gather_vjp._gather_bwd)
        # — store the per-frame tables pre-truncated: ~10 MB/frame at the
        # mapping shape, x window frames of amortized binnings
        from hierslam_tpu.ops.gather_vjp import InverseMap

        inverse = InverseMap(
            spos=inverse.spos[:pb], ends=inverse.ends,
            run_masks=inverse.run_masks[:pb],
        )
    return StreamBinning(lists, inverse)


def sentinel_row(width: int = 128) -> jax.Array:
    """The all-masked gather-table row stream pads point at."""
    return jnp.zeros((1, width), jnp.float32).at[0, COL_LOGIT].set(
        SENTINEL_LOGIT
    )


def render_from_table(
    table, b: StreamBinning, w2c, camera, config, n_feat: int,
):
    """Render the ragged stream from a raw-attribute table.

    ``table`` [V, 128] f32 in STREAM_COLS layout (NO sentinel row — it is
    appended here), already compacted to the binning's visible prefix when
    the binning was built with ``compact=True``.  Differentiable w.r.t.
    ``table``.  Returns (channels [F+2, H, W], final_T [H, W], med [H, W]).
    """
    from hierslam_tpu.ops.gather_vjp import gather_rows

    H, W = camera.height, camera.width
    grid = config.grid(H, W)
    interp = config.pallas_interpret or jax.default_backend() == "cpu"
    table_s = jnp.concatenate([table, sentinel_row(table.shape[1])], axis=0)
    g = gather_rows(
        table_s, b.lists.idx, b.inverse.spos, b.inverse.ends,
        b.inverse.run_masks, config.max_tiles_per_gaussian,
        COL_FEAT + n_feat, config.grad_pair_budget, config.grad_bf16,
    )
    # columns-first stream: keep only the used columns (sublane-padded) and
    # swap to [R, Cp, rw] so kernel row slices need no in-kernel transpose.
    # The slice drops the gather table's 128-lane padding from all stream
    # HBM buffers (4x at the 26-dim semantic width); its VJP re-pads with
    # zeros, which the inverse-map routing ignores past n_diff anyway.
    c_used = COL_FEAT + n_feat
    cp = -(-c_used // 8) * 8
    gt_ = jnp.swapaxes(g[..., :cp], 1, 2)
    scalars = make_scalars(jnp.asarray(w2c, jnp.float32), camera)
    proj_h = camera.proj_height or camera.height
    acc, ft, med = blend_stream(
        gt_, scalars, b.lists.row_off, grid, config.tile_shape, n_feat,
        (proj_h, W), config.stream_cap, interp,
    )
    return assemble_stream(acc, ft, med, grid, config.tile_shape, (H, W),
                           None)


def assemble_stream(acc, ft, med, grid, tile_shape, image_shape, written):
    """[T, P, C] per-tile outputs -> image layout ([C, H, W], [H, W] x2).

    ``written`` [T] bool marks tiles the kernel actually visited with at
    least the ability to write (always true for the per-tile grid) — kept
    for parity with callers that mask unused tiles.
    """
    H, W = image_shape
    grid_y, grid_x = grid
    th, tw = tile_shape
    C = acc.shape[-1]
    del written
    img = acc.reshape(grid_y, grid_x, th, tw, C).transpose(4, 0, 2, 1, 3)
    img = img.reshape(C, grid_y * th, grid_x * tw)[:, :H, :W]

    def to_img(x):
        x = x.reshape(grid_y, grid_x, th, tw).transpose(0, 2, 1, 3)
        return x.reshape(grid_y * th, grid_x * tw)[:H, :W]

    return img, to_img(ft), to_img(med)
