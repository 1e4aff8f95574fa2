"""Pose-only fast rendering for camera tracking.

During tracking the Gaussian parameters are FROZEN — only the 7-dof camera
pose moves (scripts/hierslam.py:1810-1894, lrs zero everything else).  The
general rasterizer re-gathers per-tile Gaussian data every iteration; on
TPU gathers are the dominant cost.  This path instead:

1. bins ONCE per frame at the pose-propagated initial pose, with a pixel
   margin covering the in-frame pose drift;
2. gathers the frame-constant raw attributes (world mean, color, opacity,
   isotropic scale) into [T, K, ...] tile layout ONCE;
3. every iteration does only dense math: pose-transform the gathered
   means, EWA-project in tile space, re-apply the exact current-pose
   rect/frustum culling, blend.  Gradients reduce straight to the 7 pose
   dofs — no gather, no scatter, anywhere.

The per-pair projection reproduces preprocess (forward.cu:74-113,156-256).
Isotropic maps cache one scale per pair (``cov2d = s^2 J J^T + 0.3 I``);
anisotropic maps cache the frame-CONSTANT world covariance ``S = R s s R^T``
(6-vector) per pair and evaluate ``cov2d = (J W) S (J W)^T + 0.3 I`` with
the current pose's rotation ``W`` each iteration — still pure dense math,
no per-iteration gather.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from hierslam_tpu.core import transforms
from hierslam_tpu.ops import render_xla
from hierslam_tpu.ops.rasterize import RasterConfig, compute_binning


class TrackCache(NamedTuple):
    # per capacity class (see ops.binning.BucketedLists): class b's tiles
    # render once at k_b slots on a (1, n_b) virtual grid
    tile_ids: Tuple[jax.Array, ...]   # [n_b] true tile ids
    means_world: Tuple[jax.Array, ...]   # [n_b, k_b, 3]
    colors: Tuple[jax.Array, ...]        # [n_b, k_b, 3]
    opacity: Tuple[jax.Array, ...]       # [n_b, k_b] post-sigmoid
    # isotropic: [n_b, k_b] post-exp scale; anisotropic: [n_b, k_b, 6]
    # world-frame covariance (xx, xy, xz, yy, yz, zz) — frame-constant
    scale: Tuple[jax.Array, ...]
    slot_valid: Tuple[jax.Array, ...]    # [n_b, k_b]
    count: jax.Array         # [T] true overlap counts
    radii0: jax.Array        # [N] radii at the cache pose (bookkeeping)
    n_dropped: jax.Array


def build_track_cache(
    params, active, q0, t0, camera, config: RasterConfig, margin_px: float = 12.0
) -> TrackCache:
    """Bin + gather the frame-constant attributes at the initial pose."""
    aniso = params["log_scales"].shape[1] == 3
    means_cam0, rots_cam0 = transforms.transform_to_frame(
        params["means3D"], params["unnorm_rotations"],
        jax.lax.stop_gradient(q0), jax.lax.stop_gradient(t0),
        gaussians_grad=False, camera_grad=False, transform_rots=aniso,
    )
    scales = jnp.exp(params["log_scales"])
    opac = jax.nn.sigmoid(params["logit_opacities"])
    b = compute_binning(
        means_cam0, scales, rots_cam0, camera, config,
        active=active, margin_px=margin_px, opacities=opac,
    )
    if aniso:
        # frame-constant WORLD covariance; the per-iteration render folds in
        # the current pose's rotation (forward.cu:118-152 computeCov3D)
        from hierslam_tpu.ops import projection as _proj

        cov3d = _proj.quat_scale_to_cov3d(
            transforms.normalize(params["unnorm_rotations"]), scales,
            mod=camera.scale_modifier,
        )
        shape_cols = jnp.stack(
            [cov3d[:, 0, 0], cov3d[:, 0, 1], cov3d[:, 0, 2],
             cov3d[:, 1, 1], cov3d[:, 1, 2], cov3d[:, 2, 2]], axis=1,
        )
    else:
        shape_cols = scales[:, :1]
    table = jnp.concatenate(
        [
            params["means3D"],
            params["rgb_colors"],
            opac,
            shape_cols,
        ],
        axis=1,
    )
    table = jax.lax.stop_gradient(table)  # cache is not differentiated
    mw, cols, opas, scs, valids = [], [], [], [], []
    for idx in b.lists.idx:
        safe = jnp.maximum(idx, 0)
        valid = idx >= 0
        if active is not None:
            valid = valid & active[safe]
        g = table[safe]
        mw.append(g[..., 0:3])
        cols.append(g[..., 3:6])
        opas.append(jnp.where(valid, g[..., 6], 0.0))
        scs.append(g[..., 7:13] if aniso else g[..., 7])
        valids.append(valid)
    # radii at cache pose for the reference's max_2D_radius bookkeeping
    from hierslam_tpu.ops import projection

    prep0 = projection.preprocess(
        means_cam0,
        scales if aniso else jnp.tile(scales[:, :1], (1, 3)),
        rots_cam0, camera, config.tile_shape, active=active,
    )
    return TrackCache(
        tile_ids=tuple(b.lists.tile_ids),
        means_world=tuple(mw),
        colors=tuple(cols),
        opacity=tuple(opas),
        scale=tuple(scs),
        slot_valid=tuple(valids),
        count=b.lists.count,
        radii0=prep0.radius,
        n_dropped=b.lists.n_dropped,
    )


def render_tracked(
    cache: TrackCache, q: jax.Array, t: jax.Array, camera, config: RasterConfig
):
    """Render at pose (q, t) from the cache.  Returns
    (im [3,H,W], depth, median_depth, final_opacity, mask).

    Each capacity class renders on its own (1, n_b) virtual tile grid and
    the strips assemble by one permutation gather (see ops.rasterize)."""
    from hierslam_tpu.ops.rasterize import _assemble_buckets

    H, W = camera.height, camera.width
    th, tw = config.tile_shape
    grid = config.grid(H, W)
    grid_y, grid_x = grid
    w2c = transforms.build_w2c(transforms.normalize(q), t)
    full = jnp.asarray(camera.full_proj)
    fx, fy = camera.focal_x, camera.focal_y
    limx, limy = 1.3 * camera.tan_fovx, 1.3 * camera.tan_fovy
    interp = config.pallas_interpret or jax.default_backend() == "cpu"

    strips_acc, ids_list = [], []
    for bi, ids_b in enumerate(cache.tile_ids):
        nb = ids_b.shape[0]
        if nb == 0:
            continue
        # f32-exact matmuls (HIGHEST): TPU's default single-pass-bf16 MXU
        # lowering would quantize camera-frame positions at ~4e-3 relative —
        # whole pixels of screen-space error at this resolution.
        m = (
            jnp.dot(cache.means_world[bi], w2c[:3, :3].T,
                    precision=jax.lax.Precision.HIGHEST)
            + w2c[:3, 3]
        )  # [n_b, K, 3] camera frame
        z = m[..., 2]
        in_front = z > 0.2  # auxiliary.h:139-162

        p_hom = jnp.dot(m, full[:, :3].T,
                        precision=jax.lax.Precision.HIGHEST) + full[:, 3]
        p_w = 1.0 / (p_hom[..., 3] + 1e-7)
        xy = jnp.stack(
            [
                ((p_hom[..., 0] * p_w + 1.0) * W - 1.0) * 0.5,
                ((p_hom[..., 1] * p_w + 1.0) * H - 1.0) * 0.5,
            ],
            -1,
        )

        # EWA 2D covariance (forward.cu:74-113)
        safe_z = jnp.where(z == 0, 1.0, z)
        inv_z = 1.0 / safe_z
        txc = jnp.clip(m[..., 0] * inv_z, -limx, limx)
        tyc = jnp.clip(m[..., 1] * inv_z, -limy, limy)
        jxx = fx * inv_z
        jyy = fy * inv_z
        jxz = -fx * txc * inv_z
        jyz = -fy * tyc * inv_z
        sc = cache.scale[bi]
        if sc.ndim == 3:
            # anisotropic: cov2d = (J W) S (J W)^T with the cached
            # world-frame covariance S and current rotation W — the exact
            # preprocess math with S frame-constant
            Wm = w2c[:3, :3]
            t0 = [jxx * Wm[0, c] + jxz * Wm[2, c] for c in range(3)]
            t1 = [jyy * Wm[1, c] + jyz * Wm[2, c] for c in range(3)]
            S = [
                [sc[..., 0], sc[..., 1], sc[..., 2]],
                [sc[..., 1], sc[..., 3], sc[..., 4]],
                [sc[..., 2], sc[..., 4], sc[..., 5]],
            ]
            a0 = [t0[0] * S[0][c] + t0[1] * S[1][c] + t0[2] * S[2][c]
                  for c in range(3)]
            b1 = [t1[0] * S[0][c] + t1[1] * S[1][c] + t1[2] * S[2][c]
                  for c in range(3)]
            c_xx = a0[0] * t0[0] + a0[1] * t0[1] + a0[2] * t0[2] + 0.3
            c_xy = a0[0] * t1[0] + a0[1] * t1[1] + a0[2] * t1[2]
            c_yy = b1[0] * t1[0] + b1[1] * t1[1] + b1[2] * t1[2] + 0.3
        else:
            # isotropic: cov2d = s^2 J J^T + 0.3 I
            s2 = sc * sc
            c_xx = s2 * (jxx * jxx + jxz * jxz) + 0.3
            c_xy = s2 * (jxz * jyz)
            c_yy = s2 * (jyy * jyy + jyz * jyz) + 0.3
        det = c_xx * c_yy - c_xy * c_xy
        det_ok = det != 0.0
        det_inv = 1.0 / jnp.where(det_ok, det, 1.0)
        conic = jnp.stack([c_yy * det_inv, -c_xy * det_inv, c_xx * det_inv], -1)

        # exact current-pose rect culling (getRect, auxiliary.h:46-56)
        mid = 0.5 * (c_xx + c_yy)
        sq = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
        radius = jax.lax.stop_gradient(
            jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(mid + sq, mid - sq)))
        )
        xy_ng = jax.lax.stop_gradient(xy)
        btx = (ids_b % grid_x)[:, None].astype(jnp.float32)
        bty = (ids_b // grid_x)[:, None].astype(jnp.float32)
        rminx = jnp.floor((xy_ng[..., 0] - radius) / tw)
        rminy = jnp.floor((xy_ng[..., 1] - radius) / th)
        rmaxx = jnp.floor((xy_ng[..., 0] + radius + tw - 1) / tw)
        rmaxy = jnp.floor((xy_ng[..., 1] + radius + th - 1) / th)
        rect_ok = (btx >= rminx) & (btx < rmaxx) & (bty >= rminy) & (bty < rmaxy)

        valid = cache.slot_valid[bi] & in_front & det_ok & rect_ok
        opa = jnp.where(valid, cache.opacity[bi], 0.0)

        # translate to the class's virtual grid: tile j at columns j*tw
        j = jnp.arange(nb, dtype=jnp.float32)[:, None]
        xy = xy.at[..., 0].add((j - btx) * tw).at[..., 1].add(-bty * th)

        if config.backend != "xla":  # "stream" uses the pallas class blend
            # here until the tracking stream path lands
            from hierslam_tpu.ops.render_pallas import render_tiles_pallas

            table = jnp.concatenate(
                [xy, conic, opa[..., None], z[..., None], cache.colors[bi]],
                axis=-1,
            )
            acc_b, ft_b, med_b = render_tiles_pallas(
                table, valid, image_shape=(th, nb * tw),
                tile_shape=config.tile_shape, grid=(1, nb), interpret=interp,
                chunk=config.gaussian_chunk, counts=cache.count[ids_b],
            )
        else:
            acc_b, ft_b, med_b = render_xla.blend_tiles(
                xy, conic, opa, z, cache.colors[bi], valid,
                image_shape=(th, nb * tw), tile_shape=config.tile_shape,
                grid=(1, nb), chunk=config.gaussian_chunk,
                tile_batch=config.tile_batch,
            )
        # ONE assembly pass: ft/med ride as two extra channels
        strips_acc.append(
            jnp.concatenate([acc_b, ft_b[None], med_b[None]], axis=0)
        )
        ids_list.append(ids_b)

    merged = _assemble_buckets(strips_acc, ids_list, grid, config.tile_shape, H, W)
    acc, ft, med = merged[:-2], merged[-2], merged[-1]
    return acc[:3], acc[-2], med, 1.0 - ft, acc[-1]
