"""Per-Gaussian screen-space preprocessing (differentiable, pure jnp).

TPU-native equivalent of ``preprocessCUDA``
(cuda_rasterizer/forward.cu:156-256): frustum cull, 3D covariance from
quaternion+scale (forward.cu:118-152), EWA projection to a 2D covariance with
the +0.3 low-pass (forward.cu:74-113), conic + 3-sigma radius
(forward.cu:229-232) and screen-space tile rectangle
(cuda_rasterizer/auxiliary.h:46-56).

This stage is embarrassingly parallel over Gaussians — it is left to XLA
(which fuses it into a handful of elementwise kernels) rather than Pallas;
the hot tile-blend stage lives in ``render_xla.py`` / ``render_pallas.py``.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class Preprocessed(NamedTuple):
    xy: jax.Array          # [N, 2] pixel-space mean
    depth: jax.Array       # [N] camera-space z
    conic: jax.Array       # [N, 3] (a, b, c) of inverse 2D covariance
    radius: jax.Array      # [N] int32 screen radius (0 => culled)
    rect_min: jax.Array    # [N, 2] int32 (tx, ty) inclusive
    rect_max: jax.Array    # [N, 2] int32 (tx, ty) exclusive
    valid: jax.Array       # [N] bool
    tiles_touched: jax.Array  # [N] int32


def quat_scale_to_cov3d(rotations: jax.Array, scales: jax.Array, mod: float = 1.0) -> jax.Array:
    """R S S^T R^T world covariance (forward.cu:118-152). ``rotations`` are
    unit quaternions [N,4] (w,x,y,z); ``scales`` [N,3] positive."""
    from hierslam_tpu.core.transforms import quat_to_rotmat

    R = quat_to_rotmat(rotations)              # [N, 3, 3]
    M = R * (mod * scales)[:, None, :]         # R @ diag(s): scale columns
    return M @ jnp.swapaxes(M, -1, -2)         # [N, 3, 3]


def ndc2pix(v: jax.Array, size: int) -> jax.Array:
    """cuda_rasterizer/auxiliary.h:41-44."""
    return ((v + 1.0) * size - 1.0) * 0.5


def preprocess(
    means3D: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    camera,
    tile_shape: Tuple[int, int],
    active: jax.Array | None = None,
    cov3D_precomp: jax.Array | None = None,
    pixel_offset_y=0.0,
    radius_margin_px: float = 0.0,
) -> Preprocessed:
    """Project Gaussians to screen space.

    ``means3D`` are world-frame (usually already the current camera frame
    with ``camera.w2c == I``, mirroring how the reference pre-transforms
    Gaussians in transform_to_frame, utils/slam_helpers.py:278-330).
    """
    th, tw = tile_shape
    n = means3D.shape[0]
    w2c = camera.w2c
    full = camera.full_proj

    p_view = means3D @ w2c[:3, :3].T + w2c[:3, 3]
    depth = p_view[:, 2]
    in_frustum = depth > 0.2  # auxiliary.h:139-162 (near cull only)

    p_hom = means3D @ full[:, :3].T + full[:, 3]
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    p_proj = p_hom[:, :3] * p_w[:, None]

    if cov3D_precomp is None:
        cov3d = quat_scale_to_cov3d(rotations, scales, camera.scale_modifier)
    else:
        cov3d = cov3D_precomp

    # EWA 2D covariance (forward.cu:74-113). The FoV clamp's zero-gradient
    # outside the limits reproduces the x_grad_mul factor of backward.cu:175.
    limx = 1.3 * camera.tan_fovx
    limy = 1.3 * camera.tan_fovy
    tz = depth
    safe_tz = jnp.where(tz == 0, 1.0, tz)
    tx = jnp.clip(p_view[:, 0] / safe_tz, -limx, limx) * tz
    ty = jnp.clip(p_view[:, 1] / safe_tz, -limy, limy) * tz
    inv_z = 1.0 / safe_tz
    inv_z2 = inv_z * inv_z
    fx, fy = camera.focal_x, camera.focal_y
    zeros = jnp.zeros_like(tz)
    # J: 2x3 Jacobian of the perspective projection at the (clamped) mean.
    J = jnp.stack(
        [
            jnp.stack([fx * inv_z, zeros, -fx * tx * inv_z2], -1),
            jnp.stack([zeros, fy * inv_z, -fy * ty * inv_z2], -1),
        ],
        -2,
    )  # [N, 2, 3]
    W = w2c[:3, :3]
    T = J @ W  # [N, 2, 3]
    cov2d = T @ cov3d @ jnp.swapaxes(T, -1, -2)  # [N, 2, 2]
    c_xx = cov2d[:, 0, 0] + 0.3
    c_xy = cov2d[:, 0, 1]
    c_yy = cov2d[:, 1, 1] + 0.3

    det = c_xx * c_yy - c_xy * c_xy
    det_valid = det != 0.0
    det_inv = 1.0 / jnp.where(det_valid, det, 1.0)
    conic = jnp.stack([c_yy * det_inv, -c_xy * det_inv, c_xx * det_inv], -1)

    mid = 0.5 * (c_xx + c_yy)
    sq = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + sq
    # radius participates only in culling/binning — integer, non-diff.
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, mid - sq)))
    radius_f = jax.lax.stop_gradient(radius_f)

    # pixel_offset_y shifts the vertical pixel frame (used by tile-sharded
    # strip rendering: each device renders rows [off, off+strip_h) as local
    # rows [0, strip_h)); orig_height preserves the projection when a strip
    # camera is shorter than the full image.
    orig_h = camera.proj_height or camera.height
    xy = jnp.stack(
        [
            ndc2pix(p_proj[:, 0], camera.width),
            ndc2pix(p_proj[:, 1], orig_h) - pixel_offset_y,
        ],
        -1,
    )

    # getRect (auxiliary.h:46-56) over the tile grid.  radius_margin_px
    # inflates the rects for amortized binning (the blend re-applies the
    # exact current-pose rect test per slot).
    grid_x = (camera.width + tw - 1) // tw
    grid_y = (camera.height + th - 1) // th
    xy_ng = jax.lax.stop_gradient(xy)
    rad_rect = radius_f + radius_margin_px
    rect_min_x = jnp.clip(jnp.floor((xy_ng[:, 0] - rad_rect) / tw), 0, grid_x).astype(jnp.int32)
    rect_min_y = jnp.clip(jnp.floor((xy_ng[:, 1] - rad_rect) / th), 0, grid_y).astype(jnp.int32)
    rect_max_x = jnp.clip(jnp.floor((xy_ng[:, 0] + rad_rect + tw - 1) / tw), 0, grid_x).astype(jnp.int32)
    rect_max_y = jnp.clip(jnp.floor((xy_ng[:, 1] + rad_rect + th - 1) / th), 0, grid_y).astype(jnp.int32)

    tiles_touched = (rect_max_x - rect_min_x) * (rect_max_y - rect_min_y)
    valid = in_frustum & det_valid & (tiles_touched > 0)
    if active is not None:
        valid = valid & active

    radius = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)
    tiles_touched = jnp.where(valid, tiles_touched, 0)

    return Preprocessed(
        xy=xy,
        depth=depth,
        conic=conic,
        radius=radius,
        rect_min=jnp.stack([rect_min_x, rect_min_y], -1),
        rect_max=jnp.stack([rect_max_x, rect_max_y], -1),
        valid=valid,
        tiles_touched=tiles_touched,
    )
