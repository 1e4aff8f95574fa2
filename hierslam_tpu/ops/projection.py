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


class PrepCols(NamedTuple):
    """:class:`Preprocessed` as 1-D COLUMNS.

    TPU tiles 2-D f32 arrays as T(8, 128): any materialized [N, c<128]
    intermediate pads its minor dim to 128 lanes (a [1.5M, 1] column costs
    732MB, 128x its data).  XLA usually fuses such stacks away, but under
    rematerialized autodiff it materializes padded copies of every concat
    operand — at the mapping shape (V=1.5M visible budget) ~14 of them
    coexisted, 10GB of pure padding (the round-3 N=2M OOM).  The raster
    hot path therefore carries per-gaussian quantities as 1-D vectors
    (which tile losslessly) and assembles its single gather table in flat
    1-D space."""

    x: jax.Array           # [N] pixel-space mean x
    y: jax.Array           # [N] pixel-space mean y
    depth: jax.Array       # [N] camera-space z
    conic_a: jax.Array     # [N] inverse-covariance (a, b, c)
    conic_b: jax.Array
    conic_c: jax.Array
    radius: jax.Array      # [N] int32 screen radius (0 => culled)
    rect_min_x: jax.Array  # [N] int32 inclusive
    rect_min_y: jax.Array
    rect_max_x: jax.Array  # [N] int32 exclusive
    rect_max_y: jax.Array
    valid: jax.Array       # [N] bool
    tiles_touched: jax.Array  # [N] int32

    def stacked(self) -> Preprocessed:
        return Preprocessed(
            xy=jnp.stack([self.x, self.y], -1),
            depth=self.depth,
            conic=jnp.stack([self.conic_a, self.conic_b, self.conic_c], -1),
            radius=self.radius,
            rect_min=jnp.stack([self.rect_min_x, self.rect_min_y], -1),
            rect_max=jnp.stack([self.rect_max_x, self.rect_max_y], -1),
            valid=self.valid,
            tiles_touched=self.tiles_touched,
        )


def quat_scale_to_cov3d(rotations: jax.Array, scales: jax.Array, mod: float = 1.0) -> jax.Array:
    """R S S^T R^T world covariance (forward.cu:118-152). ``rotations`` are
    unit quaternions [N,4] (w,x,y,z); ``scales`` [N,3] positive."""
    from hierslam_tpu.core.transforms import quat_to_rotmat

    R = quat_to_rotmat(rotations)              # [N, 3, 3]
    M = R * (mod * scales)[:, None, :]         # R @ diag(s): scale columns
    # f32-exact (TPU default matmul is single-pass bf16)
    return jnp.matmul(
        M, jnp.swapaxes(M, -1, -2), precision=jax.lax.Precision.HIGHEST
    )                                          # [N, 3, 3]


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
    """Project Gaussians to screen space (stacked [N, c] convenience form)."""
    return preprocess_cols(
        means3D, scales, rotations, camera, tile_shape, active=active,
        cov3D_precomp=cov3D_precomp, pixel_offset_y=pixel_offset_y,
        radius_margin_px=radius_margin_px,
    ).stacked()


def preprocess_cols(
    means3D: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    camera,
    tile_shape: Tuple[int, int],
    active: jax.Array | None = None,
    cov3D_precomp: jax.Array | None = None,
    pixel_offset_y=0.0,
    radius_margin_px: float = 0.0,
) -> PrepCols:
    """Project Gaussians to screen space.

    ``means3D`` are world-frame (usually already the current camera frame
    with ``camera.w2c == I``, mirroring how the reference pre-transforms
    Gaussians in transform_to_frame, utils/slam_helpers.py:278-330).
    """
    th, tw = tile_shape
    n = means3D.shape[0]
    w2c = jnp.asarray(camera.w2c)
    full = jnp.asarray(camera.full_proj)

    # All per-gaussian math below is written in explicit elementwise form
    # over [N] vectors: batched [N, 2, 3] @ [N, 3, 3] tiny matmuls lower to
    # padded MXU ops that waste >90% of the array; the scalar expansion is
    # pure VPU work that XLA fuses into a handful of kernels.
    mx, my, mz = means3D[:, 0], means3D[:, 1], means3D[:, 2]

    def apply_row(M, r):
        return M[r, 0] * mx + M[r, 1] * my + M[r, 2] * mz + M[r, 3]

    pv_x = apply_row(w2c, 0)
    pv_y = apply_row(w2c, 1)
    depth = apply_row(w2c, 2)
    in_frustum = depth > 0.2  # auxiliary.h:139-162 (near cull only)

    ph_x = apply_row(full, 0)
    ph_y = apply_row(full, 1)
    ph_w = apply_row(full, 3)
    p_w = 1.0 / (ph_w + 1e-7)

    # EWA 2D covariance (forward.cu:74-113). The FoV clamp's zero-gradient
    # outside the limits reproduces the x_grad_mul factor of backward.cu:175.
    limx = 1.3 * camera.tan_fovx
    limy = 1.3 * camera.tan_fovy
    tz = depth
    safe_tz = jnp.where(tz == 0, 1.0, tz)
    inv_z = 1.0 / safe_tz
    inv_z2 = inv_z * inv_z
    tx = jnp.clip(pv_x * inv_z, -limx, limx) * tz
    ty = jnp.clip(pv_y * inv_z, -limy, limy) * tz
    fx, fy = camera.focal_x, camera.focal_y
    # J rows (2x3 projection Jacobian at the clamped mean):
    #   J0 = [fx/z, 0, -fx tx/z^2],  J1 = [0, fy/z, -fy ty/z^2]
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2
    # T = J @ W rows as [N] triples
    W = w2c[:3, :3]
    t0 = [j00 * W[0, c] + j02 * W[2, c] for c in range(3)]
    t1 = [j11 * W[1, c] + j12 * W[2, c] for c in range(3)]

    if cov3D_precomp is None:
        # cov2d = T cov3d T^T with cov3d = (R S)(R S)^T:
        # u = T0 R S, v = T1 R S -> c_xx = u.u, c_xy = u.v, c_yy = v.v
        from hierslam_tpu.core.transforms import normalize as _qnorm

        q = _qnorm(rotations)
        qr, qx, qy, qz = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
        R = [
            [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qr * qz), 2 * (qx * qz + qr * qy)],
            [2 * (qx * qy + qr * qz), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qr * qx)],
            [2 * (qx * qz - qr * qy), 2 * (qy * qz + qr * qx), 1 - 2 * (qx * qx + qy * qy)],
        ]
        s = [camera.scale_modifier * scales[:, c] for c in range(3)]
        u = [(t0[0] * R[0][c] + t0[1] * R[1][c] + t0[2] * R[2][c]) * s[c] for c in range(3)]
        v = [(t1[0] * R[0][c] + t1[1] * R[1][c] + t1[2] * R[2][c]) * s[c] for c in range(3)]
        c_xx = u[0] * u[0] + u[1] * u[1] + u[2] * u[2] + 0.3
        c_xy = u[0] * v[0] + u[1] * v[1] + u[2] * v[2]
        c_yy = v[0] * v[0] + v[1] * v[1] + v[2] * v[2] + 0.3
    else:
        cov3d = cov3D_precomp
        a0 = [
            t0[0] * cov3d[:, 0, c] + t0[1] * cov3d[:, 1, c] + t0[2] * cov3d[:, 2, c]
            for c in range(3)
        ]
        c_xx = a0[0] * t0[0] + a0[1] * t0[1] + a0[2] * t0[2] + 0.3
        c_xy = a0[0] * t1[0] + a0[1] * t1[1] + a0[2] * t1[2]
        b1 = [
            t1[0] * cov3d[:, 0, c] + t1[1] * cov3d[:, 1, c] + t1[2] * cov3d[:, 2, c]
            for c in range(3)
        ]
        c_yy = b1[0] * t1[0] + b1[1] * t1[1] + b1[2] * t1[2] + 0.3

    det = c_xx * c_yy - c_xy * c_xy
    det_valid = det != 0.0
    det_inv = 1.0 / jnp.where(det_valid, det, 1.0)
    conic_a = c_yy * det_inv
    conic_b = -c_xy * det_inv
    conic_c = c_xx * det_inv

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
    px = ndc2pix(ph_x * p_w, camera.width)
    py = ndc2pix(ph_y * p_w, orig_h) - pixel_offset_y

    # getRect (auxiliary.h:46-56) over the tile grid.  radius_margin_px
    # inflates the rects for amortized binning (the blend re-applies the
    # exact current-pose rect test per slot).
    grid_x = (camera.width + tw - 1) // tw
    grid_y = (camera.height + th - 1) // th
    px_ng = jax.lax.stop_gradient(px)
    py_ng = jax.lax.stop_gradient(py)
    rad_rect = radius_f + radius_margin_px
    rect_min_x = jnp.clip(jnp.floor((px_ng - rad_rect) / tw), 0, grid_x).astype(jnp.int32)
    rect_min_y = jnp.clip(jnp.floor((py_ng - rad_rect) / th), 0, grid_y).astype(jnp.int32)
    rect_max_x = jnp.clip(jnp.floor((px_ng + rad_rect + tw - 1) / tw), 0, grid_x).astype(jnp.int32)
    rect_max_y = jnp.clip(jnp.floor((py_ng + rad_rect + th - 1) / th), 0, grid_y).astype(jnp.int32)

    tiles_touched = (rect_max_x - rect_min_x) * (rect_max_y - rect_min_y)
    valid = in_frustum & det_valid & (tiles_touched > 0)
    if active is not None:
        valid = valid & active

    radius = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)
    tiles_touched = jnp.where(valid, tiles_touched, 0)

    return PrepCols(
        x=px,
        y=py,
        depth=depth,
        conic_a=conic_a,
        conic_b=conic_b,
        conic_c=conic_c,
        radius=radius,
        rect_min_x=rect_min_x,
        rect_min_y=rect_min_y,
        rect_max_x=rect_max_x,
        rect_max_y=rect_max_y,
        valid=valid,
        tiles_touched=tiles_touched,
    )
