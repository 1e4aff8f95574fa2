"""Quaternion / rigid-transform math (pure jnp, differentiable).

Conventions match the reference implementation:

* quaternions are ``(w, x, y, z)`` real-first (utils/slam_external.py:25-42);
* ``build_rotation`` normalizes before converting;
* ``matrix_to_quaternion`` follows the pytorch3d branch-free construction
  (utils/slam_helpers.py:43-103).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(v: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """L2-normalize along ``axis`` (torch.nn.functional.normalize semantics:
    divides by max(norm, eps))."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, eps)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Unit-normalize quaternion(s) ``[..., 4]`` (w,x,y,z) -> rotation matrix
    ``[..., 3, 3]``.  Mirrors build_rotation (utils/slam_external.py:25-42)."""
    q = normalize(q)
    r, x, y, z = jnp.moveaxis(q, -1, 0)
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1)
    row1 = jnp.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1)
    row2 = jnp.stack([2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([row0, row1, row2], -2)


def quat_mult(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product of ``[..., 4]`` quaternions (utils/slam_helpers.py:21-28)."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    w = w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2
    x = w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2
    y = w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2
    z = w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2
    return jnp.stack([w, x, y, z], -1)


def _sqrt_positive_part(x: jax.Array) -> jax.Array:
    return jnp.where(x > 0, jnp.sqrt(jnp.maximum(x, 0.0)), 0.0)


def matrix_to_quaternion(matrix: jax.Array) -> jax.Array:
    """Rotation matrix ``[..., 3, 3]`` -> quaternion ``[..., 4]`` (w,x,y,z).

    Branch-free pytorch3d construction mirrored from
    utils/slam_helpers.py:43-103 (picks the best-conditioned of 4 candidates).
    """
    batch = matrix.shape[:-2]
    m = matrix.reshape(batch + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = jnp.moveaxis(m, -1, 0)

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            -1,
        )
    )

    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], -1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], -1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], -1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], -1),
        ],
        -2,
    )
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], 0.1))
    best = jnp.argmax(q_abs, axis=-1)
    return jnp.take_along_axis(
        quat_candidates, best[..., None, None].astype(jnp.int32), axis=-2
    ).squeeze(-2)


def build_w2c(cam_quat: jax.Array, cam_trans: jax.Array) -> jax.Array:
    """Camera pose parameters -> 4x4 world-to-camera matrix.

    ``rel_w2c[:3,:3] = R(normalize(q)); rel_w2c[:3,3] = t``
    (utils/slam_helpers.py:293-300).
    """
    R = quat_to_rotmat(cam_quat)
    top = jnp.concatenate([R, cam_trans[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def transform_points(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply a 4x4 homogeneous transform to ``[N, 3]`` points.

    f32-exact matmul: TPU XLA's default single-pass-bf16 MXU lowering
    would quantize world positions at ~4e-3 relative (millimeters at room
    scale) — far above the SLAM accuracy target."""
    return (
        jnp.dot(pts, T[:3, :3].T, precision=jax.lax.Precision.HIGHEST)
        + T[:3, 3]
    )


def transform_to_frame(
    means3D: jax.Array,
    unnorm_rotations: jax.Array,
    cam_quat: jax.Array,
    cam_trans: jax.Array,
    *,
    gaussians_grad: bool,
    camera_grad: bool,
    transform_rots: bool = False,
):
    """World-frame Gaussians -> camera-frame, with gradient routing.

    Reproduces transform_to_frame (utils/slam_helpers.py:278-330): during
    tracking only the camera pose gets gradient (``camera_grad=True``);
    during mapping only the Gaussians do. Isotropic Gaussians skip the
    quaternion transform (``transform_rots=False``), matching the reference
    (all shipped configs use isotropic Gaussians).
    """
    if not camera_grad:
        cam_quat = jax.lax.stop_gradient(cam_quat)
        cam_trans = jax.lax.stop_gradient(cam_trans)
    if not gaussians_grad:
        means3D = jax.lax.stop_gradient(means3D)
        unnorm_rotations = jax.lax.stop_gradient(unnorm_rotations)

    cam_quat_n = normalize(cam_quat)
    w2c = build_w2c(cam_quat_n, cam_trans)
    pts = transform_points(w2c, means3D)
    if transform_rots:
        rots = quat_mult(cam_quat_n, normalize(unnorm_rotations))
    else:
        rots = unnorm_rotations
    return pts, rots


def relative_transformation(trans_01: jax.Array, trans_02: jax.Array) -> jax.Array:
    """Pose of frame 2 relative to frame 1: ``inv(T_01) @ T_02``
    (datasets/gradslam_datasets/geometryutils.py:413)."""
    return jnp.linalg.inv(trans_01) @ trans_02
