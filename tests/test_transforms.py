import jax.numpy as jnp
import numpy as np

from hierslam_tpu.core import transforms as tf


def random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def test_quat_roundtrip():
    q = random_quats(32)
    # canonical sign: w >= 0
    q = np.where(q[:, :1] < 0, -q, q)
    R = np.asarray(tf.quat_to_rotmat(jnp.asarray(q)))
    q2 = np.asarray(tf.matrix_to_quaternion(jnp.asarray(R)))
    q2 = np.where(q2[:, :1] < 0, -q2, q2)
    np.testing.assert_allclose(q, q2, atol=1e-5)


def test_rotmat_orthonormal():
    q = random_quats(16, 1)
    R = np.asarray(tf.quat_to_rotmat(jnp.asarray(q)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_quat_mult_matches_matrix_product():
    qa, qb = random_quats(8, 2), random_quats(8, 3)
    Rab = np.asarray(tf.quat_to_rotmat(tf.quat_mult(jnp.asarray(qa), jnp.asarray(qb))))
    Ra = np.asarray(tf.quat_to_rotmat(jnp.asarray(qa)))
    Rb = np.asarray(tf.quat_to_rotmat(jnp.asarray(qb)))
    np.testing.assert_allclose(Rab, Ra @ Rb, atol=1e-5)


def test_build_w2c_and_transform():
    q = random_quats(1, 4)[0]
    t = np.array([0.3, -0.2, 1.5])
    T = np.asarray(tf.build_w2c(jnp.asarray(q), jnp.asarray(t)))
    assert T.shape == (4, 4)
    np.testing.assert_allclose(T[3], [0, 0, 0, 1], atol=0)
    pts = np.random.default_rng(5).normal(size=(10, 3))
    out = np.asarray(tf.transform_points(jnp.asarray(T), jnp.asarray(pts)))
    expected = pts @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_transform_to_frame_isotropic_keeps_rots():
    q = jnp.asarray(random_quats(5, 6))
    pts = jnp.asarray(np.random.default_rng(7).normal(size=(5, 3)))
    cam_q = jnp.asarray(random_quats(1, 8)[0])
    cam_t = jnp.asarray(np.array([0.1, 0.2, 0.3]))
    out_pts, out_rots = tf.transform_to_frame(
        pts, q, cam_q, cam_t, gaussians_grad=True, camera_grad=False, transform_rots=False
    )
    np.testing.assert_allclose(np.asarray(out_rots), np.asarray(q))
    w2c = tf.build_w2c(tf.normalize(cam_q), cam_t)
    np.testing.assert_allclose(
        np.asarray(out_pts), np.asarray(tf.transform_points(w2c, pts)), atol=1e-6
    )


def test_relative_transformation():
    rng = np.random.default_rng(9)
    A = np.eye(4)
    A[:3, :3] = np.asarray(tf.quat_to_rotmat(jnp.asarray(random_quats(1, 10)[0])))
    A[:3, 3] = rng.normal(size=3)
    rel = np.asarray(tf.relative_transformation(jnp.asarray(A), jnp.asarray(A)))
    np.testing.assert_allclose(rel, np.eye(4), atol=1e-5)
