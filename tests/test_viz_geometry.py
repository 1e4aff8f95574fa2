"""Headless tests of the interactive-replay geometry (viz/geometry.py)."""
import numpy as np
import pytest
import jax.numpy as jnp

from hierslam_tpu.viz import geometry as VG


def test_rgbd_roundtrip():
    """Back-projected points must land at the correct world positions."""
    H, W, f = 24, 32, 20.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    depth = np.full((H, W), 2.0, np.float32)
    im = np.ones((3, H, W), np.float32) * 0.5
    w2c = np.eye(4)
    w2c[0, 3] = 0.3  # camera shifted -0.3 in world x
    pts, cols = VG.rgbd_to_pointcloud(im, depth, K, w2c)
    assert pts.shape[0] == H * W
    np.testing.assert_allclose(pts[:, 2], 2.0, atol=1e-6)
    # center pixel ray: x_cam=0 -> world x = -0.3
    center = pts.reshape(H, W, 3)[H // 2, W // 2]
    np.testing.assert_allclose(center[0], -0.3, atol=1e-6)
    assert np.all((cols >= 0) & (cols <= 1))


def test_frustum_geometry():
    K = np.array([[40.0, 0, 32], [0, 40.0, 24], [0, 0, 1.0]])
    verts, lines = VG.camera_frustum_geometry(64, 48, K, np.eye(4), size=0.1)
    assert verts.shape == (5, 3) and lines.shape == (8, 2)
    np.testing.assert_allclose(verts[0], 0.0, atol=1e-9)  # apex at center
    np.testing.assert_allclose(verts[1:, 2], 0.1, atol=1e-9)
    # corners symmetric about the principal axis
    np.testing.assert_allclose(verts[1, :2], -verts[3, :2], atol=1e-9)


def test_trajectory_geometry():
    w2cs = []
    for i in range(4):
        m = np.eye(4)
        m[0, 3] = -0.1 * i  # camera center at +0.1*i
        w2cs.append(m)
    verts, lines, colors = VG.trajectory_geometry(w2cs)
    assert verts.shape == (4, 3) and lines.shape == (3, 2) and colors.shape == (3, 3)
    np.testing.assert_allclose(verts[:, 0], [0, 0.1, 0.2, 0.3], atol=1e-9)
    assert (lines == np.array([[0, 1], [1, 2], [2, 3]])).all()


def test_replay_step_geometry():
    """Full step geometry over a synthetic params.npz-style dict."""
    rng = np.random.default_rng(0)
    n = 400
    params = {
        "means3D": np.stack(
            [rng.uniform(-1, 1, n), rng.uniform(-0.7, 0.7, n), rng.uniform(1, 3, n)], -1
        ).astype(np.float32),
        "rgb_colors": rng.uniform(0, 1, (n, 3)).astype(np.float32),
        "unnorm_rotations": np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32),
        "logit_opacities": rng.normal(2.0, 0.5, (n, 1)).astype(np.float32),
        "log_scales": np.log(rng.uniform(0.05, 0.12, (n, 1))).astype(np.float32),
        "timestep": np.zeros(n, np.float32),
        "cam_unnorm_rots": np.tile(
            np.array([1.0, 0, 0, 0], np.float32)[None, :, None], (1, 1, 3)
        ),
        "cam_trans": np.zeros((1, 3, 3), np.float32),
        "intrinsics": np.array([[40.0, 0, 32], [0, 40.0, 24], [0, 0, 1]]),
        "w2c": np.eye(4),
        "org_width": np.asarray(64),
        "org_height": np.asarray(48),
    }
    cfg = {"raster": dict(max_per_tile=128, gaussian_chunk=32, tile_batch=2)}
    g = VG.replay_step_geometry(params, cfg, t=2, viz_scale=0.5, pcd_stride=2)
    assert g["points"].shape[0] > 0
    assert g["points"].shape == g["colors"].shape
    assert g["frustum_verts"].shape == (5, 3)
    assert g["traj_verts"].shape == (3, 3)
    assert g["traj_lines"].shape == (2, 2)
    assert np.isfinite(g["points"]).all()


@pytest.mark.slow
def test_replay_step_geometry_semantic():
    """Interactive SEMANTIC replay geometry: points colored by decoded
    labels (viz_scripts/online_recon_sem_replica.py:199-338 equivalent),
    via both the 1x1-conv MLP decode and the per-level tree decode."""
    rng = np.random.default_rng(1)
    n, S = 300, 8
    sem = np.zeros((n, S), np.float32)
    # two confident classes at level-0 (3 classes) + leaf (5 classes)
    sem[: n // 2, 0] = 5.0
    sem[: n // 2, 3] = 5.0
    sem[n // 2 :, 1] = 5.0
    sem[n // 2 :, 4] = 5.0
    params = {
        "means3D": np.stack(
            [rng.uniform(-1, 1, n), rng.uniform(-0.7, 0.7, n), rng.uniform(1, 3, n)], -1
        ).astype(np.float32),
        "rgb_colors": rng.uniform(0, 1, (n, 3)).astype(np.float32),
        "unnorm_rotations": np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32),
        "logit_opacities": rng.normal(2.0, 0.5, (n, 1)).astype(np.float32),
        "log_scales": np.log(rng.uniform(0.05, 0.12, (n, 1))).astype(np.float32),
        "semantic": sem,
        "timestep": np.zeros(n, np.float32),
        "cam_unnorm_rots": np.tile(
            np.array([1.0, 0, 0, 0], np.float32)[None, :, None], (1, 1, 3)
        ),
        "cam_trans": np.zeros((1, 3, 3), np.float32),
        "intrinsics": np.array([[40.0, 0, 32], [0, 40.0, 24], [0, 0, 1]]),
        "w2c": np.eye(4),
        "org_width": np.asarray(64),
        "org_height": np.asarray(48),
    }
    cfg = {"raster": dict(max_per_tile=128, gaussian_chunk=32, tile_batch=2)}
    cmap = (np.arange(5 * 3).reshape(5, 3) * 17 % 256).astype(np.uint8)

    # per-level tree decode (num_semantic = [3, 5(leaf)])
    g = VG.replay_step_geometry(
        params, cfg, t=1, viz_scale=0.5, pcd_stride=2,
        semantic=True, colormap=cmap, num_semantic=[3, 5],
    )
    assert g["sem_colors"] is not None
    assert g["sem_colors"].shape == g["points"].shape
    assert np.isfinite(g["sem_colors"]).all()
    # colors come from the palette (only rows 3 and 4 are dominant leaves)
    pal = cmap.astype(np.float64) / 255.0
    d = np.min(
        np.linalg.norm(g["sem_colors"][:, None, :] - pal[None], axis=-1), axis=1
    )
    assert d.max() < 0.25  # blended edges can mix palette colors

    # MLP decode: identity-ish decoder picking leaf rows from channels 3:8
    mlp = {"w": np.eye(S, dtype=np.float32)[3:8], "b": np.zeros(5, np.float32)}
    g2 = VG.replay_step_geometry(
        params, cfg, t=1, viz_scale=0.5, pcd_stride=2,
        semantic=True, colormap=cmap, mlp=mlp,
    )
    assert g2["sem_colors"] is not None
    assert g2["sem_colors"].shape == g2["points"].shape

    # rgb path unchanged by the new kwargs
    g3 = VG.replay_step_geometry(params, cfg, t=1, viz_scale=0.5, pcd_stride=2)
    assert g3["sem_colors"] is None
