"""Pure-array geometry for reconstruction replay (testable headlessly).

The Open3D interactive replay of the reference (viz_scripts/online_recon.py:
184-338, final_recon.py) is split here into display-independent functions
that return vertex / line / color arrays; `recon.interactive_replay` merely
wraps them in Open3D objects and a window loop.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np


def rgbd_to_pointcloud(
    im: np.ndarray,       # [3, H, W] in [0, 1]
    depth: np.ndarray,    # [H, W] meters
    intrinsics: np.ndarray,  # [3, 3]
    w2c: np.ndarray,      # [4, 4]
    stride: int = 1,
    max_depth: float = 1e6,
) -> Tuple[np.ndarray, np.ndarray]:
    """Back-project a rendered RGB-D frame to a world-frame colored point
    cloud (rgbd2pcd, viz_scripts/online_recon.py:106-127).

    Returns (points [M, 3] float64, colors [M, 3] in [0, 1])."""
    H, W = depth.shape
    ys, xs = np.meshgrid(
        np.arange(0, H, stride), np.arange(0, W, stride), indexing="ij"
    )
    d = depth[ys, xs]
    valid = (d > 0) & (d < max_depth)
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    x_cam = (xs - cx) / fx * d
    y_cam = (ys - cy) / fy * d
    pts_cam = np.stack([x_cam, y_cam, d, np.ones_like(d)], -1)[valid]
    c2w = np.linalg.inv(w2c)
    pts = (pts_cam @ c2w.T)[:, :3]
    cols = im[:, ys, xs].transpose(1, 2, 0)[valid]
    return pts, np.clip(cols, 0, 1)


def camera_frustum_geometry(
    width: int, height: int, intrinsics: np.ndarray, w2c: np.ndarray,
    size: float = 0.045,
) -> Tuple[np.ndarray, np.ndarray]:
    """Camera-frustum wireframe (o3d LineSet.create_camera_visualization
    equivalent, online_recon.py:252): apex at the camera center, 4 image
    corners back-projected to depth ``size``.

    Returns (vertices [5, 3], lines [8, 2] int)."""
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    corners_px = np.array(
        [[0.0, 0.0], [width, 0.0], [width, height], [0.0, height]]
    )
    x = (corners_px[:, 0] - cx) / fx * size
    y = (corners_px[:, 1] - cy) / fy * size
    cam_pts = np.concatenate(
        [np.zeros((1, 3)), np.stack([x, y, np.full(4, size)], -1)], axis=0
    )
    c2w = np.linalg.inv(w2c)
    verts = cam_pts @ c2w[:3, :3].T + c2w[:3, 3]
    lines = np.array(
        [[0, 1], [0, 2], [0, 3], [0, 4], [1, 2], [2, 3], [3, 4], [4, 1]],
        np.int64,
    )
    return verts, lines


def trajectory_geometry(
    w2cs: List[np.ndarray], upto: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Trajectory polyline through the camera centers (online_recon.py:
    258-276): returns (vertices [T, 3], lines [T-1, 2], colors [T-1, 3]
    from the 'cool' colormap ramp the reference paints with)."""
    n = len(w2cs) if upto is None else min(upto + 1, len(w2cs))
    centers = np.stack([np.linalg.inv(w2cs[i])[:3, 3] for i in range(n)])
    if n < 2:
        return centers, np.zeros((0, 2), np.int64), np.zeros((0, 3))
    lines = np.stack([np.arange(n - 1), np.arange(1, n)], -1)
    t = np.arange(n - 1) / max(n - 1, 1)
    # matplotlib 'cool': (t, 1-t, 1) ramp
    colors = np.stack([t, 1.0 - t, np.ones_like(t)], -1)
    return centers, lines, colors


def subset_upto_timestep(params: Dict[str, np.ndarray], t: Optional[int]):
    """Per-timestep Gaussian subset via the saved ``timestep`` field
    (online_recon.py:72-103)."""
    if t is None or "timestep" not in params:
        return params
    keep = params["timestep"] <= t
    out = dict(params)
    for k in ("means3D", "rgb_colors", "unnorm_rotations", "logit_opacities",
              "log_scales", "semantic", "timestep"):
        if k in out and out[k].ndim >= 1 and out[k].shape[0] == keep.shape[0]:
            out[k] = out[k][keep]
    return out


def semantic_point_colors(
    sem_img: np.ndarray,          # [S, H, W] rendered semantic channels
    colormap: np.ndarray,         # [num_classes, >=3] palette (0-255 or 0-1)
    mlp: Optional[Dict] = None,
    num_semantic=None,
) -> np.ndarray:
    """Decode rendered semantic channels to per-pixel palette colors
    ([H, W, 3] in [0, 1]) — the in-window-loop decode of the reference's
    semantic replay (viz_scripts/online_recon_sem_replica.py:199-338):
    1x1-conv MLP -> argmax leaf when a decoder is given, else per-level
    tree decode (transfer_tree_2_label semantics), else flat argmax."""
    import jax.numpy as jnp

    from hierslam_tpu.eval.metrics import decode_tree_labels
    from hierslam_tpu.slam.losses import mlp_apply

    if mlp is not None:
        labels = np.argmax(
            np.asarray(
                mlp_apply({k: jnp.asarray(v) for k, v in mlp.items()},
                          jnp.asarray(sem_img))
            ),
            0,
        )
    elif isinstance(num_semantic, (list, tuple)):
        labels = decode_tree_labels(sem_img, list(num_semantic))[-1]
    else:
        labels = np.argmax(sem_img, 0)
    cmap = np.asarray(colormap, np.float64)[:, :3]
    if cmap.max() > 1.0:
        cmap = cmap / 255.0
    return cmap[np.clip(labels, 0, len(cmap) - 1)]


def replay_step_geometry(
    params: Dict[str, np.ndarray],
    config: Dict,
    t: int,
    online: bool = True,
    viz_scale: float = 0.5,
    pcd_stride: int = 1,
    frustum_size: float = 0.045,
    semantic: bool = False,
    mlp: Optional[Dict] = None,
    colormap: Optional[np.ndarray] = None,
    num_semantic=None,
):
    """All display-independent geometry for replay step ``t``: the rendered
    map point cloud at the estimated pose, the camera frustum wireframe and
    the trajectory-so-far polyline.

    With ``semantic=True`` (and a palette) the semantic channels are
    rendered and decoded too, and the result carries ``sem_colors`` aligned
    with ``points`` — the interactive semantic replay of
    viz_scripts/online_recon_sem_replica.py / ..._scannet_large.py.

    Returns a dict of numpy arrays (points/colors/frustum/trajectory)."""
    import jax.numpy as jnp

    from hierslam_tpu.config import raster_config
    from hierslam_tpu.core.camera import setup_camera
    from hierslam_tpu.core.transforms import build_w2c, normalize
    from hierslam_tpu.slam.losses import render_gaussians

    H = int(params["org_height"])
    W = int(params["org_width"])
    vh, vw = int(H * viz_scale), int(W * viz_scale)
    K = params["intrinsics"][:3, :3].copy()
    K[0] *= vw / W
    K[1] *= vh / H
    camera = setup_camera(vw, vh, K, params["w2c"])
    rc = raster_config(config)

    with_sem = semantic and "semantic" in params
    p = subset_upto_timestep(params, t if online else None)
    gauss = {k: jnp.asarray(v) for k, v in p.items()
             if k in ("means3D", "rgb_colors", "unnorm_rotations",
                      "logit_opacities", "log_scales", "semantic")}
    q = jnp.asarray(p["cam_unnorm_rots"][0, :, t])
    tr = jnp.asarray(p["cam_trans"][0, :, t])
    out = render_gaussians(
        gauss, None, q, tr, camera, rc,
        with_semantic=with_sem, gaussians_grad=False, camera_grad=False,
    )
    est_w2c = np.asarray(build_w2c(normalize(q), tr))
    # the render is already in the est-pose camera frame -> w2c = identity
    pts, cols = rgbd_to_pointcloud(
        np.asarray(out.im), np.asarray(out.depth), K, np.eye(4), pcd_stride
    )
    sem_cols = None
    if with_sem and out.semantic is not None and colormap is not None:
        sem_rgb = semantic_point_colors(
            np.asarray(out.semantic), colormap, mlp=mlp, num_semantic=num_semantic
        )  # [H, W, 3]
        # subsample/mask exactly like the RGB point colors
        d = np.asarray(out.depth)
        ys, xs = np.meshgrid(
            np.arange(0, d.shape[0], pcd_stride),
            np.arange(0, d.shape[1], pcd_stride), indexing="ij",
        )
        valid = d[ys, xs] > 0
        sem_cols = sem_rgb[ys, xs][valid]
    # move to world through the estimated pose
    c2w = np.linalg.inv(est_w2c)
    pts = pts @ c2w[:3, :3].T + c2w[:3, 3]

    all_w2cs = [
        np.asarray(build_w2c(
            normalize(jnp.asarray(params["cam_unnorm_rots"][0, :, i])),
            jnp.asarray(params["cam_trans"][0, :, i]),
        ))
        for i in range(t + 1)
    ]
    fr_verts, fr_lines = camera_frustum_geometry(vw, vh, K, est_w2c, frustum_size)
    tr_verts, tr_lines, tr_cols = trajectory_geometry(all_w2cs)
    return {
        "points": pts, "colors": cols, "sem_colors": sem_cols,
        "frustum_verts": fr_verts, "frustum_lines": fr_lines,
        "traj_verts": tr_verts, "traj_lines": tr_lines, "traj_colors": tr_cols,
    }
