"""Reconstruction replay from `params.npz` (viz_scripts/ of the reference).

Two backends:

* **Open3D interactive** (`interactive_replay`) — the direct equivalent of
  viz_scripts/online_recon.py / final_recon.py: per-timestep Gaussian
  subsets (via the saved ``timestep`` field, online_recon.py:72-103),
  rendered RGB-D back-projected to a colored point cloud plus camera
  frustums and trajectory linesets.  Gated on open3d being installed.
* **Offline video frames** (`render_trajectory_frames`) — renders the
  final map along the estimated trajectory to PNG frames (works headless;
  used in CI / this environment where open3d is unavailable).
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def _subset(params: Dict[str, np.ndarray], upto_timestep: Optional[int]):
    if upto_timestep is None or "timestep" not in params:
        return params
    keep = params["timestep"] <= upto_timestep
    out = dict(params)
    for k in ("means3D", "rgb_colors", "unnorm_rotations", "logit_opacities",
              "log_scales", "semantic", "timestep"):
        if k in out and out[k].ndim >= 1 and out[k].shape[0] == keep.shape[0]:
            out[k] = out[k][keep]
    return out


def render_trajectory_frames(
    params: Dict[str, np.ndarray],
    out_dir: str,
    config: Dict,
    every: int = 30,
    viz_scale: float = 0.5,
    online: bool = False,
    semantic: bool = False,
    mlp: Optional[Dict] = None,
    colormap: Optional[np.ndarray] = None,
    num_semantic=None,
):
    """Render RGB(+semantic) frames of the map along the saved trajectory."""
    import imageio.v2 as imageio
    import jax
    import jax.numpy as jnp

    from hierslam_tpu.config import raster_config
    from hierslam_tpu.core.camera import setup_camera
    from hierslam_tpu.eval.metrics import decode_tree_labels
    from hierslam_tpu.slam.losses import mlp_apply, render_gaussians

    os.makedirs(out_dir, exist_ok=True)
    H = int(params["org_height"])
    W = int(params["org_width"])
    vh, vw = int(H * viz_scale), int(W * viz_scale)
    K = params["intrinsics"][:3, :3].copy()
    K[0] *= vw / W
    K[1] *= vh / H
    camera = setup_camera(vw, vh, K, params["w2c"])
    rc = raster_config(config)

    n_frames = params["cam_unnorm_rots"].shape[-1]
    for t in range(0, n_frames, every):
        p = _subset(params, t if online else None)
        gauss = {k: jnp.asarray(v) for k, v in p.items()
                 if k in ("means3D", "rgb_colors", "unnorm_rotations",
                          "logit_opacities", "log_scales", "semantic")}
        q = jnp.asarray(p["cam_unnorm_rots"][0, :, t])
        tr = jnp.asarray(p["cam_trans"][0, :, t])
        out = render_gaussians(
            gauss, None, q, tr, camera, rc,
            with_semantic=semantic and "semantic" in gauss,
            gaussians_grad=False, camera_grad=False,
        )
        rgb = (np.clip(np.asarray(out.im).transpose(1, 2, 0), 0, 1) * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(out_dir, f"recon_{t:04d}.png"), rgb)
        if semantic and out.semantic is not None and colormap is not None:
            sem = np.asarray(out.semantic)
            if mlp is not None:
                labels = np.argmax(
                    np.asarray(mlp_apply({k: jnp.asarray(v) for k, v in mlp.items()},
                                         out.semantic)), 0)
            elif isinstance(num_semantic, (list, tuple)):
                labels = decode_tree_labels(sem, list(num_semantic))[-1]
            else:
                labels = np.argmax(sem, 0)
            vis = colormap[np.clip(labels, 0, len(colormap) - 1)][..., :3].astype(np.uint8)
            imageio.imwrite(os.path.join(out_dir, f"sem_{t:04d}.png"), vis)
    return out_dir


def interactive_replay(
    params: Dict[str, np.ndarray],
    config: Dict,
    every: int = 1,
    online: bool = True,
    viz_scale: float = 0.5,
    pcd_stride: int = 2,
    fps: float = 10.0,
    semantic: bool = False,
    mlp: Optional[Dict] = None,
    colormap: Optional[np.ndarray] = None,
    num_semantic=None,
):
    """Open3D interactive replay (viz_scripts/online_recon.py:184-338).

    With ``semantic=True`` the point cloud is colored by decoded semantic
    labels (MLP or per-level tree decode + palette) — the equivalent of
    viz_scripts/online_recon_sem_replica.py / ..._scannet_large.py.

    All geometry comes from the display-independent functions in
    hierslam_tpu.viz.geometry (unit-tested headlessly); this wrapper only
    owns the Open3D objects and the window loop.
    """
    try:
        import open3d as o3d
    except ImportError as e:
        raise ImportError(
            "open3d is required for interactive replay; use "
            "render_trajectory_frames for headless rendering"
        ) from e
    import time

    from hierslam_tpu.viz.geometry import replay_step_geometry

    n_frames = params["cam_unnorm_rots"].shape[-1]
    vis = o3d.visualization.Visualizer()
    H = int(params["org_height"] * viz_scale)
    W = int(params["org_width"] * viz_scale)
    vis.create_window(width=W, height=H, visible=True)

    pcd = o3d.geometry.PointCloud()
    frustum = o3d.geometry.LineSet()
    traj = o3d.geometry.LineSet()
    added = False
    for t in range(0, n_frames, every):
        g = replay_step_geometry(
            params, config, t, online=online, viz_scale=viz_scale,
            pcd_stride=pcd_stride, semantic=semantic, mlp=mlp,
            colormap=colormap, num_semantic=num_semantic,
        )
        pcd.points = o3d.utility.Vector3dVector(g["points"])
        pcd.colors = o3d.utility.Vector3dVector(
            g["sem_colors"] if g.get("sem_colors") is not None else g["colors"]
        )
        frustum.points = o3d.utility.Vector3dVector(g["frustum_verts"])
        frustum.lines = o3d.utility.Vector2iVector(g["frustum_lines"])
        frustum.paint_uniform_color([0.0, 0.8, 0.8])
        traj.points = o3d.utility.Vector3dVector(g["traj_verts"])
        traj.lines = o3d.utility.Vector2iVector(g["traj_lines"])
        if len(g["traj_colors"]):
            traj.colors = o3d.utility.Vector3dVector(g["traj_colors"])
        if not added:
            for geom in (pcd, frustum, traj):
                vis.add_geometry(geom)
            added = True
        else:
            for geom in (pcd, frustum, traj):
                vis.update_geometry(geom)
        if not vis.poll_events():
            break
        vis.update_renderer()
        time.sleep(1.0 / fps)
    vis.run()  # stay interactive after the replay (final_recon.py behavior)
    vis.destroy_window()
