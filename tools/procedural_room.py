"""Procedural Replica-shaped RGB-D+semantic sequence at full resolution.

A high-fidelity stand-in for Replica room0 in environments without the
real dataset (VERDICT round-1 item 3): ray-cast textured room geometry
(4 walls + floor + ceiling + boxes + spheres), multi-frequency textures,
per-primitive semantic labels over a 2-level tree, and a translating +
yawing camera trajectory.  Written in the Replica directory layout
(results/frame*.jpg + depth*.png + traj.txt + semantic_class/ +
info_semantic_tree.json) so the standard loader consumes it unchanged.

    python tools/procedural_room.py /tmp/proc_room --frames 200 --w 1200 --h 680
"""
import argparse
import json
import os

import numpy as np


# primitive id -> (tree level-0 group, leaf class)
PRIMS = {
    0: ("structure", "wall"),
    1: ("structure", "floor"),
    2: ("structure", "ceiling"),
    3: ("furniture", "box"),
    4: ("furniture", "sphere"),
    5: ("furniture", "tall_box"),
}


def tree_json():
    groups = {"structure": 0, "furniture": 1}
    out = {}
    for leaf_id, (g, name) in PRIMS.items():
        out[f"{leaf_id}_{name}"] = [
            {str(groups[g]): g}, {str(leaf_id): name}
        ]
    return out


def _texture(u, v, seed):
    """Multi-frequency procedural texture in [0, 1]^3."""
    t1 = 0.5 + 0.5 * np.sin(2 * np.pi * (u * 1.5 + seed))
    t2 = ((np.floor(u * 6) + np.floor(v * 6)) % 2)
    t3 = 0.5 + 0.5 * np.sin(2 * np.pi * (v * 11.0 + 2 * seed) + 3 * u)
    r = 0.25 + 0.5 * (0.5 * t1 + 0.5 * t2)
    g = 0.25 + 0.5 * (0.6 * t2 + 0.4 * t3)
    b = 0.25 + 0.5 * (0.7 * t3 + 0.3 * t1)
    return np.stack([r, g, b], -1)


def _intersect_plane(o, d, p0, n):
    """Ray-plane: t such that (o + t d - p0).n = 0 (inf if parallel/behind)."""
    denom = d @ n
    t = np.where(np.abs(denom) > 1e-8, ((p0 - o) @ n) / np.where(
        np.abs(denom) > 1e-8, denom, 1.0), np.inf)
    return np.where(t > 0.05, t, np.inf)


def _intersect_sphere(o, d, c, r):
    oc = o - c
    b = d @ oc
    disc = b * b - (oc @ oc - r * r)
    sq = np.sqrt(np.maximum(disc, 0.0))
    t = -b - sq
    t = np.where((disc > 0) & (t > 0.05), t, np.inf)
    return t


def _intersect_box(o, d, lo, hi):
    """Axis-aligned slab test; returns entry t (inf on miss)."""
    inv = 1.0 / np.where(np.abs(d) > 1e-9, d, 1e-9)
    t0 = (lo - o) * inv
    t1 = (hi - o) * inv
    tmin = np.minimum(t0, t1).max(-1)
    tmax = np.maximum(t0, t1).min(-1)
    hit = (tmax > np.maximum(tmin, 0.05))
    return np.where(hit, np.where(tmin > 0.05, tmin, tmax), np.inf)


def render_frame(t_idx, W, H, fx, fy, cx, cy, n_frames):
    # camera: slow forward arc with yaw (room ~6 x 3 x 6 m, camera inside)
    ang = 0.6 * np.sin(2 * np.pi * t_idx / max(n_frames, 1))
    cam_pos = np.array([
        1.2 * np.sin(2 * np.pi * t_idx / max(n_frames, 1)),
        -0.2,
        -1.0 + 0.8 * np.cos(2 * np.pi * t_idx / max(n_frames, 1)),
    ])
    cy_, sy_ = np.cos(ang), np.sin(ang)
    R_c2w = np.array([[cy_, 0, sy_], [0, 1, 0], [-sy_, 0, cy_]])

    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    dirs_cam = np.stack(
        [(xs - cx) / fx, (ys - cy) / fy, np.ones_like(xs, np.float64)], -1
    )
    dirs = dirs_cam @ R_c2w.T
    P = H * W
    d = dirs.reshape(P, 3)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    o = cam_pos

    best_t = np.full(P, np.inf)
    best_id = np.zeros(P, np.int64)
    best_uv = np.zeros((P, 2))

    planes = [
        # (p0, n, prim_id, uv axes)
        (np.array([0, 0, 3.0]), np.array([0, 0, -1.0]), 0, (0, 1)),   # back wall
        (np.array([0, 0, -3.0]), np.array([0, 0, 1.0]), 0, (0, 1)),   # front wall
        (np.array([-3.0, 0, 0]), np.array([1.0, 0, 0]), 0, (2, 1)),   # left
        (np.array([3.0, 0, 0]), np.array([-1.0, 0, 0]), 0, (2, 1)),   # right
        (np.array([0, 1.4, 0]), np.array([0, -1.0, 0]), 1, (0, 2)),   # floor
        (np.array([0, -1.6, 0]), np.array([0, 1.0, 0]), 2, (0, 2)),   # ceiling
    ]
    for p0, n, pid, (ua, va) in planes:
        t = _intersect_plane(o, d, p0, n)
        hit = t < best_t
        pts = o + t[:, None] * d
        best_uv = np.where(hit[:, None], pts[:, [ua, va]] * 0.5, best_uv)
        best_id = np.where(hit, pid, best_id)
        best_t = np.where(hit, t, best_t)

    boxes = [
        (np.array([-1.8, 0.6, 1.0]), np.array([-0.8, 1.4, 2.0]), 3),
        (np.array([0.8, 0.9, -0.5]), np.array([1.8, 1.4, 0.6]), 3),
        (np.array([2.0, -0.8, 1.2]), np.array([2.6, 1.4, 1.9]), 5),
    ]
    for lo, hi, pid in boxes:
        t = _intersect_box(o, d, lo, hi)
        hit = t < best_t
        pts = o + t[:, None] * d
        best_uv = np.where(hit[:, None], pts[:, [0, 1]] * 1.3, best_uv)
        best_id = np.where(hit, pid, best_id)
        best_t = np.where(hit, t, best_t)

    spheres = [
        (np.array([-0.3, 0.9, 0.6]), 0.5, 4),
        (np.array([1.2, 0.35, 1.8]), 0.35, 4),
    ]
    for c, r, pid in spheres:
        t = _intersect_sphere(o, d, c, r)
        hit = t < best_t
        pts = o + t[:, None] * d
        best_uv = np.where(hit[:, None], pts[:, [0, 1]] * 2.0, best_uv)
        best_id = np.where(hit, pid, best_id)
        best_t = np.where(hit, t, best_t)

    color = _texture(best_uv[:, 0], best_uv[:, 1], best_id * 0.37)
    # depth = z in CAMERA frame
    z_cam = (d @ R_c2w)[:, 2] * best_t
    depth = np.where(np.isfinite(best_t), z_cam, 0.0).reshape(H, W)
    label = best_id.reshape(H, W)
    c2w = np.eye(4)
    c2w[:3, :3] = R_c2w
    c2w[:3, 3] = cam_pos
    return (
        np.clip(color.reshape(H, W, 3) * 255, 0, 255).astype(np.uint8),
        depth.astype(np.float32),
        c2w,
        label,
    )


def generate(root, n_frames=200, W=1200, H=680, fx=None, fy=None):
    # Replica room0 FOV: fx=fy=600 at 1200px — scale with resolution
    fx = fx or 600.0 * W / 1200.0
    fy = fy or fx
    import imageio.v2 as imageio

    seq = os.path.join(root, "proc_room")
    os.makedirs(os.path.join(seq, "results"), exist_ok=True)
    os.makedirs(os.path.join(seq, "semantic_class"), exist_ok=True)
    cx, cy = (W - 1) / 2, (H - 1) / 2
    traj = []
    for i in range(n_frames):
        color, depth, c2w, label = render_frame(i, W, H, fx, fy, cx, cy, n_frames)
        imageio.imwrite(os.path.join(seq, "results", f"frame{i:06d}.jpg"),
                        color, quality=95)
        d16 = np.clip(depth * 6553.5, 0, 65535).astype(np.uint16)
        imageio.imwrite(os.path.join(seq, "results", f"depth{i:06d}.png"), d16)
        imageio.imwrite(os.path.join(seq, "semantic_class", f"semantic_class_{i}.png"),
                        label.astype(np.uint8))
        traj.append(" ".join(f"{v:.9f}" for v in c2w.reshape(-1)))
        if i % 25 == 0:
            print(f"frame {i}/{n_frames}", flush=True)
    with open(os.path.join(seq, "traj.txt"), "w") as fh:
        fh.write("\n".join(traj))
    with open(os.path.join(seq, "info_semantic_tree.json"), "w") as fh:
        json.dump(tree_json(), fh)
    print(f"wrote {n_frames} frames to {seq}")
    return seq


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--w", type=int, default=1200)
    ap.add_argument("--h", type=int, default=680)
    args = ap.parse_args()
    generate(args.root, args.frames, args.w, args.h)
