"""Fabricate tiny on-disk datasets mimicking the Replica / ScanNet layouts
(README.md:69-139 of the reference) for loader + end-to-end tests."""
import json
import os

import imageio.v2 as imageio
import numpy as np


def make_scene_images(n_frames, W=64, H=48, f=40.0):
    """Procedural room: textured wall at z=2.5 + floor, camera translating
    in +x.  Returns per-frame (color uint8 HWC, depth float m, c2w)."""
    frames = []
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    cx, cy = W / 2, H / 2
    dirx = (xs - cx) / f
    diry = (ys - cy) / f
    for t in range(n_frames):
        cam_x = 0.02 * t
        # wall plane z=2.5 in world; camera at (cam_x, 0, 0) looking +z
        z_wall = 2.5
        wx = dirx * z_wall + cam_x
        wy = diry * z_wall
        # floor plane y=1.0: z = 1.0/diry for diry>0
        with np.errstate(divide="ignore", invalid="ignore"):
            z_floor = np.where(diry > 0.05, 1.0 / np.maximum(diry, 1e-6), np.inf)
        depth = np.minimum(z_wall, z_floor)
        hit_floor = z_floor < z_wall
        fx_ = dirx * depth + cam_x
        fz_ = depth
        checker = ((np.floor(wx * 4) + np.floor(wy * 4)) % 2).astype(np.float32)
        color = np.stack(
            [0.2 + 0.6 * checker, 0.3 + 0.4 * (wx % 1), 0.5 * np.ones_like(wx)], -1
        )
        floor_col = np.stack(
            [0.4 * np.ones_like(fx_), 0.2 + 0.3 * ((fx_ * 2) % 1), 0.2 + 0.3 * ((fz_ * 2) % 1)],
            -1,
        )
        color = np.where(hit_floor[..., None], floor_col, color)
        label = np.where(hit_floor, 2, np.where(checker > 0.5, 1, 3)).astype(np.int64)
        c2w = np.eye(4)
        c2w[0, 3] = cam_x
        frames.append(
            (np.clip(color * 255, 0, 255).astype(np.uint8), depth.astype(np.float32), c2w, label)
        )
    return frames


REPLICA_TREE_JSON = {
    # base-id_name -> list of per-level {id: name}; 2-level tree over 4 classes
    "0_void": [{"0": "structure"}, {"0": "void"}],
    "1_wall": [{"0": "structure"}, {"1": "wall"}],
    "2_floor": [{"0": "structure"}, {"2": "floor"}],
    "3_panel": [{"1": "object"}, {"3": "panel"}],
}


def fabricate_replica(root, n_frames=8, W=64, H=48, semantic=True):
    seq = os.path.join(root, "room_test")
    os.makedirs(os.path.join(seq, "results"), exist_ok=True)
    frames = make_scene_images(n_frames, W, H)
    traj = []
    for i, (color, depth, c2w, label) in enumerate(frames):
        imageio.imwrite(os.path.join(seq, "results", f"frame{i:06d}.jpg"), color, quality=95)
        d16 = np.clip(depth * 6553.5, 0, 65535).astype(np.uint16)
        imageio.imwrite(os.path.join(seq, "results", f"depth{i:06d}.png"), d16)
        traj.append(" ".join(str(v) for v in c2w.reshape(-1)))
    with open(os.path.join(seq, "traj.txt"), "w") as fh:
        fh.write("\n".join(traj))
    if semantic:
        os.makedirs(os.path.join(seq, "semantic_class"), exist_ok=True)
        for i, (_, _, _, label) in enumerate(frames):
            imageio.imwrite(
                os.path.join(seq, "semantic_class", f"semantic_class_{i}.png"),
                label.astype(np.uint8),
            )
        with open(os.path.join(seq, "info_semantic_tree.json"), "w") as fh:
            json.dump(REPLICA_TREE_JSON, fh)
    cam_cfg = {
        "dataset_name": "replica_semantic" if semantic else "replica",
        "camera_params": {
            "image_height": H,
            "image_width": W,
            "fx": 40.0,
            "fy": 40.0,
            "cx": W / 2,
            "cy": H / 2,
            "png_depth_scale": 6553.5,
        },
    }
    return root, "room_test", cam_cfg


def fabricate_scannet(root, n_frames=4, W=64, H=48, semantic=True):
    seq = os.path.join(root, "scene0000_00")
    for d in ("color", "depth", "pose", "label-filt"):
        os.makedirs(os.path.join(seq, d), exist_ok=True)
    frames = make_scene_images(n_frames, W, H)
    for i, (color, depth, c2w, label) in enumerate(frames):
        imageio.imwrite(os.path.join(seq, "color", f"{i}.jpg"), color, quality=95)
        d16 = np.clip(depth * 1000.0, 0, 65535).astype(np.uint16)
        imageio.imwrite(os.path.join(seq, "depth", f"{i}.png"), d16)
        np.savetxt(os.path.join(seq, "pose", f"{i}.txt"), c2w)
        # raw ids 100x the class id to exercise the raw->nyu40 LUT
        imageio.imwrite(
            os.path.join(seq, "label-filt", f"{i}.png"), (label * 100).astype(np.uint16)
        )
    if semantic:
        # raw->nyu40 TSV (cols 0..7) and 4-level tree TSV (cols 0..24)
        header = "\t".join(f"c{i}" for i in range(25))
        lines = [header]
        tree_lines = [header]
        for raw, nyu in [(0, 0), (100, 1), (200, 2), (300, 3)]:
            row = ["0"] * 25
            row[0], row[4] = str(raw), str(nyu)
            row[1] = row[7] = f"class{nyu}"
            lines.append("\t".join(row))
            trow = ["0"] * 25
            trow[0], trow[4], trow[7] = str(raw), str(nyu), f"class{nyu}"
            trow[17], trow[18] = str(nyu % 2), f"l1_{nyu % 2}"
            trow[19], trow[20] = str(nyu), f"l2_{nyu}"
            trow[21], trow[22] = str(nyu), f"l3_{nyu}"
            trow[23], trow[24] = str(nyu), f"l4_{nyu}"
            tree_lines.append("\t".join(trow))
        with open(os.path.join(root, "scannetv2-labels.combined.tsv"), "w") as fh:
            fh.write("\n".join(lines))
        with open(os.path.join(root, "scannetv2-labels.combined.tree.tsv"), "w") as fh:
            fh.write("\n".join(tree_lines))
        # 5-level large tree keyed by SPARSE raw ids (cols 17-26)
        header5 = "\t".join(f"c{i}" for i in range(27))
        large_lines = [header5]
        for raw, nyu in [(0, 0), (100, 1), (200, 2), (300, 3)]:
            lrow = ["0"] * 27
            lrow[0], lrow[1] = str(raw), f"raw{raw}"
            lrow[4], lrow[7] = str(nyu), f"class{nyu}"
            lrow[17], lrow[18] = str(nyu % 2), f"l1_{nyu % 2}"
            for lv in range(1, 5):
                lrow[17 + 2 * lv] = str(nyu)
                lrow[18 + 2 * lv] = f"l{lv + 1}_{nyu}"
            large_lines.append("\t".join(lrow))
        with open(
            os.path.join(root, "scannetv2-labels.combined.tree-large.tsv"), "w"
        ) as fh:
            fh.write("\n".join(large_lines))
    cam_cfg = {
        "dataset_name": "scannet_semantic" if semantic else "scannet",
        "camera_params": {
            "image_height": H,
            "image_width": W,
            "fx": 40.0,
            "fy": 40.0,
            "cx": W / 2,
            "cy": H / 2,
            "png_depth_scale": 1000.0,
        },
    }
    return root, "scene0000_00", cam_cfg
