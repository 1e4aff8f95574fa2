"""Remaining RGB-D loaders: TUM, ICL, Azure Kinect, Ai2Thor, Record3D,
RealSense, ScanNet++ (DSLR), NeRFCapture.

These differ from the base only in file layout / pose format, mirroring the
corresponding files under datasets/gradslam_datasets/ (tum.py, icl.py,
azure.py, ai2thor.py, record3d.py, realsense.py, scannetpp.py,
nerfcapture.py).
"""
from __future__ import annotations

import glob
import json
import os
from typing import Dict, List, Optional

import numpy as np

from hierslam_tpu.datasets.base import RGBDDataset, natsorted


def _quat_pose(pvec: np.ndarray) -> np.ndarray:
    """[tx ty tz qx qy qz qw] -> 4x4 c2w (tum.py:69-76)."""
    from scipy.spatial.transform import Rotation

    pose = np.eye(4)
    pose[:3, :3] = Rotation.from_quat(pvec[3:]).as_matrix()
    pose[:3, 3] = pvec[:3]
    return pose


class TUMDataset(RGBDDataset):
    """TUM RGB-D with timestamp association (tum.py:44-116): nearest-in-time
    rgb/depth/pose triplets within 0.08s, rate-limited to 32 fps."""

    def __init__(self, config_dict, basedir, sequence, **kwargs):
        self.input_folder = os.path.join(basedir, sequence)
        self._assoc = None
        super().__init__(config_dict, **kwargs)

    def _associate(self):
        if self._assoc is not None:
            return self._assoc
        folder = self.input_folder
        pose_list = os.path.join(folder, "groundtruth.txt")
        if not os.path.isfile(pose_list):
            pose_list = os.path.join(folder, "pose.txt")
        image_data = np.loadtxt(os.path.join(folder, "rgb.txt"), dtype=str)
        depth_data = np.loadtxt(os.path.join(folder, "depth.txt"), dtype=str)
        pose_data = np.loadtxt(pose_list, dtype=str, skiprows=1)
        t_img = image_data[:, 0].astype(np.float64)
        t_dep = depth_data[:, 0].astype(np.float64)
        t_pose = pose_data[:, 0].astype(np.float64)

        assoc = []
        for i, t in enumerate(t_img):
            j = int(np.argmin(np.abs(t_dep - t)))
            k = int(np.argmin(np.abs(t_pose - t)))
            if abs(t_dep[j] - t) < 0.08 and abs(t_pose[k] - t) < 0.08:
                assoc.append((i, j, k))
        # cap at 32 fps
        keep = [0]
        for i in range(1, len(assoc)):
            if t_img[assoc[i][0]] - t_img[assoc[keep[-1]][0]] > 1.0 / 32:
                keep.append(i)
        self._assoc = (
            [assoc[i] for i in keep],
            image_data,
            depth_data,
            pose_data[:, 1:].astype(np.float64),
        )
        return self._assoc

    def get_filepaths(self):
        assoc, image_data, depth_data, _ = self._associate()
        color = [os.path.join(self.input_folder, image_data[i, 1]) for i, _, _ in assoc]
        depth = [os.path.join(self.input_folder, depth_data[j, 1]) for _, j, _ in assoc]
        return color, depth

    def load_poses(self):
        assoc, _, _, pose_vecs = self._associate()
        return [_quat_pose(pose_vecs[k]) for _, _, k in assoc]


class ICLDataset(RGBDDataset):
    """ICL-NUIM: poses from the ``*.gt.sim`` 3x4-per-3-lines file
    (icl.py:61-86).  (The reference writes 3 into the homogeneous corner —
    an upstream bug; we use 1, which the relative-pose normalization makes
    equivalent for rotation and consistent for translation.)"""

    def __init__(self, config_dict, basedir, sequence, **kwargs):
        self.input_folder = os.path.join(basedir, sequence)
        sims = glob.glob(os.path.join(self.input_folder, "*.gt.sim"))
        if not sims:
            raise ValueError("Need pose file ending in `*.gt.sim`")
        self.pose_path = sims[0]
        super().__init__(config_dict, **kwargs)

    def get_filepaths(self):
        color = natsorted(glob.glob(f"{self.input_folder}/rgb/*.png"))
        depth = natsorted(glob.glob(f"{self.input_folder}/depth/*.png"))
        return color, depth

    def load_poses(self):
        rows = []
        with open(self.pose_path) as f:
            for line in f:
                parts = line.strip().split()
                if parts:
                    rows.append([float(v) for v in parts[:4]])
        rows = np.asarray(rows)
        poses = []
        for i in range(0, rows.shape[0], 3):
            p = np.eye(4)
            p[:3] = rows[i : i + 3]
            poses.append(p)
        return poses


class AzureKinectDataset(RGBDDataset):
    """color/*.jpg, depth/*.png; odometry from .log (5 lines/frame) or
    flat 16-floats-per-line files; identity if absent (azure.py:58-107)."""

    def __init__(self, config_dict, basedir, sequence, odomfile: Optional[str] = None, **kwargs):
        self.input_folder = os.path.join(basedir, sequence)
        self.pose_path = (
            os.path.join(self.input_folder, odomfile) if odomfile else None
        )
        super().__init__(config_dict, **kwargs)

    def get_filepaths(self):
        color = natsorted(glob.glob(f"{self.input_folder}/color/*.jpg"))
        depth = natsorted(glob.glob(f"{self.input_folder}/depth/*.png"))
        return color, depth

    def load_poses(self):
        if self.pose_path is None:
            return [np.eye(4) for _ in range(self.num_imgs)]
        with open(self.pose_path) as f:
            lines = [l for l in f.readlines()]
        poses = []
        if self.pose_path.endswith(".log"):
            for i in range(len(lines) // 5):
                rows = [list(map(float, lines[5 * i + 1 + r].split())) for r in range(4)]
                poses.append(np.array(rows).reshape(4, 4))
        else:
            for line in lines:
                if line.split():
                    poses.append(np.array(list(map(float, line.split()))).reshape(4, 4))
        return poses


class Ai2ThorDataset(RGBDDataset):
    """color/*.png, depth/*.png, pose/*.txt (ai2thor.py:47-62)."""

    def __init__(self, config_dict, basedir, sequence, **kwargs):
        self.input_folder = os.path.join(basedir, sequence)
        super().__init__(config_dict, **kwargs)

    def get_filepaths(self):
        color = natsorted(glob.glob(f"{self.input_folder}/color/*.png"))
        depth = natsorted(glob.glob(f"{self.input_folder}/depth/*.png"))
        return color, depth

    def load_poses(self):
        return [np.loadtxt(p) for p in natsorted(glob.glob(f"{self.input_folder}/pose/*.txt"))]


class Record3DDataset(RGBDDataset):
    """rgb/*.png, depth/*.png, poses/*.npy (record3d.py:50-66)."""

    def __init__(self, config_dict, basedir, sequence, **kwargs):
        self.input_folder = os.path.join(basedir, sequence)
        super().__init__(config_dict, **kwargs)

    def get_filepaths(self):
        color = natsorted(glob.glob(f"{self.input_folder}/rgb/*.png"))
        depth = natsorted(glob.glob(f"{self.input_folder}/depth/*.png"))
        return color, depth

    def load_poses(self):
        return [
            np.load(p)
            for p in natsorted(glob.glob(f"{self.input_folder}/poses/*.npy"))
        ]


class RealsenseDataset(Record3DDataset):
    """rgb/*.jpg variant of Record3D layout (realsense.py:50-66)."""

    def get_filepaths(self):
        color = natsorted(glob.glob(f"{self.input_folder}/rgb/*.jpg"))
        depth = natsorted(glob.glob(f"{self.input_folder}/depth/*.png"))
        return color, depth


class ScannetPPDataset(RGBDDataset):
    """ScanNet++ DSLR split via nerfstudio transforms_undistorted.json
    (scannetpp.py:35-135): poses are OpenGL c2w — converted by flipping the
    y/z camera axes; depth in mm."""

    def __init__(self, config_dict, basedir, sequence, use_train_split=True, **kwargs):
        self.input_folder = os.path.join(basedir, sequence)
        self.use_train_split = use_train_split
        meta_path = f"{self.input_folder}/dslr/nerfstudio/transforms_undistorted.json"
        self.meta = json.load(open(meta_path))
        split = json.load(open(f"{self.input_folder}/dslr/train_test_lists.json"))
        names = split["train"] if use_train_split else split["test"]
        frames = {f["file_path"]: f for f in self.meta["frames"]}
        if not use_train_split and "test_frames" in self.meta:
            frames.update({f["file_path"]: f for f in self.meta["test_frames"]})
        self.frames = [frames[n] for n in names if n in frames]
        config_dict = dict(config_dict)
        config_dict.setdefault("camera_params", {})
        cp = dict(config_dict["camera_params"])
        cp.update(
            png_depth_scale=1000.0,
            image_height=self.meta.get("h", cp.get("image_height", 584)),
            image_width=self.meta.get("w", cp.get("image_width", 876)),
            fx=self.meta.get("fl_x", cp.get("fx", 0)),
            fy=self.meta.get("fl_y", cp.get("fy", 0)),
            cx=self.meta.get("cx", cp.get("cx", 0)),
            cy=self.meta.get("cy", cp.get("cy", 0)),
        )
        config_dict["camera_params"] = cp
        super().__init__(config_dict, **kwargs)

    def get_filepaths(self):
        base = f"{self.input_folder}/dslr"
        color = [f"{base}/undistorted_images/{f['file_path']}" for f in self.frames]
        depth = [
            f"{base}/undistorted_depths/{f['file_path'].replace('.JPG', '.png')}"
            for f in self.frames
        ]
        return color, depth

    def load_poses(self):
        poses = []
        P = np.diag([1.0, -1.0, -1.0, 1.0])
        for f in self.frames:
            c2w = np.array(f["transform_matrix"])
            poses.append(c2w @ P)
        return poses


class NeRFCaptureDataset(RGBDDataset):
    """NeRFCapture transforms.json layout (nerfcapture.py:33-120)."""

    def __init__(self, config_dict, basedir, sequence, **kwargs):
        self.input_folder = os.path.join(basedir, sequence)
        self.meta = json.load(open(f"{self.input_folder}/transforms.json"))
        self.image_names = natsorted(os.listdir(f"{self.input_folder}/rgb"))
        config_dict = dict(config_dict)
        cp = dict(config_dict.get("camera_params", {}))
        cp.update(
            png_depth_scale=6553.5,
            image_height=self.meta.get("h", cp.get("image_height", 720)),
            image_width=self.meta.get("w", cp.get("image_width", 960)),
            fx=self.meta.get("fl_x", cp.get("fx", 0)),
            fy=self.meta.get("fl_y", cp.get("fy", 0)),
            cx=self.meta.get("cx", cp.get("cx", 0)),
            cy=self.meta.get("cy", cp.get("cy", 0)),
        )
        config_dict["camera_params"] = cp
        super().__init__(config_dict, **kwargs)

    def get_filepaths(self):
        color = [f"{self.input_folder}/rgb/{n}" for n in self.image_names]
        depth = [
            f"{self.input_folder}/depth/{n.replace('.jpg', '.png').replace('.JPG', '.png')}"
            for n in self.image_names
        ]
        return color, depth

    def load_poses(self):
        P = np.diag([1.0, -1.0, -1.0, 1.0])
        return [np.array(f["transform_matrix"]) @ P for f in self.meta["frames"]]
