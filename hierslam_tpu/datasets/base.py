"""RGB-D dataset base: the gradslam directory/preprocessing contract.

NumPy host pipeline (no torch): reproduces
datasets/gradslam_datasets/basedataset.py:105-340 —

* subclass hooks ``get_filepaths`` / ``load_poses``;
* start/end/stride subsampling (:182-190);
* color resized INTER_LINEAR (:223-227); depth resized INTER_NEAREST then
  divided by ``png_depth_scale`` (:248-256);
* intrinsics rescaled by the resize ratios (:317);
* poses normalized relative to frame 0 (:258-276);
* ``__getitem__`` -> (color HWC float32 in [0,255], depth HW float32
  meters, intrinsics 4x4, c2w pose 4x4) as numpy arrays.
"""
from __future__ import annotations

import os
import re
from typing import Dict, List, Optional, Tuple

import cv2
import imageio.v2 as imageio
import numpy as np
import yaml


def natsorted(paths: List[str]) -> List[str]:
    """Natural sort (numeric-aware), replacing the natsort dependency."""

    def key(s):
        return [int(p) if p.isdigit() else p for p in re.split(r"(\d+)", s)]

    return sorted(paths, key=key)


def load_dataset_config(path: str, default_path: Optional[str] = None) -> Dict:
    """YAML camera-config loader with recursive ``inherit_from`` merging
    (datasets/gradslam_datasets/dataconfig.py:5-54)."""
    with open(path, "r") as f:
        cfg_special = yaml.full_load(f)
    inherit = cfg_special.get("inherit_from")
    if inherit is not None:
        cfg = load_dataset_config(inherit, default_path)
    elif default_path is not None:
        with open(default_path, "r") as f:
            cfg = yaml.full_load(f)
    else:
        cfg = {}
    _update_recursive(cfg, cfg_special)
    return cfg


def _update_recursive(dict1: Dict, dict2: Dict):
    for k, v in dict2.items():
        if k not in dict1:
            dict1[k] = {} if isinstance(v, dict) else None
        if isinstance(v, dict):
            _update_recursive(dict1[k], v)
        else:
            dict1[k] = v


def as_intrinsics_matrix(fx, fy, cx, cy) -> np.ndarray:
    K = np.eye(3, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = fx, fy, cx, cy
    return K


def relative_poses(poses: np.ndarray) -> np.ndarray:
    """Normalize pose sequence to frame 0
    (basedataset.py:258-276 via geometryutils.relative_transformation)."""
    inv0 = np.linalg.inv(poses[0])
    return np.einsum("ij,njk->nik", inv0, poses)


class RGBDDataset:
    """Base class.  Subclasses set ``self.input_folder`` (and optionally
    ``self.pose_path``) before calling ``super().__init__``."""

    def __init__(
        self,
        config_dict: Dict,
        stride: Optional[int] = 1,
        start: int = 0,
        end: int = -1,
        desired_height: int = 480,
        desired_width: int = 640,
        relative_pose: bool = True,
        **kwargs,
    ):
        stride = stride or 1
        self.name = config_dict["dataset_name"]
        cam = config_dict["camera_params"]
        self.png_depth_scale = cam["png_depth_scale"]
        self.orig_height = cam["image_height"]
        self.orig_width = cam["image_width"]
        self.fx, self.fy = cam["fx"], cam["fy"]
        self.cx, self.cy = cam["cx"], cam["cy"]
        self.distortion = np.array(cam["distortion"]) if cam.get("distortion") else None
        self.crop_edge = cam.get("crop_edge")

        self.desired_height = desired_height
        self.desired_width = desired_width
        self.height_ratio = desired_height / self.orig_height
        self.width_ratio = desired_width / self.orig_width

        if start < 0:
            raise ValueError("start must be positive")
        if not (end == -1 or end > start):
            raise ValueError("end must be -1 or > start")
        self.start, self.end, self.stride = start, end, stride

        self.color_paths, self.depth_paths = self.get_filepaths()
        if len(self.color_paths) != len(self.depth_paths):
            raise ValueError("color/depth count mismatch")
        self.num_imgs = len(self.color_paths)
        poses = self.load_poses()

        if self.end == -1:
            self.end = self.num_imgs
        sl = slice(self.start, self.end, stride)
        self.color_paths = self.color_paths[sl]
        self.depth_paths = self.depth_paths[sl]
        poses = poses[sl]
        self.retained_inds = np.arange(self.num_imgs)[sl]
        self.num_imgs = len(self.color_paths)

        self.poses = np.stack(poses).astype(np.float32)
        self.transformed_poses = (
            relative_poses(self.poses) if relative_pose else self.poses
        )

    # -- subclass hooks -----------------------------------------------------
    def get_filepaths(self) -> Tuple[List[str], List[str]]:
        raise NotImplementedError

    def load_poses(self) -> List[np.ndarray]:
        raise NotImplementedError

    # -- preprocessing ------------------------------------------------------
    def _preprocess_color(self, color: np.ndarray) -> np.ndarray:
        return cv2.resize(
            color, (self.desired_width, self.desired_height), interpolation=cv2.INTER_LINEAR
        )

    def _preprocess_depth(self, depth: np.ndarray) -> np.ndarray:
        depth = cv2.resize(
            depth.astype(float),
            (self.desired_width, self.desired_height),
            interpolation=cv2.INTER_NEAREST,
        )
        return depth / self.png_depth_scale

    def _preprocess_label(self, label: np.ndarray) -> np.ndarray:
        return cv2.resize(
            label, (self.desired_width, self.desired_height), interpolation=cv2.INTER_NEAREST
        )

    def scaled_intrinsics(self) -> np.ndarray:
        K = as_intrinsics_matrix(self.fx, self.fy, self.cx, self.cy)
        K[0] *= self.width_ratio
        K[1] *= self.height_ratio
        return K

    def _read_depth(self, path: str) -> np.ndarray:
        return np.asarray(imageio.imread(path), dtype=np.int64)

    def __len__(self):
        return self.num_imgs

    def load_rgbd(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        color = np.asarray(imageio.imread(self.color_paths[index]), dtype=float)
        if self.distortion is not None:
            K = as_intrinsics_matrix(self.fx, self.fy, self.cx, self.cy)
            color = cv2.undistort(color, K, self.distortion)
        color = self._preprocess_color(color)
        depth = self._preprocess_depth(self._read_depth(self.depth_paths[index]))
        return color.astype(np.float32), depth.astype(np.float32)

    def __getitem__(self, index: int):
        color, depth = self.load_rgbd(index)
        K4 = np.eye(4, dtype=np.float32)
        K4[:3, :3] = self.scaled_intrinsics()
        return color, depth, K4, self.transformed_poses[index]
