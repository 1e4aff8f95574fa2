"""Loader tests against fabricated directory trees mimicking the
Replica/ScanNet layouts."""
import numpy as np
import pytest

from fabricate import fabricate_replica, fabricate_scannet

from hierslam_tpu.datasets import get_dataset
from hierslam_tpu.datasets.base import natsorted, relative_poses


def test_natsorted():
    assert natsorted(["f10.png", "f2.png", "f1.png"]) == ["f1.png", "f2.png", "f10.png"]


def test_replica_loader(tmp_path):
    basedir, seq, cfg = fabricate_replica(str(tmp_path), n_frames=6, semantic=False)
    ds = get_dataset(cfg, basedir, seq, stride=2, start=0, end=-1,
                     desired_height=24, desired_width=32)
    assert len(ds) == 3
    color, depth, K4, pose = ds[0]
    assert color.shape == (24, 32, 3) and color.max() > 1.0  # 0..255 range
    assert depth.shape == (24, 32)
    np.testing.assert_allclose(pose, np.eye(4), atol=1e-6)  # relative to frame 0
    # resized intrinsics: fx scaled by 32/64
    np.testing.assert_allclose(K4[0, 0], 20.0, atol=1e-5)
    np.testing.assert_allclose(K4[1, 1], 20.0, atol=1e-5)
    # depth of the wall (center pixel) = 2.5m
    np.testing.assert_allclose(depth[5, 16], 2.5, atol=0.01)
    # frame 2 (stride 2) pose: x translated by 2*0.02 = 0.04 wrt frame 0
    _, _, _, pose2 = ds[1]
    np.testing.assert_allclose(pose2[0, 3], 0.04, atol=1e-6)


def test_replica_semantic_tree(tmp_path):
    basedir, seq, cfg = fabricate_replica(str(tmp_path), n_frames=4, semantic=True)
    cfg["sem_mode"] = "tree"
    cfg["num_tree_level"] = 2
    ds = get_dataset(cfg, basedir, seq, desired_height=24, desired_width=32)
    assert ds.num_semantic == [2, 4, 4]  # level counts (2,4) + leaf count 4
    color, depth, K4, pose, label = ds[0]
    assert label.shape == (3, 24, 32)  # 2 levels + original
    # class 3 ('panel') → level0 id 1, level1 id 3
    where3 = label[2] == 3
    assert where3.any()
    assert (label[0][where3] == 1).all()
    assert (label[1][where3] == 3).all()
    # class 1 ('wall') → level0 id 0
    where1 = label[2] == 1
    assert (label[0][where1] == 0).all()


def test_scannet_semantic_tree(tmp_path):
    basedir, seq, cfg = fabricate_scannet(str(tmp_path), n_frames=3, semantic=True)
    cfg["sem_mode"] = "tree"
    ds = get_dataset(cfg, basedir, seq, desired_height=24, desired_width=32)
    assert ds.num_semantic[-1] == 41
    color, depth, K4, pose, label = ds[0]
    assert label.shape == (5, 24, 32)  # 4 levels + nyu40
    # raw id 300 -> nyu40 3 -> level0 = 3 % 2 = 1
    where3 = label[4] == 3
    assert where3.any()
    assert (label[0][where3] == 1).all()


def test_scannet_nyu40(tmp_path):
    basedir, seq, cfg = fabricate_scannet(str(tmp_path), n_frames=2, semantic=True)
    cfg["sem_mode"] = "nyu40"
    ds = get_dataset(cfg, basedir, seq, desired_height=24, desired_width=32)
    color, depth, K4, pose, label = ds[0]
    assert label.shape == (1, 24, 32)
    assert set(np.unique(label)).issubset({0, 1, 2, 3})


def test_relative_poses():
    rng = np.random.default_rng(0)
    poses = np.tile(np.eye(4)[None], (3, 1, 1))
    poses[:, 0, 3] = [1.0, 2.0, 3.0]
    rel = relative_poses(poses)
    np.testing.assert_allclose(rel[0], np.eye(4), atol=1e-7)
    np.testing.assert_allclose(rel[1][0, 3], 1.0, atol=1e-6)
