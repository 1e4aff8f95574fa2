"""Tests: PLY export round-trip, tree generator (fake LLM), SSIM parity with
torch, metrics, keyframe selection."""
import json
import os

import numpy as np
import pytest


def _params(n=50, sem=0, seed=0):
    rng = np.random.default_rng(seed)
    p = {
        "means3D": rng.normal(size=(n, 3)).astype(np.float32),
        "rgb_colors": rng.uniform(0, 1, (n, 3)).astype(np.float32),
        "unnorm_rotations": np.tile([1, 0, 0, 0], (n, 1)).astype(np.float32),
        "logit_opacities": rng.normal(size=(n, 1)).astype(np.float32),
        "log_scales": rng.normal(size=(n, 1)).astype(np.float32),
    }
    if sem:
        p["semantic"] = rng.uniform(0, 1, (n, sem)).astype(np.float32)
    return p


def read_ply(path):
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        names = [l.split()[-1] for l in header if l.startswith("property")]
        n = int([l for l in header if l.startswith("element")][0].split()[-1])
        data = np.frombuffer(f.read(), dtype="<f4").reshape(n, len(names))
    return names, data


def test_export_ply_roundtrip(tmp_path):
    from hierslam_tpu.export import ply as ply_lib

    p = _params(40)
    path = ply_lib.export_ply(p, str(tmp_path / "map.ply"))
    names, data = read_ply(path)
    assert names[:3] == ["x", "y", "z"]
    np.testing.assert_allclose(data[:, :3], p["means3D"], atol=1e-6)
    # f_dc roundtrip through RGB2SH
    rgb = ply_lib.sh_to_rgb(data[:, 6:9])
    np.testing.assert_allclose(rgb, p["rgb_colors"], atol=1e-5)


def test_export_ply_semantic_tree(tmp_path):
    from hierslam_tpu.export import ply as ply_lib
    from hierslam_tpu.datasets.tree import label_colormap

    p = _params(30, sem=6)
    path = ply_lib.export_ply_semantic(
        p, str(tmp_path / "sem.ply"), label_colormap(256), num_semantic=[2, 4, 4]
    )
    names, data = read_ply(path)
    assert data.shape[0] == 30


def test_tree_generator_with_fake_llm():
    from hierslam_tpu.tree_gen import generator as gen

    labels = ["chair", "sofa", "table", "bed", "wall", "floor", "ceiling", "lamp"]

    def fake_llm(prompt):
        if "not assigned" in prompt:
            return json.dumps({"other": []})
        if "chair" in prompt:
            return json.dumps(
                {
                    "furniture": ["chair", "sofa", "table", "bed"],
                    "structure": ["wall", "floor", "ceiling"],
                    "lighting": ["lamp"],
                }
            )
        return json.dumps({"indoor": ["furniture", "structure", "lighting"]})

    layers = gen.generate_tree(labels, fake_llm, stop_groups=4)
    assert len(layers) >= 1
    paths = gen.tree_to_paths(labels, layers)
    assert paths["chair"][-1] == "furniture"
    tree = gen.assign_level_ids(paths)
    assert "0_chair" in tree
    # loadable by the replica tree reader
    from hierslam_tpu.datasets.tree import read_tree_annotation, find_max_level

    mapping, info = read_tree_annotation(tree, tree_level=len(paths["chair"]))
    counts = find_max_level(mapping)
    assert all(c >= 1 for c in counts)


def test_ssim_matches_torch():
    import torch
    import torch.nn.functional as tF
    import jax.numpy as jnp

    from hierslam_tpu.ops.ssim import calc_ssim, _window

    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (3, 37, 45)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.normal(size=a.shape).astype(np.float32), 0, 1)

    ours = float(calc_ssim(jnp.asarray(a), jnp.asarray(b)))

    # torch reference (utils/slam_external.py:66-97 semantics)
    win2d = torch.tensor(_window(11, 1.5))
    window = win2d.expand(3, 1, 11, 11).contiguous()
    ta, tb = torch.tensor(a)[None], torch.tensor(b)[None]
    mu1 = tF.conv2d(ta, window, padding=5, groups=3)
    mu2 = tF.conv2d(tb, window, padding=5, groups=3)
    s1 = tF.conv2d(ta * ta, window, padding=5, groups=3) - mu1**2
    s2 = tF.conv2d(tb * tb, window, padding=5, groups=3) - mu2**2
    s12 = tF.conv2d(ta * tb, window, padding=5, groups=3) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1**2 + mu2**2 + c1) * (s1 + s2 + c2)
    )
    ref = float(ssim_map.mean())
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_ate_alignment():
    from hierslam_tpu.eval.ate import align, evaluate_ate

    rng = np.random.default_rng(0)
    gt = rng.normal(size=(3, 20))
    # rotate+translate
    th = 0.4
    R = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    )
    est = R @ gt + np.array([[1.0], [2.0], [3.0]])
    _, _, err = align(gt, est)
    assert err.max() < 1e-6

    gt_traj = [np.eye(4) for _ in range(5)]
    for i, p in enumerate(gt_traj):
        p[0, 3] = i
    est_traj = [p.copy() for p in gt_traj]
    assert evaluate_ate(gt_traj, est_traj) < 1e-9


def test_boundary_iou():
    from hierslam_tpu.eval.metrics import boundary_iou, calculate_iou

    a = np.zeros((64, 64), np.uint8)
    a[20:40, 20:40] = 1
    assert calculate_iou(a, a) == 1.0
    assert boundary_iou(a, a) == 1.0
    b = np.zeros_like(a)
    b[22:42, 20:40] = 1
    assert 0 < boundary_iou(a, b) < 1.0


def test_keyframe_selection_prefers_overlapping():
    from hierslam_tpu.slam.keyframes import Keyframe, keyframe_selection_overlap

    H, W = 48, 64
    depth = np.full((H, W), 2.0, np.float32)
    K = np.array([[40.0, 0, 32], [0, 40.0, 24], [0, 0, 1]])
    same = np.eye(4)
    far = np.eye(4)
    far[:3, 3] = [100, 0, 0]  # looks at nothing relevant
    kfs = [
        Keyframe(id=0, w2c=same, color=None, depth=None),
        Keyframe(id=1, w2c=far, color=None, depth=None),
    ]
    rng = np.random.default_rng(0)
    sel = keyframe_selection_overlap(depth, np.eye(4), K, kfs, k=2, rng=rng)
    assert sel == [0]  # only the overlapping keyframe has positive overlap
