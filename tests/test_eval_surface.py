"""Eval-surface parity: reference metric formulas, gt_transfer protocol,
per-frame IoU reporting, show_semantic imagery, legend plot, and the
ScanNet tree_large sparse semantic_id protocol."""
import os

import numpy as np
import jax.numpy as jnp

from fabricate import fabricate_replica, fabricate_scannet
from hierslam_tpu.datasets import tree as tree_lib
from hierslam_tpu.eval import metrics as M
from hierslam_tpu.eval import semantic_viz as SV


def test_reference_psnr_formula():
    """calc_psnr on weighted products: per-channel MSE over ALL pixels."""
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (3, 8, 10)).astype(np.float32)
    gt = rng.uniform(0, 1, (3, 8, 10)).astype(np.float32)
    mask = rng.uniform(size=(8, 10)) > 0.4
    w1, w2 = img * mask, gt * mask
    want = np.mean(
        [20 * np.log10(1.0 / np.sqrt(np.mean((w1[c] - w2[c]) ** 2))) for c in range(3)]
    )
    got = float(M.reference_psnr(jnp.asarray(img), jnp.asarray(gt), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_reference_depth_metrics_is_masked_l1():
    rng = np.random.default_rng(1)
    d = rng.uniform(0, 5, (8, 10)).astype(np.float32)
    g = rng.uniform(0, 5, (8, 10)).astype(np.float32)
    m = rng.uniform(size=(8, 10)) > 0.3
    rmse, l1 = M.reference_depth_metrics(d, g, m)
    want = np.abs(d * m - g)[m].sum() / m.sum()
    np.testing.assert_allclose(rmse, want, rtol=1e-6)
    assert rmse == l1  # sqrt of square is abs — reference quirk


def test_gt_transfer_changes_miou():
    """eval_gt_transfer must snap predictions onto GT-present classes and
    (here) change the mIoU (VERDICT done-criterion)."""
    # palette where class 5's color is near class 2's (a confusable pair)
    cmap = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255],
         [255, 255, 0], [10, 240, 5], [128, 128, 128], [255, 255, 255]],
        np.uint8,
    )
    gt = np.zeros((6, 6), np.int64)
    gt[:, 3:] = 2
    pred = np.zeros((6, 6), np.int64)
    pred[:, 3:] = 5  # class 5 absent from GT -> iou 0 for classes 2 and 5
    transferred = SV.gt_transfer_labels(pred, gt, cmap)
    assert set(np.unique(transferred)) <= {0, 2}
    acc_plain = M.IoUAccumulator()
    m0, _, _, _ = acc_plain.add_frame(pred, gt, range(8))
    acc_tr = M.IoUAccumulator()
    m1, _, _, _ = acc_tr.add_frame(transferred, gt, range(8))
    assert m1 > m0


def test_eval_semantic_single_prints(capsys):
    gt = np.zeros((4, 4), np.int64)
    gt[2:] = 1
    pred = gt.copy()
    pred[0, 0] = 3
    miou, mbiou, per_iou, _ = M.eval_semantic_single(
        pred, gt, range(4), ["void", "wall", "floor", "panel"], verbose=True
    )
    out = capsys.readouterr().out
    assert "semantic label 3 (panel)" in out
    assert "mean_iou" in out
    assert 0 < miou < 1
    assert 3 in per_iou and per_iou[3] == 0.0


def test_iou_accumulator_frame_summary():
    acc = M.IoUAccumulator()
    gt = np.zeros((4, 4), np.int64)
    f_miou, f_mbiou, f_iou, f_biou = acc.add_frame(gt, gt, range(3))
    assert f_miou == 1.0 and list(f_iou) == [0]
    miou, mbiou, _, _ = acc.summary()
    assert miou == 1.0


def test_show_semantic_and_legend(tmp_path):
    basedir, seq, cfg = fabricate_replica(str(tmp_path), n_frames=3, semantic=True)
    from hierslam_tpu.datasets import get_dataset

    ds = get_dataset(
        config_dict={**cfg, "sem_mode": "tree", "num_tree_level": 2},
        basedir=basedir, sequence=seq, start=0, end=-1, stride=1,
        desired_height=48, desired_width=64, relative_pose=True,
    )
    rng = np.random.default_rng(0)
    S = sum(ds.num_semantic[:-1])

    def render_sem(t):
        return rng.normal(size=(S, 48, 64)).astype(np.float32)

    out = str(tmp_path / "eval")
    written = SV.show_semantic(render_sem, ds, 3, out, mlp=None, frames=[0, 2])
    assert len(written) == 2 * 2 * 2  # 2 frames x 2 levels x (pred, gt)
    for p in written:
        assert os.path.isfile(p)

    legend = SV.plot_semantic_legend(
        range(4), ["void", "wall", "floor", "panel"],
        np.asarray(ds.colors_map_all), out,
    )
    assert os.path.isfile(legend)


def test_scannet_tree_large_sparse_protocol(tmp_path):
    basedir, seq, cfg = fabricate_scannet(str(tmp_path), n_frames=2, semantic=True)
    from hierslam_tpu.datasets import get_dataset

    ds = get_dataset(
        config_dict={**cfg, "sem_mode": "tree_large"},
        basedir=basedir, sequence=seq, start=0, end=-1, stride=1,
        desired_height=48, desired_width=64, relative_pose=True,
    )
    # sparse raw ids exposed, leaf labels DENSE (CE-safe)
    assert ds.semantic_id == [0, 100, 200, 300]
    assert ds.semantic_class == ["raw0", "raw100", "raw200", "raw300"]
    assert ds.num_semantic[-1] == 4
    item = ds[0]
    label = np.asarray(item[4])
    assert label.shape[0] == 6  # 5 levels + leaf
    assert label[-1].max() < 4  # dense leaf ids
    # raw ids recoverable: dense -> raw -> matches the stored raw image
    sid = np.asarray(ds.semantic_id)
    raw = sid[label[-1]]
    assert set(np.unique(raw)) <= {0, 100, 200, 300}
