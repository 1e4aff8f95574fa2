"""NVS eval, non-MLP tree decode, viz replay, and MS-SSIM sanity."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from fabricate import fabricate_replica
from test_e2e import small_config


def _run(tmp_path, **overrides):
    basedir, seq, _ = fabricate_replica(str(tmp_path / "data"), n_frames=5, semantic=True)
    cfg = small_config(basedir, seq, workdir=str(tmp_path / "out"))
    cfg["tracking"]["use_gt_poses"] = True
    cfg["tracking"]["num_iters"] = 5
    cfg["mapping"]["num_iters"] = 10
    cfg.update(overrides)

    from hierslam_tpu.slam.pipeline import SLAMRunner

    r = SLAMRunner(cfg)
    for t in range(5):
        r.step(t)
    return r, r.finalize(), cfg


@pytest.mark.slow
def test_nvs_eval_runs(tmp_path):
    r, pn, cfg = _run(tmp_path)
    from hierslam_tpu.eval.runner import run_nvs_eval

    res = run_nvs_eval(r.dataset, pn, cfg, os.path.join(cfg["workdir"], "nvs"))
    assert np.isfinite(res["nvs_psnr"]) and res["nvs_psnr"] > 5.0
    assert 0 <= res["nvs_ms_ssim"] <= 1.0


@pytest.mark.slow
def test_final_eval_without_mlp_decoder(tmp_path):
    """Tree decode via per-level argmax + tuple->leaf lookup
    (transfer_tree_2_label path, flag_mlp=0)."""
    r, pn, cfg = _run(tmp_path, model=dict(flag_use_embedding=0, eval_gt_transfer=False))
    from hierslam_tpu.eval.runner import run_final_eval

    res = run_final_eval(
        r.dataset, pn, cfg, os.path.join(cfg["workdir"], "eval_nomlp"), mlp=None,
        num_frames=5,
    )
    assert np.isfinite(res["psnr"])
    assert 0 <= res["miou_pct"] <= 100


@pytest.mark.slow
def test_viz_replay_frames(tmp_path):
    r, pn, cfg = _run(tmp_path)
    from hierslam_tpu.viz.recon import render_trajectory_frames
    from hierslam_tpu.datasets.tree import label_colormap

    out = render_trajectory_frames(
        pn, str(tmp_path / "viz"), cfg, every=2, viz_scale=0.5,
        semantic=True, mlp=r.mlp, colormap=label_colormap(256),
        num_semantic=r.dataset.num_semantic,
    )
    pngs = [f for f in os.listdir(out) if f.endswith(".png")]
    assert any(f.startswith("recon_") for f in pngs)
    assert any(f.startswith("sem_") for f in pngs)


@pytest.mark.slow
def test_metrics_plot(tmp_path):
    r, pn, cfg = _run(tmp_path)
    r.logger.close()
    from hierslam_tpu.utils.logging import plot_metrics

    png = plot_metrics(
        os.path.join(cfg["workdir"], cfg["run_name"], "metrics.jsonl"),
        str(tmp_path / "metrics.png"),
        keys=("mapping_loss", "n_active"),
    )
    assert os.path.isfile(png)
