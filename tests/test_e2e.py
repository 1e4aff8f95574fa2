"""End-to-end SLAM smoke test on a fabricated Replica-layout dataset:
track -> densify -> map -> keyframes -> checkpoint artifact -> final eval.
Mirrors BASELINE.json config 1-3 shapes at miniature scale."""
import os

import numpy as np
import pytest

from fabricate import fabricate_replica


def small_config(basedir, seq, semantic=True, workdir="/tmp/hierslam_e2e"):
    return dict(
        workdir=workdir,
        run_name="smoke",
        seed=0,
        map_every=2,
        keyframe_every=2,
        mapping_window_size=4,
        report_global_progress_every=500,
        eval_every=2,
        scene_radius_depth_ratio=3,
        mean_sq_dist_method="projective",
        gaussian_distribution="isotropic",
        report_iter_progress=False,
        load_checkpoint=False,
        checkpoint_time_idx=0,
        save_checkpoints=False,
        checkpoint_interval=500,
        use_wandb=False,
        map_capacity=32768,
        raster=dict(max_per_tile=256, gaussian_chunk=64, tile_batch=4),
        model=dict(flag_use_embedding=1, eval_gt_transfer=False),
        data=dict(
            basedir=basedir,
            basedir_sem=basedir,
            sequence=seq,
            dataset_name="replica_semantic" if semantic else "replica",
            sem_mode="tree",
            num_tree_level=2,
            use_pyramid=False,
            pyramid_level=4,
            desired_image_height=48,
            desired_image_width=64,
            start=0,
            end=-1,
            stride=1,
            num_frames=-1,
            camera_params=dict(
                image_height=48, image_width=64, fx=40.0, fy=40.0,
                cx=32.0, cy=24.0, png_depth_scale=6553.5,
            ),
        ),
        tracking=dict(
            use_gt_poses=False,
            forward_prop=True,
            num_iters=30,
            use_sil_for_loss=True,
            sil_thres=0.99,
            use_l1=True,
            ignore_outlier_depth_loss=False,
            loss_weights=dict(im=0.5, depth=1.0),
            lrs=dict(
                means3D=0.0, rgb_colors=0.0, unnorm_rotations=0.0,
                logit_opacities=0.0, log_scales=0.0, semantic=0.0,
                cam_unnorm_rots=0.002, cam_trans=0.01,
            ),
        ),
        mapping=dict(
            num_iters=30,
            add_new_gaussians=True,
            sil_thres=0.5,
            use_l1=True,
            use_sil_for_loss=False,
            ignore_outlier_depth_loss=False,
            loss_weights=dict(im=0.5, depth=1.0, sem=0.2),
            lrs=dict(
                means3D=0.0001, rgb_colors=0.0025, unnorm_rotations=0.001,
                logit_opacities=0.05, log_scales=0.001, semantic=0.05,
                cam_unnorm_rots=0.0, cam_trans=0.0,
            ),
            prune_gaussians=True,
            pruning_dict=dict(
                start_after=0, remove_big_after=0, stop_after=20,
                prune_every=20, removal_opacity_threshold=0.005,
                final_removal_opacity_threshold=0.005,
                reset_opacities=False, reset_opacities_every=500,
            ),
            use_gaussian_splatting_densification=False,
        ),
    )


@pytest.mark.slow
def test_full_slam_semantic(tmp_path):
    basedir, seq, _ = fabricate_replica(str(tmp_path / "data"), n_frames=6, semantic=True)
    cfg = small_config(basedir, seq, workdir=str(tmp_path / "out"))
    cfg["report_global_progress_every"] = 4  # frames 0 and 3 report

    from hierslam_tpu.slam.pipeline import run_slam

    params_np, summary, results = run_slam(cfg, do_eval=True)

    # artifact exists with the reference keys
    out = os.path.join(cfg["workdir"], cfg["run_name"], "params.npz")
    assert os.path.isfile(out)
    data = np.load(out)
    for k in (
        "means3D", "rgb_colors", "logit_opacities", "log_scales", "semantic",
        "unnorm_rotations", "cam_unnorm_rots", "cam_trans", "timestep",
        "intrinsics", "w2c", "gt_w2c_all_frames", "keyframe_time_indices",
    ):
        assert k in data, k
    assert os.path.isfile(
        os.path.join(cfg["workdir"], cfg["run_name"], "semantic_decoder.npz")
    )

    # the map actually grew and the trajectory was estimated
    assert summary["n_active"] > 1000
    assert results is not None
    # GT motion is 2cm/frame sideways; tiny-iteration tracking should land
    # well under a few cm ATE and produce a sane render.
    assert results["ate_rmse_cm"] < 4.0
    # threshold calibrated loosely: the densify render's 2x K finds more
    # already-present pixels in this tiny scene, adding slightly fewer
    # gaussians (11.98 dB vs 12.05 before)
    assert results["psnr"] > 11.5
    assert 0 <= results["miou_pct"] <= 100
    assert results["depth_l1_cm"] < 80.0

    # online progress reporting artifacts (report_progress_newrender +
    # plot_rgbd_silhouette equivalents) and the end-of-run metrics plot
    plots = os.path.join(cfg["workdir"], cfg["run_name"], "eval", "plots")
    assert os.path.isfile(os.path.join(plots, "tracking_0003.png"))
    assert os.path.isfile(os.path.join(plots, "mapping_0000.png"))
    assert os.path.isfile(
        os.path.join(cfg["workdir"], cfg["run_name"], "eval", "metrics.png")
    )
    import json

    mj = os.path.join(cfg["workdir"], cfg["run_name"], "metrics.jsonl")
    recs = [json.loads(l) for l in open(mj)]
    assert any("tracking_progress_psnr" in r for r in recs)
    assert any("mapping_progress_psnr" in r for r in recs)
    assert any("bin_overflow" in r for r in recs)
    # per-iteration loss records for BOTH phases (the reference's
    # report_loss[_semantic] cadence, utils/eval_helpers.py:277-339)
    tr_iters = [r for r in recs if r.get("phase") == "tracking"]
    mp_iters = [r for r in recs if r.get("phase") == "mapping"]
    assert len(tr_iters) > 1 and "tracking_loss" in tr_iters[0]
    assert len(mp_iters) > 1 and "mapping_loss" in mp_iters[0]
    assert "mapping_im" in mp_iters[0] and "mapping_depth" in mp_iters[0]
    # cumulative per-phase iteration counter is strictly increasing
    its = [r["iter"] for r in mp_iters]
    assert its == sorted(its) and len(set(its)) == len(its)


@pytest.mark.slow
def test_full_slam_semantic_stream(tmp_path):
    """End-to-end SLAMRunner with the SHIPPED mapping backend
    (raster.backend='stream', configs/replica/hierslam_semantic_run.py):
    tracking on the cached ladder path, mapping through the ragged
    pair-streamed renderer + packed-table scan (slam/mapping.py)."""
    basedir, seq, _ = fabricate_replica(
        str(tmp_path / "data"), n_frames=4, semantic=True
    )
    cfg = small_config(basedir, seq, workdir=str(tmp_path / "out_stream"))
    cfg["raster"]["backend"] = "stream"
    cfg["raster"]["stream_cap"] = 1024
    cfg["tracking"]["num_iters"] = 12
    cfg["mapping"]["num_iters"] = 12

    from hierslam_tpu.slam.pipeline import run_slam

    params_np, summary, results = run_slam(cfg, do_eval=True)
    assert summary["n_active"] > 1000
    # same sanity bars as the ladder e2e (fewer iters -> looser PSNR)
    assert results["ate_rmse_cm"] < 5.0
    assert results["psnr"] > 10.0
    assert np.isfinite(results["depth_l1_cm"])


@pytest.mark.slow
def test_gt_pose_mode(tmp_path):
    """BASELINE.json config 1: GT-pose path — ATE must be ~0."""
    basedir, seq, _ = fabricate_replica(str(tmp_path / "data"), n_frames=5, semantic=True)
    cfg = small_config(basedir, seq, workdir=str(tmp_path / "out2"))
    cfg["tracking"]["use_gt_poses"] = True

    from hierslam_tpu.slam.pipeline import run_slam

    params_np, summary, results = run_slam(cfg, do_eval=True)
    assert results["ate_rmse_cm"] < 1e-3
