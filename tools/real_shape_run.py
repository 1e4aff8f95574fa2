"""Full SLAM on the procedural 1200x680 sequence (VERDICT round-1 item 3).

Generates the dataset if missing, runs the COMPLETE pipeline at the
shipped Replica-config schedule, prints the reference metric row
(ATE/PSNR/MS-SSIM/depth-L1/mIoU) + runtime/overflow stats, and measures
the rendering error attributable to binning overflow by re-rendering eval
frames at 2x max_per_tile and diffing.

    python tools/real_shape_run.py --frames 200 [--data /tmp/proc_room]
        [--max-per-tile 1024] [--scale 1.0] [--map-every 8]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_config(basedir, workdir, W, H, max_per_tile, map_every, capacity,
                 escalate_tiles=0, escalate_k=0, gt_poses=False,
                 bucket_spec=None, track_bucket_spec=None):
    return dict(
        workdir=workdir,
        run_name="proc_room",
        seed=0,
        map_every=map_every,
        keyframe_every=5,
        mapping_window_size=24,
        report_global_progress_every=100,
        eval_every=5,
        scene_radius_depth_ratio=3,
        mean_sq_dist_method="projective",
        gaussian_distribution="isotropic",
        report_iter_progress=False,
        load_checkpoint=False,
        checkpoint_time_idx=0,
        save_checkpoints=False,
        checkpoint_interval=500,
        use_wandb=False,
        nan_autopsy=os.environ.get("RS_AUTOPSY", "0") == "1",
        map_capacity=capacity,
        raster=dict(
            max_per_tile=max_per_tile, gaussian_chunk=256, tile_batch=48,
            grad_pair_budget=int(os.environ.get("RS_BUDGET", 2_000_000)),
            grad_bf16=os.environ.get("RS_BF16", "1") == "1",
            track_max_per_tile=int(os.environ.get("RS_TRACK_K", 512)),
            escalate_tiles=escalate_tiles, escalate_k=escalate_k,
            bucket_spec=bucket_spec, track_bucket_spec=track_bucket_spec,
            sat_margin=float(os.environ.get("RS_SAT_MARGIN", "0")),
            sat_floor=int(os.environ.get("RS_SAT_FLOOR", "128")),
            track_sat_margin=float(os.environ.get("RS_TRACK_SAT", "-1")),
            visible_budget=int(os.environ.get("RS_VIS", 1_500_000)),
            # mapping backend: shipped default is the ragged pair stream
            # (configs/replica/hierslam_semantic_run.py)
            backend=os.environ.get("RS_BACKEND", "stream"),
            stream_rows=int(os.environ.get("RS_STREAM_ROWS", "78000")),
            stream_cap=int(os.environ.get("RS_STREAM_CAP", "4096")),
        ),
        model=dict(flag_use_embedding=1, eval_gt_transfer=False),
        data=dict(
            basedir=basedir,
            basedir_sem=basedir,
            sequence="proc_room",
            dataset_name="replica_semantic",
            sem_mode="tree",
            num_tree_level=2,
            use_pyramid=False,
            pyramid_level=4,
            desired_image_height=H,
            desired_image_width=W,
            start=0, end=-1, stride=1, num_frames=-1,
            camera_params=dict(
                image_height=H, image_width=W,
                fx=600.0 * W / 1200, fy=600.0 * W / 1200,
                cx=(W - 1) / 2, cy=(H - 1) / 2,
                png_depth_scale=6553.5,
            ),
        ),
        tracking=dict(
            use_gt_poses=gt_poses, forward_prop=True, num_iters=40,
            use_sil_for_loss=True, sil_thres=0.99, use_l1=True,
            ignore_outlier_depth_loss=False,
            loss_weights=dict(im=0.5, depth=1.0),
            lrs=dict(
                means3D=0.0, rgb_colors=0.0, unnorm_rotations=0.0,
                logit_opacities=0.0, log_scales=0.0, semantic=0.0,
                cam_unnorm_rots=0.0004, cam_trans=0.002,
            ),
        ),
        mapping=dict(
            num_iters=60, add_new_gaussians=True, sil_thres=0.5,
            use_l1=True, use_sil_for_loss=False,
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


def overflow_quality_check(params_np, config, dataset, k_lo, n_frames, every=25):
    """Render eval frames at K and 2K; report PSNR between the two renders
    and the per-K overflow counts — the measured image-space cost of the
    static per-tile cap."""
    import jax
    import jax.numpy as jnp

    from hierslam_tpu.config import raster_config
    from hierslam_tpu.core.camera import setup_camera
    from hierslam_tpu.slam.losses import render_gaussians

    first = dataset[0]
    H, W = first[1].shape
    camera = setup_camera(W, H, np.asarray(first[2])[:3, :3], params_np["w2c"])
    gauss = {k: jnp.asarray(v) for k, v in params_np.items()
             if k in ("means3D", "rgb_colors", "unnorm_rotations",
                      "logit_opacities", "log_scales")}
    q_all = jnp.asarray(params_np["cam_unnorm_rots"])
    t_all = jnp.asarray(params_np["cam_trans"])

    results = {}
    renders = {}
    for mult in (1, 2):
        k = k_lo * mult
        # the reference point doubles the WHOLE cap config (base K and the
        # escalated-tile cap), so the diff measures everything the shipped
        # caps still truncate
        rr = dict(config["raster"], max_per_tile=k)
        if rr.get("escalate_tiles"):
            rr["escalate_k"] = (rr.get("escalate_k") or 4 * k_lo) * mult
        if rr.get("bucket_spec"):
            rr["bucket_spec"] = tuple(
                (n, kk * mult) for n, kk in rr["bucket_spec"]
            )
        rc = raster_config({**config, "raster": rr})

        @jax.jit
        def render(t):
            return render_gaussians(
                gauss, None, q_all[0, :, t], t_all[0, :, t], camera, rc,
                with_semantic=False, gaussians_grad=False, camera_grad=False,
            )

        ims, drops = [], []
        for t in range(0, n_frames, every):
            out = render(t)
            ims.append(np.clip(np.asarray(out.im), 0, 1))
            drops.append(int(out.n_dropped))
        renders[mult] = ims
        results[f"overflow_pairs_K{k}"] = float(np.mean(drops))
    mses = [np.mean((a - b) ** 2) for a, b in zip(renders[1], renders[2])]
    mse = float(np.mean(mses))
    results["overflow_psnr_K_vs_2K"] = float(10 * np.log10(1.0 / max(mse, 1e-12)))
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/proc_room_data")
    ap.add_argument("--workdir", default="/tmp/proc_room_run")
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--max-per-tile", type=int, default=1024)
    ap.add_argument("--map-every", type=int, default=8)
    ap.add_argument("--capacity", type=int, default=2_000_000)
    ap.add_argument("--escalate-tiles", type=int, default=0)
    ap.add_argument("--escalate-k", type=int, default=0)
    ap.add_argument(
        "--buckets", default="128:4096,384:1024,768:512,-1:256",
        help="capacity-class ladder n:k,... ('' = single class at "
             "--max-per-tile; the shipped-config ladder by default)")
    ap.add_argument(
        "--track-buckets", default="128:1024,384:512,-1:128")
    ap.add_argument(
        "--gt-poses", action="store_true",
        help="upper-bound calibration run: GT poses instead of tracking "
        "(separates tracker error from raster truncation / densify bloat; "
        "VERDICT r2 item 5)",
    )
    ap.add_argument("--skip-gen", action="store_true")
    args = ap.parse_args()

    W, H = int(1200 * args.scale), int(680 * args.scale)
    seq_dir = os.path.join(args.data, "proc_room")
    if not args.skip_gen and not os.path.isdir(seq_dir):
        from procedural_room import generate

        generate(args.data, args.frames, W, H)

    from hierslam_tpu.slam.pipeline import run_slam

    cfg = build_config(args.data, args.workdir, W, H, args.max_per_tile,
                       args.map_every, args.capacity,
                       escalate_tiles=args.escalate_tiles,
                       escalate_k=args.escalate_k, gt_poses=args.gt_poses,
                       bucket_spec=tuple(
                           tuple(int(v) for v in e.split(":"))
                           for e in args.buckets.split(",")
                       ) if args.buckets else None,
                       track_bucket_spec=tuple(
                           tuple(int(v) for v in e.split(":"))
                           for e in args.track_buckets.split(",")
                       ) if args.track_buckets else None)
    if args.gt_poses:
        cfg["run_name"] = "proc_room_gtpose"
    t0 = time.time()
    params_np, summary, results = run_slam(cfg, do_eval=True)
    wall = time.time() - t0

    from hierslam_tpu.datasets import get_dataset

    n_frames = params_np["cam_unnorm_rots"].shape[-1]
    dataset = get_dataset(
        config_dict=cfg["data"], basedir=args.data, sequence="proc_room",
        start=0, end=-1, stride=1, desired_height=H, desired_width=W,
        relative_pose=True,
    )
    oq = overflow_quality_check(
        params_np, cfg, dataset, args.max_per_tile, n_frames
    )

    report = {
        "wall_s": round(wall, 1),
        "frames": n_frames,
        "image": [W, H],
        "mode": "gt_pose_upper_bound" if args.gt_poses else "full_slam",
        "summary": {k: (round(v, 4) if isinstance(v, float) else v)
                    for k, v in summary.items()},
        "metrics": {k: round(float(v), 4) for k, v in results.items()},
        "overflow_quality": {k: round(v, 2) for k, v in oq.items()},
    }
    out_path = os.path.join(
        args.workdir, cfg["run_name"], "real_shape_report.json"
    )
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    print(f"report -> {out_path}")


if __name__ == "__main__":
    main()
