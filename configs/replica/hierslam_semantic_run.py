"""Replica semantic SLAM (5-level LLM tree, 26-dim embedding, 102 leaves).

TPU-native port of the reference run configuration
(configs/replica/hierslam_semantic_run.py) — same schedule, losses and
learning rates; adds the TPU-only knobs `map_capacity` and `raster`.
"""
import os

scenes = ["room0", "room1", "room2", "office0", "office1", "office2", "office3", "office4"]

seed = int(os.environ.get("SEED", 0))
scene_name = scenes[int(os.environ.get("SCENE_NUM", 0))]

map_every = 8
keyframe_every = 5
mapping_window_size = 24
tracking_iters = 40
mapping_iters = 60

group_name = "Replica_semantic"
run_name = f"{scene_name}_{seed}"

config = dict(
    workdir=f"./experiments/{group_name}",
    run_name=run_name,
    seed=seed,
    map_every=map_every,
    keyframe_every=keyframe_every,
    mapping_window_size=mapping_window_size,
    report_global_progress_every=500,
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
    # --- TPU-specific ---
    map_capacity=4_000_000,
    raster=dict(tile_shape=(16, 16), max_per_tile=1024, gaussian_chunk=256, tile_batch=48,
                # grad routing must cover the full stream (32k rows x 128):
                # truncation cuts HIGH-ID (newest-densified) gaussians'
                # gradients entirely — the runner warns on any drop
                grad_pair_budget=4_100_000, grad_bf16=True,
                # MAPPING runs the ragged pair-streamed renderer
                # (ops/render_stream.py): raw-attribute pairs are gathered
                # once per iteration, projected INSIDE the Pallas kernel,
                # and blended over a waterfilled 128-pair row stream --
                # blended pairs track the true saturation-bounded per-tile
                # need (the static-shape analogue of the CUDA per-pixel
                # early termination, forward.cu:358-366) instead of a
                # padded capacity ladder.  stream_rows is the global pair
                # budget in 128-pair rows: 32k rows = 4.1M pairs/frame,
                # ~1.5x the saturation-bounded need measured at N=2M
                # (22,093 rows); budgets much past this inflate the
                # [rows, 128, C] gather/cotangent HBM buffers toward the
                # chip limit.  stream_cap bounds any single tile (sets
                # the backward kernel's VMEM scratch).
                backend="stream",
                stream_rows=32_000, stream_cap=4_096,
                # TRACKING stays on the cached pose-only ladder path
                # (ops/render_tracked.py) -- the stream kernel routes no
                # camera gradients by design.  FLAT per-tile capacity and
                # NO saturation capping: the round-3 tracking ladder
                # ((128,1024),(384,512),(-1,128)) gave 84% of tiles 128
                # slots against a measured median saturation-bounded need
                # of ~800 at real density -- truncated silhouette masks
                # made pose gradients oscillate and the 200-frame
                # real-shape run diverged (ATE 404 cm, REAL_SHAPE_r05).
                # The flat-512 no-sat configuration is the round-2 /
                # round-5-bisect validated one.
                track_max_per_tile=512,
                track_sat_margin=0.0,
                # ladder spec for the non-stream renders (densify
                # non-presence render, eval, viz): one generous class is
                # derived from max_per_tile where needed.
                bucket_spec=((128, 4096), (384, 1024), (768, 512), (-1, 256)),
                sat_margin=2.0, sat_floor=128,
                # visible-rank compaction applies to the LADDER backends
                # only (per-gaussian work scales with the visible prefix);
                # the packed stream mapper bins full-N — its costs scale
                # with the pair stream, and the budget would only truncate
                # rendering (slam/mapping.py).
                visible_budget=1_500_000),
    model=dict(
        flag_use_embedding=1,
        eval_gt_transfer=False,
    ),
    data=dict(
        basedir=os.environ.get("REPLICA_SEMANTIC_DIR", "/data/Replica_semantic"),
        basedir_sem=os.environ.get("REPLICA_SEMANTIC_DIR", "/data/Replica_semantic"),
        gradslam_data_cfg="./configs/data/replica_semantic.yaml",
        sequence=scene_name,
        desired_image_height=680,
        desired_image_width=1200,
        start=0,
        end=-1,
        stride=1,
        num_frames=-1,
        sem_mode="tree",
        num_tree_level=5,
        use_pyramid=False,
        pyramid_level=4,
    ),
    tracking=dict(
        use_gt_poses=False,
        forward_prop=True,
        num_iters=tracking_iters,
        use_sil_for_loss=True,
        sil_thres=0.99,
        use_l1=True,
        ignore_outlier_depth_loss=False,
        loss_weights=dict(im=0.5, depth=1.0),
        lrs=dict(
            means3D=0.0,
            rgb_colors=0.0,
            unnorm_rotations=0.0,
            logit_opacities=0.0,
            log_scales=0.0,
            semantic=0.0,
            cam_unnorm_rots=0.0004,
            cam_trans=0.002,
        ),
    ),
    mapping=dict(
        num_iters=mapping_iters,
        add_new_gaussians=True,
        sil_thres=0.5,
        use_l1=True,
        use_sil_for_loss=False,
        ignore_outlier_depth_loss=False,
        loss_weights=dict(im=0.5, depth=1.0, sem=0.2),
        lrs=dict(
            means3D=0.0001,
            rgb_colors=0.0025,
            unnorm_rotations=0.001,
            logit_opacities=0.05,
            log_scales=0.001,
            semantic=0.05,
            cam_unnorm_rots=0.0,
            cam_trans=0.0,
        ),
        prune_gaussians=True,
        pruning_dict=dict(
            start_after=0,
            remove_big_after=0,
            stop_after=20,
            prune_every=20,
            removal_opacity_threshold=0.005,
            final_removal_opacity_threshold=0.005,
            reset_opacities=False,
            reset_opacities_every=500,
        ),
        use_gaussian_splatting_densification=False,
        densify_dict=dict(
            start_after=500,
            remove_big_after=3000,
            stop_after=5000,
            densify_every=100,
            grad_thresh=0.0002,
            num_to_split_into=2,
            removal_opacity_threshold=0.005,
            final_removal_opacity_threshold=0.005,
            reset_opacities_every=3000,
        ),
    ),
    viz=dict(
        render_mode="color",
        offset_first_viz_cam=True,
        show_sil=False,
        visualize_cams=True,
        viz_w=600,
        viz_h=340,
        viz_near=0.01,
        viz_far=100.0,
        view_scale=2,
        viz_fps=5,
        enter_interactive_post_online=True,
    ),
)
