"""ScanNet semantic SLAM, large raw-id tree (~550 classes, 74-dim embedding).

TPU-native port of the reference run configuration
(configs/replica/hierslam_semantic_run.py) — same schedule, losses and
learning rates; adds the TPU-only knobs `map_capacity` and `raster`.
"""
import os

scenes = ["scene0000_00", "scene0059_00", "scene0106_00", "scene0169_00", "scene0181_00", "scene0207_00"]

seed = int(os.environ.get("SEED", 0))
scene_name = scenes[int(os.environ.get("SCENE_NUM", 0))]

map_every = 1
keyframe_every = 8
mapping_window_size = 10
tracking_iters = 100
mapping_iters = 30

group_name = "ScanNet_semantic_large"
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
    map_capacity=3_000_000,
    raster=dict(tile_shape=(16, 16), max_per_tile=1024, gaussian_chunk=256, tile_batch=48,
                grad_pair_budget=2_100_000, grad_bf16=True,  # covers 16k rows x 128
                # MAPPING runs the ragged pair-streamed renderer
                # (ops/render_stream.py; see the Replica flagship config
                # for the design notes).  16k rows = 2M pairs/frame at
                # the 640x480 / 1200-tile grid.
                backend="stream",
                stream_rows=16_000, stream_cap=4_096,
                # TRACKING: flat per-tile capacity, no saturation
                # capping (the rank ladder under-capacitated 84% of
                # tiles at real density and diverged the 200-frame
                # real-shape run -- see the Replica flagship config).
                track_max_per_tile=512,
                track_sat_margin=0.0,
                # ladder spec for non-stream renders (densify, eval, viz)
                bucket_spec=((128, 4096), (384, 1024), (768, 512), (-1, 256)),
                sat_margin=2.0, sat_floor=128,
                # ladder-backend-only knob (the stream mapper bins full-N)
                visible_budget=1_500_000),
    model=dict(
        flag_use_embedding=1,
        eval_gt_transfer=False,
    ),
    data=dict(
        basedir=os.environ.get("SCANNET_DIR", "/data/scannet"),
        basedir_sem=os.environ.get("SCANNET_DIR", "/data/scannet"),
        gradslam_data_cfg="./configs/data/scannet_semantic.yaml",
        sequence=scene_name,
        desired_image_height=480,
        desired_image_width=640,
        start=0,
        end=-1,
        stride=1,
        num_frames=-1,
        sem_mode="tree_large",
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
        ignore_outlier_depth_loss=True,
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
        loss_weights=dict(im=0.5, depth=1.0, sem=0.1),
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
