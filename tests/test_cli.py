"""CLI entry points exercised end-to-end in subprocesses (CPU)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from fabricate import fabricate_replica

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIG_TEMPLATE = '''
config = dict(
    workdir="{workdir}",
    run_name="cli",
    seed=0,
    map_every=2,
    keyframe_every=2,
    mapping_window_size=3,
    eval_every=2,
    scene_radius_depth_ratio=3,
    mean_sq_dist_method="projective",
    gaussian_distribution="isotropic",
    map_capacity=16384,
    raster=dict(max_per_tile=128, gaussian_chunk=32, tile_batch=4),
    model=dict(flag_use_embedding=1, eval_gt_transfer=False),
    data=dict(
        basedir="{basedir}",
        basedir_sem="{basedir}",
        sequence="{seq}",
        dataset_name="replica_semantic",
        sem_mode="tree",
        num_tree_level=2,
        use_pyramid=False,
        pyramid_level=4,
        desired_image_height=48,
        desired_image_width=64,
        start=0, end=-1, stride=1, num_frames=4,
        camera_params=dict(image_height=48, image_width=64, fx=40.0, fy=40.0,
                           cx=32.0, cy=24.0, png_depth_scale=6553.5),
    ),
    tracking=dict(
        use_gt_poses=True, forward_prop=True, num_iters=4,
        use_sil_for_loss=True, sil_thres=0.99, use_l1=True,
        ignore_outlier_depth_loss=False,
        loss_weights=dict(im=0.5, depth=1.0),
        lrs=dict(means3D=0.0, rgb_colors=0.0, unnorm_rotations=0.0,
                 logit_opacities=0.0, log_scales=0.0, semantic=0.0,
                 cam_unnorm_rots=0.002, cam_trans=0.01),
    ),
    mapping=dict(
        num_iters=6, add_new_gaussians=True, sil_thres=0.5, use_l1=True,
        use_sil_for_loss=False, ignore_outlier_depth_loss=False,
        loss_weights=dict(im=0.5, depth=1.0, sem=0.2),
        lrs=dict(means3D=0.0001, rgb_colors=0.0025, unnorm_rotations=0.001,
                 logit_opacities=0.05, log_scales=0.001, semantic=0.05,
                 cam_unnorm_rots=0.0, cam_trans=0.0),
        prune_gaussians=True,
        pruning_dict=dict(start_after=0, remove_big_after=0, stop_after=20,
                          prune_every=20, removal_opacity_threshold=0.005,
                          final_removal_opacity_threshold=0.005,
                          reset_opacities=False, reset_opacities_every=500),
        use_gaussian_splatting_densification=False,
    ),
)
'''


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = ""  # let the subprocess conftest-free code pick cpu
    env["HIERSLAM_FORCE_CPU"] = "1"
    return env


@pytest.mark.slow
def test_run_slam_and_export_cli(tmp_path):
    basedir, seq, _ = fabricate_replica(str(tmp_path / "data"), n_frames=4, semantic=True)
    cfg_path = tmp_path / "cfg.py"
    cfg_path.write_text(
        CONFIG_TEMPLATE.format(workdir=str(tmp_path / "exp"), basedir=basedir, seq=seq)
    )
    # run via the python API path the CLI uses (subprocess would re-init the
    # axon TPU plugin; force cpu through a tiny driver)
    driver = tmp_path / "driver.py"
    driver.write_text(
        "import sys\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"sys.argv = ['run_slam.py', {str(cfg_path)!r}]\n"
        f"exec(open({os.path.join(REPO, 'scripts', 'run_slam.py')!r}).read())\n"
    )
    out = subprocess.run(
        [sys.executable, str(driver)], capture_output=True, text=True, timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    run_dir = tmp_path / "exp" / "cli"
    assert (run_dir / "params.npz").is_file()
    assert (run_dir / "config.py").is_file()

    # export CLI
    driver2 = tmp_path / "driver2.py"
    driver2.write_text(
        "import sys\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"sys.argv = ['export_ply.py', {str(run_dir)!r}, '--semantic',"
        " '--num-semantic', '2', '4', '4']\n"
        f"exec(open({os.path.join(REPO, 'scripts', 'export_ply.py')!r}).read())\n"
    )
    out2 = subprocess.run(
        [sys.executable, str(driver2)], capture_output=True, text=True, timeout=300,
    )
    assert out2.returncode == 0, out2.stderr[-2000:]
    assert (run_dir / "splat_semantic.ply").is_file()
