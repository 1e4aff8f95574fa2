"""Multi-chip SPMD tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hierslam_tpu.core.camera import intrinsics_matrix, setup_camera
from hierslam_tpu.ops.rasterize import RasterConfig
from hierslam_tpu.parallel import make_dp_mapping_step, make_mesh, make_tile_sharded_render
from hierslam_tpu.slam import optim
from hierslam_tpu.slam.losses import LossConfig, render_gaussians

from test_slam_steps import _camera, _synthetic_map

RC = RasterConfig(max_per_tile=256, gaussian_chunk=64, tile_batch=4)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh(8)
    assert mesh.shape["data"] == 8


@pytest.mark.slow
def test_tile_sharded_render_matches_single():
    camera = _camera(W=64, H=48)
    params = _synthetic_map(jax.random.PRNGKey(0))
    ref = render_gaussians(
        params, None, jnp.array([1.0, 0, 0, 0]), jnp.zeros(3), camera, RC,
        with_semantic=False, gaussians_grad=False, camera_grad=False,
    )
    mesh = make_mesh(4)
    render = make_tile_sharded_render(mesh, camera, RC)
    im, depth = render(params)
    np.testing.assert_allclose(np.asarray(im), np.asarray(ref.im), atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref.depth), atol=1e-4)


@pytest.mark.slow
def test_dp_mapping_step_runs_and_improves():
    camera = _camera(W=64, H=48)
    gt = _synthetic_map(jax.random.PRNGKey(1))
    out = render_gaussians(
        gt, None, jnp.array([1.0, 0, 0, 0]), jnp.zeros(3), camera, RC,
        with_semantic=False, gaussians_grad=False, camera_grad=False,
    )
    mesh = make_mesh(4)
    loss_cfg = LossConfig(use_sil_for_loss=False, sil_thres=0.5, w_im=0.5, w_depth=1.0)
    lrs = dict(means3D=1e-4, rgb_colors=2.5e-2, unnorm_rotations=1e-3,
               logit_opacities=0.05, log_scales=1e-3)
    step = make_dp_mapping_step(mesh, camera, loss_cfg, RC, lrs)

    params = dict(gt)
    params["rgb_colors"] = jnp.clip(
        params["rgb_colors"] + 0.3 * jax.random.normal(jax.random.PRNGKey(2), (600, 3)), 0, 1
    )
    variables = {"active": jnp.ones((600,), bool)}
    batch = {
        "im": jnp.broadcast_to(out.im[None], (4, 3, 48, 64)),
        "depth": jnp.broadcast_to(out.depth[None], (4, 48, 64)),
        "quat": jnp.broadcast_to(jnp.array([1.0, 0, 0, 0])[None], (4, 4)),
        "trans": jnp.zeros((4, 3)),
    }
    gp = {k: params[k] for k in ("means3D", "rgb_colors", "unnorm_rotations",
                                 "logit_opacities", "log_scales")}
    opt = optim.adam_init(gp)
    mlp, mlp_state = None, None
    losses = []
    for it in range(12):
        params, opt, mlp, mlp_state, loss = step(
            params, variables, batch, opt, mlp, mlp_state, it
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def _mapper_fixture():
    """Shared state for the DP-vs-single mapper equivalence tests."""
    from hierslam_tpu.core import gaussians as G

    camera = _camera(W=64, H=48)
    gt = _synthetic_map(jax.random.PRNGKey(3))
    n = gt["means3D"].shape[0]
    params = G.empty_params(512 + n - n % 512 if n % 512 else n, 4, 0)
    cap = params["means3D"].shape[0]
    for k in ("means3D", "rgb_colors", "unnorm_rotations", "logit_opacities",
              "log_scales"):
        params[k] = params[k].at[:n].set(gt[k])
    params["cam_unnorm_rots"] = gt["cam_unnorm_rots"]
    params["cam_trans"] = gt["cam_trans"]
    variables = G.empty_variables(cap)
    variables["active"] = variables["active"].at[:n].set(True)
    variables["n_active"] = jnp.asarray(n, jnp.int32)
    variables["scene_radius"] = jnp.asarray(2.0, jnp.float32)

    out = render_gaussians(
        params, variables["active"], jnp.array([1.0, 0, 0, 0]), jnp.zeros(3),
        camera, RC, with_semantic=False, gaussians_grad=False, camera_grad=False,
    )
    W_frames = 4
    window = {
        "im": jnp.broadcast_to(jnp.clip(out.im, 0, 1)[None], (W_frames, 3, 48, 64)),
        "depth": jnp.broadcast_to(out.depth[None], (W_frames, 48, 64)),
        "time_idx": jnp.arange(W_frames, dtype=jnp.int32) % 4,
    }
    # perturb colors so mapping has something to optimize
    params["rgb_colors"] = jnp.clip(
        params["rgb_colors"]
        + 0.3 * jax.random.normal(jax.random.PRNGKey(4), (cap, 3)), 0, 1
    )
    return camera, params, variables, window


@pytest.mark.slow
def test_dp_mapper_matches_single_device():
    """make_dp_mapper with all D columns equal must reproduce the
    single-device make_mapper trajectory exactly (pmean of identical
    per-device gradients == the single gradient)."""
    from hierslam_tpu.parallel import make_dp_mapper
    from hierslam_tpu.slam.mapping import PruneConfig, make_mapper

    camera, params, variables, window = _mapper_fixture()
    loss_cfg = LossConfig(use_sil_for_loss=False, sil_thres=0.5, w_im=0.5,
                          w_depth=1.0)
    lrs = dict(means3D=1e-4, rgb_colors=2.5e-3, unnorm_rotations=1e-3,
               logit_opacities=0.05, log_scales=1e-3)
    iters = 6
    prune = PruneConfig(start_after=10**9)
    single = make_mapper(camera, loss_cfg, RC, lrs, iters, prune)
    mesh = make_mesh(8)
    dp = make_dp_mapper(mesh, camera, loss_cfg, RC, lrs, iters, prune)

    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 4, iters), jnp.int32)
    p1, v1, _, _, losses1 = single(params, variables, window, idx, None, None)
    idx_dp = jnp.broadcast_to(idx[:, None], (iters, 8))
    p2, v2, _, _, losses2 = dp(params, variables, window, idx_dp, None, None)

    # fp-level tolerance: the phase-level GT-SSIM statistics conv compiles
    # under different partitioning contexts (plain jit vs mesh), giving
    # ~1e-4-relative reduce-order differences that Adam then carries.
    np.testing.assert_allclose(
        np.asarray(losses1["loss"]), np.asarray(losses2["loss"]), rtol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(p1["means3D"]), np.asarray(p2["means3D"]), atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(p1["rgb_colors"]), np.asarray(p2["rgb_colors"]), atol=3e-4
    )


@pytest.mark.slow
def test_dp_mapper_batched_improves():
    """Distinct per-device frames: the batched-gradient phase must run and
    reduce the loss."""
    from hierslam_tpu.parallel import make_dp_mapper
    from hierslam_tpu.slam.mapping import PruneConfig

    camera, params, variables, window = _mapper_fixture()
    loss_cfg = LossConfig(use_sil_for_loss=False, sil_thres=0.5, w_im=0.5,
                          w_depth=1.0)
    lrs = dict(means3D=1e-4, rgb_colors=2.5e-2, unnorm_rotations=1e-3,
               logit_opacities=0.05, log_scales=1e-3)
    iters = 8
    mesh = make_mesh(8)
    dp = make_dp_mapper(mesh, camera, loss_cfg, RC, lrs, iters,
                        PruneConfig(start_after=10**9))
    rng = np.random.default_rng(1)
    idx_dp = jnp.asarray(rng.integers(0, 4, (iters, 8)), jnp.int32)
    _, _, _, _, losses = dp(params, variables, window, idx_dp, None, None)
    tr = np.asarray(losses["loss"])
    assert np.isfinite(tr).all()
    assert tr[-1] < tr[0]


@pytest.mark.slow
def test_runner_dp_mapping_e2e(tmp_path):
    """Full SLAMRunner with parallel.map_data_devices: the mapping phase
    runs keyframe-DP under shard_map on the virtual mesh end-to-end."""
    from fabricate import fabricate_replica
    from test_e2e import small_config

    from hierslam_tpu.slam.pipeline import SLAMRunner

    basedir, seq, _ = fabricate_replica(
        str(tmp_path / "data"), n_frames=4, semantic=True
    )
    cfg = small_config(basedir, seq, workdir=str(tmp_path / "out"))
    cfg["parallel"] = dict(map_data_devices=8)
    cfg["map_every"] = 2
    cfg["tracking"]["num_iters"] = 4
    cfg["mapping"]["num_iters"] = 4
    runner = SLAMRunner(cfg)
    for t in range(4):
        runner.step(t)
    assert np.isfinite(runner.logger.last["mapping_loss"])
    assert np.isfinite(runner.logger.last["tracking_loss"])
