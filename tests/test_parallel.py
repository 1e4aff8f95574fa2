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
