"""Classic gradient-driven clone/split densification over capacity slots."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hierslam_tpu.core import gaussians as G
from hierslam_tpu.slam import optim
from hierslam_tpu.slam.densify_classic import (
    DensifyConfig,
    accumulate_mean2d_gradient,
    densify_step,
)


def test_clone_and_split():
    cap = 64
    params = G.empty_params(cap, 2)
    variables = G.empty_variables(cap)
    fields = {
        "means3D": jnp.asarray(np.random.default_rng(0).normal(size=(8, 3)), jnp.float32),
        "rgb_colors": jnp.full((8, 3), 0.5),
        "unnorm_rotations": jnp.zeros((8, 4)).at[:, 0].set(1.0),
        "logit_opacities": jnp.full((8, 1), 2.0),
        "log_scales": jnp.log(jnp.full((8, 1), 0.05)),
    }
    params, variables, _ = G.insert_gaussians(params, variables, fields, jnp.ones(8, bool), 0.0)
    variables["scene_radius"] = jnp.asarray(1.0)

    # gaussians 0,1 have high mean2d grads; 0 is small (clone), 1 big (split)
    params["log_scales"] = params["log_scales"].at[1, 0].set(jnp.log(0.05))
    params["log_scales"] = params["log_scales"].at[0, 0].set(jnp.log(0.005))
    g2d = jnp.zeros((cap, 2)).at[0].set(jnp.array([1e-3, 0.0])).at[1].set(jnp.array([0.0, 1e-3]))
    seen = variables["active"]
    variables = accumulate_mean2d_gradient(variables, g2d, seen)
    np.testing.assert_allclose(float(variables["denom"][0]), 1.0)

    gp = {k: params[k] for k in G.GAUSSIAN_KEYS if k in params}
    opt = optim.adam_init(gp)
    params2, variables2, opt2, over = densify_step(
        params, variables, opt, 100, DensifyConfig(grad_thresh=5e-4, num_to_split_into=2),
        jax.random.PRNGKey(0),
    )
    assert int(over) == 0
    # gaussian 0 cloned (+1), gaussian 1 split into 2 (+2, -1) => net +2 active
    n_active = int(jnp.sum(variables2["active"]))
    assert n_active == 8 + 1 + 2 - 1
    # split original deactivated
    assert not bool(variables2["active"][1])
    # split children have shrunken scales: log(0.05) - log(1.6)
    kids = np.asarray(params2["log_scales"][9:11, 0])
    np.testing.assert_allclose(kids, np.log(0.05) - np.log(1.6), atol=1e-5)
    # stats reset
    assert float(jnp.sum(variables2["means2D_gradient_accum"])) == 0.0


@pytest.mark.slow
def test_means2d_offset_gradients_flow():
    """rasterize's means2D_offset hook receives screen-space gradients."""
    from hierslam_tpu.core.camera import intrinsics_matrix, setup_camera
    from hierslam_tpu.ops.rasterize import RasterConfig, rasterize
    from golden import make_scene

    scene, cam = make_scene(n=30, seed=0, W=32, H=16)
    camera = setup_camera(cam["W"], cam["H"],
                          intrinsics_matrix(cam["fx"], cam["fy"], cam["cx"], cam["cy"]),
                          cam["w2c"])
    rc = RasterConfig(max_per_tile=64, gaussian_chunk=16, tile_batch=2)

    def loss(off):
        out = rasterize(
            jnp.asarray(scene["means3D"], jnp.float32),
            jnp.asarray(scene["colors"], jnp.float32),
            jnp.asarray(scene["opacities"], jnp.float32),
            jnp.asarray(scene["scales"], jnp.float32),
            jnp.asarray(scene["rotations"], jnp.float32),
            camera, config=rc, means2D_offset=off,
        )
        return jnp.sum(out.im**2)

    g = jax.grad(loss)(jnp.zeros((30, 2)))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.sum(jnp.abs(g))) > 0


@pytest.mark.slow
def test_mapper_with_classic_densify_enabled():
    """use_gaussian_splatting_densification wired into the mapper
    (scripts/hierslam.py:2047): clones/splits fire on the densify schedule,
    new gaussians render from the next iteration (segmented re-binning),
    and the loss stays finite and improves."""
    from hierslam_tpu.core.camera import intrinsics_matrix, setup_camera
    from hierslam_tpu.ops.rasterize import RasterConfig
    from hierslam_tpu.slam.losses import LossConfig, render_gaussians
    from hierslam_tpu.slam.mapping import PruneConfig, make_mapper

    camera = setup_camera(64, 48, intrinsics_matrix(40.0, 40.0, 32.0, 24.0),
                          np.eye(4))
    rc = RasterConfig(max_per_tile=256, gaussian_chunk=64, tile_batch=4)
    key = jax.random.PRNGKey(5)
    n = 200
    k1, k2 = jax.random.split(key)
    gt = {
        "means3D": jnp.stack([
            jax.random.uniform(k1, (n,), minval=-1.2, maxval=1.2),
            jax.random.uniform(k2, (n,), minval=-0.9, maxval=0.9),
            2.5 + jnp.zeros((n,)),
        ], -1),
        "rgb_colors": jax.random.uniform(k2, (n, 3)),
        "unnorm_rotations": jnp.zeros((n, 4)).at[:, 0].set(1.0),
        "logit_opacities": jnp.full((n, 1), 4.0),
        "log_scales": jnp.full((n, 1), jnp.log(0.08)),
        "cam_unnorm_rots": jnp.zeros((1, 4, 2)).at[:, 0, :].set(1.0),
        "cam_trans": jnp.zeros((1, 3, 2)),
    }
    out = render_gaussians(
        gt, jnp.ones((n,), bool), jnp.array([1.0, 0, 0, 0]), jnp.zeros(3),
        camera, rc, with_semantic=False, gaussians_grad=False, camera_grad=False,
    )

    cap = 4096
    params = G.empty_params(cap, 2)
    variables = G.empty_variables(cap)
    fields = {k: gt[k] for k in G.GAUSSIAN_KEYS if k in gt}
    # color mismatch -> real mapping gradients
    fields = dict(fields)
    fields["rgb_colors"] = jnp.clip(
        fields["rgb_colors"] + 0.4 * jax.random.normal(k1, (n, 3)), 0, 1)
    params, variables, _ = G.insert_gaussians(
        params, variables, fields, jnp.ones((n,), bool), 0.0)
    variables["scene_radius"] = jnp.asarray(3.0)

    cfg = LossConfig(use_sil_for_loss=False, sil_thres=0.5, w_im=0.5, w_depth=1.0)
    lrs = {"means3D": 1e-4, "rgb_colors": 2.5e-3, "unnorm_rotations": 1e-3,
           "logit_opacities": 0.05, "log_scales": 1e-3}
    dcfg = DensifyConfig(start_after=2, stop_after=12, densify_every=5,
                         grad_thresh=1e-7, num_to_split_into=2,
                         remove_big_after=10**9)
    mapper = make_mapper(camera, cfg, rc, lrs, num_iters=14,
                         prune_cfg=PruneConfig(start_after=10**9),
                         densify_cfg=dcfg)
    window = {"im": out.im[None], "depth": out.depth[None],
              "time_idx": jnp.zeros((1,), jnp.int32)}
    n_before = int(variables["n_active"])
    params2, variables2, _, _, losses = mapper(
        params, variables, window, jnp.zeros((14,), jnp.int32), None, None,
        jax.random.PRNGKey(7))
    losses_total = np.asarray(losses["loss"])
    assert np.isfinite(losses_total).all()
    # densify events at iters 5 and 10 -> active count grew (clones/splits)
    n_after = int(variables2["n_active"])
    assert n_after > n_before, (n_before, n_after)
    assert int(losses["classic_densify_overflow"][0]) == 0

    # parity: identical trajectory to a densify-off run until the first
    # event takes effect (iterations 0..5 share binning and updates)
    mapper_off = make_mapper(camera, cfg, rc, lrs, num_iters=14,
                             prune_cfg=PruneConfig(start_after=10**9))
    _, _, _, _, losses_off = mapper_off(
        params, variables, window, jnp.zeros((14,), jnp.int32), None, None)
    np.testing.assert_allclose(
        losses_total[:6], np.asarray(losses_off["loss"])[:6], rtol=2e-5)
    # and the trajectories diverge after the event (densify changed the map)
    assert abs(float(losses_total[-1] - losses_off["loss"][-1])) > 1e-6
