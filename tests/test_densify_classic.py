"""Classic gradient-driven clone/split densification over capacity slots."""
import jax
import jax.numpy as jnp
import numpy as np

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
