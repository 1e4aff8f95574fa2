"""Ablation breakdown of one mapping iteration's cost on the TPU."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from hierslam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from hierslam_tpu.core import gaussians as G
from hierslam_tpu.core import transforms
from hierslam_tpu.core.camera import intrinsics_matrix, setup_camera
from hierslam_tpu.ops.rasterize import RasterConfig, compute_binning, rasterize
from hierslam_tpu.slam.losses import LossConfig, mapping_loss, render_gaussians

N, K, SEM = 100_000, 512, 26
H, W = 680, 1200
rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)
params = G.empty_params(N, 8, SEM)
params["means3D"] = jnp.asarray(
    np.stack([rng.uniform(-3, 3, N), rng.uniform(-2, 2, N), rng.uniform(0.5, 5, N)], -1
             ).astype(np.float32))
params["rgb_colors"] = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))
params["logit_opacities"] = jnp.asarray(rng.normal(1.5, 1.0, (N, 1)).astype(np.float32))
params["log_scales"] = jnp.asarray(np.log(rng.uniform(0.008, 0.03, (N, 1))).astype(np.float32))
params["semantic"] = jax.random.uniform(key, (N, SEM))
active = jnp.ones((N,), bool)
camera = setup_camera(W, H, intrinsics_matrix(600, 600, 599.5, 339.5), np.eye(4))
rc = RasterConfig(max_per_tile=K, gaussian_chunk=256, tile_batch=48)
q0, t0v = jnp.array([1.0, 0, 0, 0]), jnp.zeros(3)

out = render_gaussians(params, active, q0, t0v, camera, rc,
                       with_semantic=False, gaussians_grad=False, camera_grad=False)
im_gt, depth_gt = jnp.clip(out.im, 0, 1), out.depth
labels = jnp.asarray(np.concatenate(
    [rng.integers(0, n, (1, H, W)) for n in (2, 3, 5, 7, 9, 102)], 0).astype(np.int32))
loss_cfg = LossConfig(use_sil_for_loss=False, sil_thres=0.5, w_im=0.5, w_depth=1.0,
                      w_sem=0.2, sem_levels=(2, 3, 5, 7, 9), num_leaf=102, use_mlp=True)
mlp = {"w": jax.random.normal(key, (102, SEM)) * 0.1, "b": jnp.zeros(102)}

gkeys = ["means3D", "rgb_colors", "unnorm_rotations", "logit_opacities",
         "log_scales", "semantic"]
gp0 = {k: params[k] for k in gkeys}


def timeit(name, f, *args, reps=3):
    r = f(*args)
    lv = float(jax.tree_util.tree_leaves(r)[0].reshape(-1)[0])
    t0 = time.time()
    for _ in range(reps):
        r = f(*args)
        lv = float(jax.tree_util.tree_leaves(r)[0].reshape(-1)[0])
    print(f"{name}: {(time.time()-t0)/reps*1e3:.1f} ms", flush=True)
    return r


# 1. binning alone
@jax.jit
def just_bin(gp):
    b = compute_binning(gp["means3D"], jnp.exp(gp["log_scales"]),
                        gp["unnorm_rotations"], camera, rc, active=active)
    return b.lists.count

timeit("binning(+inverse)", just_bin, gp0)

binning0 = jax.jit(lambda gp: compute_binning(
    gp["means3D"], jnp.exp(gp["log_scales"]), gp["unnorm_rotations"],
    camera, rc, active=active))(gp0)
binning0 = jax.tree_util.tree_map(lambda x: x, binning0)


def full_loss(gp, mlp_, binning_cache):
    means_cam, rots = transforms.transform_to_frame(
        gp["means3D"], gp["unnorm_rotations"], q0, t0v,
        gaussians_grad=True, camera_grad=False)
    o = rasterize(means_cam, gp["rgb_colors"],
                  jax.nn.sigmoid(gp["logit_opacities"][:, 0]),
                  jnp.exp(gp["log_scales"]), transforms.normalize(rots), camera,
                  semantics=gp["semantic"], active=active, config=rc,
                  binning_cache=binning_cache)
    loss, _ = mapping_loss(o, im_gt, depth_gt, labels, mlp_, 20, loss_cfg)
    return loss


# 2. forward only, fresh binning
timeit("fwd fresh-bin", jax.jit(lambda gp, m: full_loss(gp, m, None)), gp0, mlp)
# 3. forward only, cached binning
timeit("fwd cached-bin", jax.jit(lambda gp, m: full_loss(gp, m, binning0)), gp0, mlp)
# 4. grad, cached binning
timeit("grad cached-bin", jax.jit(jax.grad(lambda gp, m: full_loss(gp, m, binning0),
                                           argnums=(0, 1))), gp0, mlp)
# 5. grad, fresh binning (the current mapping iteration)
timeit("grad fresh-bin", jax.jit(jax.grad(lambda gp, m: full_loss(gp, m, None),
                                          argnums=(0, 1))), gp0, mlp)


# 6. losses only (no render): CE+SSIM on fixed images
@jax.jit
def loss_only(mlp_):
    loss, _ = mapping_loss(out._replace(semantic=jnp.zeros((SEM, H, W))),
                           im_gt, depth_gt, labels, mlp_, 20, loss_cfg)
    return loss

timeit("losses-on-images fwd", loss_only, mlp)
