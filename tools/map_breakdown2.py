"""Fine-grained per-stage cost breakdown of one mapping iteration (TPU).

Stages timed separately at the bench shape (N=300k, K=512, 1200x680,
26 semantic channels), so the 496 ms/iter of BENCH_r01 can be attributed:

  binning        x24 frames amortized over 60 iters -> /2.5 share
  table build    transform + preprocess + activations + concat (fwd, vjp)
  gather fwd     [N,C] rows -> [T,K,C]
  gather bwd     inverse-map cotangent reduction
  rect_recheck   per-slot current-pose rect culling
  blend fwd/bwd  fused Pallas kernels
  loss stack     SSIM + level CEs + MLP CE on fixed images (fwd, vjp)
  adam           one step over all 6 groups
  FULL iter      grad of the whole cached-binning loss

Also micro-benchmarks gather layouts (C, dtype) to pick the fastest
row-gather strategy on this hardware.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from hierslam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from hierslam_tpu.core import gaussians as G
from hierslam_tpu.core import transforms
from hierslam_tpu.core.camera import intrinsics_matrix, setup_camera
from hierslam_tpu.ops import binning as binmod
from hierslam_tpu.ops import render_xla
from hierslam_tpu.ops.gather_vjp import build_inverse_map, gather_rows
from hierslam_tpu.ops.rasterize import RasterConfig, compute_binning, rasterize
from hierslam_tpu.ops.render_pallas import blend_tiles_pallas
from hierslam_tpu.slam import optim
from hierslam_tpu.slam.losses import LossConfig, mapping_loss, render_gaussians

N, K, SEM = 300_000, 512, 26
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
grid = rc.grid(H, W)
T_tiles = grid[0] * grid[1]
q0, t0v = jnp.array([1.0, 0, 0, 0]), jnp.zeros(3)

gkeys = ["means3D", "rgb_colors", "unnorm_rotations", "logit_opacities",
         "log_scales", "semantic"]
gp0 = {k: params[k] for k in gkeys}


def timeit(name, f, *args, reps=5):
    r = jax.block_until_ready(f(*args))
    t0 = time.time()
    for _ in range(reps):
        r = jax.block_until_ready(f(*args))
    dt = (time.time() - t0) / reps * 1e3
    print(f"{name}: {dt:.1f} ms", flush=True)
    return r, dt


# ---------------- binning ----------------
@jax.jit
def just_bin(gp):
    return compute_binning(gp["means3D"], jnp.exp(gp["log_scales"]),
                           gp["unnorm_rotations"], camera, rc, active=active,
                           margin_px=8.0)

bres, t_bin = timeit("binning(+inverse) 1 frame", just_bin, gp0)
binning0 = jax.block_until_ready(bres)

# ---------------- table build ----------------
def build_table(gp):
    means_cam, rots = transforms.transform_to_frame(
        gp["means3D"], gp["unnorm_rotations"], q0, t0v,
        gaussians_grad=True, camera_grad=False)
    from hierslam_tpu.ops import projection
    prep = projection.preprocess(
        means_cam, jnp.tile(jnp.exp(gp["log_scales"]), (1, 3)),
        transforms.normalize(rots), camera, rc.tile_shape, active=active)
    feats = jnp.concatenate([gp["rgb_colors"], gp["semantic"]], axis=1)
    table = jnp.concatenate(
        [prep.xy, prep.conic, jax.nn.sigmoid(gp["logit_opacities"]),
         prep.depth[:, None], feats], axis=1)
    return table, prep

table0, t_tb = timeit(
    "table build fwd", jax.jit(lambda gp: build_table(gp)[0]), gp0)
_, t_tbg = timeit(
    "table build fwd+bwd",
    jax.jit(jax.grad(lambda gp: jnp.sum(build_table(gp)[0]))), gp0)

prep0 = jax.block_until_ready(jax.jit(lambda gp: build_table(gp)[1])(gp0))

# ---------------- gather ----------------
from hierslam_tpu.ops.rasterize import _combined_idx

idx0 = _combined_idx(binning0.lists)   # all capacity classes, k_min-wide rows
inv0 = binning0.inverse

def _gr(t):
    return gather_rows(t, idx0, inv0.spos, inv0.ends, inv0.run_masks, 16)

_, t_gf = timeit("gather fwd [T,K,36]", jax.jit(_gr), table0)
_, t_gb = timeit(
    "gather fwd+bwd",
    jax.jit(jax.grad(lambda t: jnp.sum(_gr(t) ** 2))),
    table0)

# ---------------- rect recheck ----------------
_, t_rr = timeit(
    "rect_recheck",
    jax.jit(lambda: render_xla.rect_recheck_mask(
        idx0, prep0.rect_min, prep0.rect_max, prep0.valid, grid)))

# ---------------- blend ----------------
g0 = jax.block_until_ready(jax.jit(_gr)(table0))
ok0 = jax.block_until_ready(jax.jit(lambda: render_xla.rect_recheck_mask(
    idx0, prep0.rect_min, prep0.rect_max, prep0.valid, grid))())

_, t_bf = timeit(
    "blend pallas fwd",
    jax.jit(lambda g, ok: blend_tiles_pallas(g, ok, grid, rc.tile_shape, False)[0]),
    g0, ok0)
_, t_bb = timeit(
    "blend pallas fwd+bwd",
    jax.jit(jax.grad(lambda g, ok: jnp.sum(
        blend_tiles_pallas(g, ok, grid, rc.tile_shape, False)[0] ** 2))),
    g0, ok0)

# ---------------- loss stack ----------------
out0 = jax.block_until_ready(jax.jit(lambda: render_gaussians(
    params, active, q0, t0v, camera, rc,
    with_semantic=True, gaussians_grad=False, camera_grad=False))())
im_gt = jnp.clip(out0.im, 0, 1)
depth_gt = out0.depth
sem_levels = (2, 3, 5, 7, 9)
labels = jnp.asarray(np.concatenate(
    [rng.integers(0, n, (1, H, W)) for n in sem_levels + (102,)], 0).astype(np.int32))
loss_cfg = LossConfig(use_sil_for_loss=False, sil_thres=0.5, w_im=0.5, w_depth=1.0,
                      w_sem=0.2, sem_levels=sem_levels, num_leaf=102, use_mlp=True)
mlp = {"w": jax.random.normal(key, (102, SEM)) * 0.1, "b": jnp.zeros(102)}


def loss_on_images(im, depth, sem, mlp_):
    o = out0._replace(im=im, depth=depth, semantic=sem,
                      final_opacity=jax.lax.stop_gradient(out0.final_opacity))
    loss, _ = mapping_loss(o, im_gt, depth_gt, labels, mlp_, 20, loss_cfg)
    return loss

sem0 = out0.semantic
_, t_lf = timeit("loss stack fwd", jax.jit(loss_on_images),
                 out0.im, depth_gt, sem0, mlp)
_, t_lb = timeit(
    "loss stack fwd+bwd",
    jax.jit(jax.grad(loss_on_images, argnums=(0, 1, 2, 3))),
    out0.im, depth_gt, sem0, mlp)

# ---------------- adam ----------------
opt0 = optim.adam_init(gp0)
lrs = dict(means3D=1e-4, rgb_colors=2.5e-3, unnorm_rotations=1e-3,
           logit_opacities=0.05, log_scales=1e-3, semantic=0.05)
_, t_ad = timeit("adam step",
                 jax.jit(lambda gp, o: optim.adam_step(gp, gp, o, lrs, eps=1e-15)),
                 gp0, opt0)

# ---------------- full iteration ----------------
def full_loss(gp, mlp_, bc):
    means_cam, rots = transforms.transform_to_frame(
        gp["means3D"], gp["unnorm_rotations"], q0, t0v,
        gaussians_grad=True, camera_grad=False)
    o = rasterize(means_cam, gp["rgb_colors"],
                  jax.nn.sigmoid(gp["logit_opacities"][:, 0]),
                  jnp.exp(gp["log_scales"]), transforms.normalize(rots), camera,
                  semantics=gp["semantic"], active=active, config=rc,
                  binning_cache=bc)
    loss, _ = mapping_loss(o, im_gt, depth_gt, labels, mlp_, 20, loss_cfg)
    return loss

_, t_fw = timeit("FULL fwd (cached bin)",
                 jax.jit(lambda gp, m: full_loss(gp, m, binning0)), gp0, mlp)
_, t_fg = timeit("FULL fwd+bwd (cached bin)",
                 jax.jit(jax.grad(lambda gp, m: full_loss(gp, m, binning0),
                                  argnums=(0, 1))), gp0, mlp)

print("\n--- summary (ms) ---")
print(f"binning x24/60 amortized share: {t_bin * 24 / 60:.1f}")
print(f"table fwd+bwd:   {t_tbg:.1f}")
print(f"gather fwd+bwd:  {t_gb:.1f}")
print(f"rect_recheck:    {t_rr:.1f}")
print(f"blend fwd+bwd:   {t_bb:.1f}")
print(f"loss fwd+bwd:    {t_lb:.1f}")
print(f"adam:            {t_ad:.1f}")
print(f"sum parts:       {t_bin*24/60 + t_tbg + t_gb + t_rr + t_bb + t_lb + t_ad:.1f}")
print(f"FULL iter measured: {t_fg:.1f} (+ amortized binning {t_bin*24/60:.1f})")

# ---------------- gather micro-variants ----------------
print("\n--- gather micro-bench (1.65M rows from 300k) ---")
flat_idx = jnp.maximum(idx0.reshape(-1), 0)
for C in (8, 36, 64, 128):
    arr = jnp.asarray(rng.uniform(0, 1, (N, C)).astype(np.float32))
    _, t = timeit(f"  rows f32 C={C}",
                  jax.jit(lambda a, i: a[i]), arr, flat_idx)
    arrb = arr.astype(jnp.bfloat16)
    _, t = timeit(f"  rows bf16 C={C}",
                  jax.jit(lambda a, i: a[i]), arrb, flat_idx)

# take with clip mode
arr36 = jnp.asarray(rng.uniform(0, 1, (N, 36)).astype(np.float32))
timeit("  take C=36", jax.jit(lambda a, i: jnp.take(a, i, axis=0)), arr36, flat_idx)
# transposed layout: gather along lanes [C, N] -> [C, M]
arrT = jnp.asarray(rng.uniform(0, 1, (36, N)).astype(np.float32))
timeit("  cols-from-[36,N]", jax.jit(lambda a, i: a[:, i]), arrT, flat_idx)
# new backward: permutation gather of [T*K] rows
big = jnp.asarray(rng.uniform(0, 1, (T_tiles * K, 36)).astype(np.float32))
timeit("  perm gather [T*K] rows", jax.jit(lambda a, s: a[s]), big, inv0.spos)
