"""Stress the stream render path in isolation at real density.

Builds the map_probe scene (N gaussians, 1200x680), computes ONE stream
binning, then scans gather->blend->backward LOOP times inside a single
execution — the pieces of the mapping iteration that are unique to the
stream backend, with real (blending) data.  Used to corner the TPU worker
crash seen in full mapping phases: if this crashes, the fault is in
gather/blend/routing; if not, it is in the surrounding loss/Adam/binning.

Usage: [envs as map_probe] python tools/stream_stress.py [N] [LOOP] [SEM]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from hierslam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp

from hierslam_tpu.core import gaussians as G
from hierslam_tpu.core.camera import intrinsics_matrix, setup_camera
from hierslam_tpu.ops.rasterize import RasterConfig
from hierslam_tpu.slam.losses import render_packed_stream
from hierslam_tpu.ops.gather_vjp import pack_cols_table
from hierslam_tpu.ops.render_stream import compute_stream_binning

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
LOOP = int(sys.argv[2]) if len(sys.argv) > 2 else 60
SEM = int(sys.argv[3]) if len(sys.argv) > 3 else 26
H, W = 680, 1200

rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)
params = G.empty_params(N, 8, SEM)
params["means3D"] = jnp.asarray(
    np.stack([rng.uniform(-3, 3, N), rng.uniform(-2, 2, N),
              rng.uniform(0.5, 5, N)], -1).astype(np.float32))
params["rgb_colors"] = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))
params["logit_opacities"] = jnp.asarray(
    rng.normal(1.5, 1.0, (N, 1)).astype(np.float32))
params["log_scales"] = jnp.asarray(
    np.log(rng.uniform(0.008, 0.03, (N, 1))).astype(np.float32))
if SEM:
    params["semantic"] = jax.random.uniform(key, (N, SEM))

camera = setup_camera(W, H, intrinsics_matrix(600, 600, 599.5, 339.5),
                      np.eye(4))
rc = RasterConfig(
    max_per_tile=1024, gaussian_chunk=256, tile_batch=48,
    grad_pair_budget=int(os.environ.get("PROBE_PAIR_BUDGET", "2000000")),
    grad_bf16=os.environ.get("PROBE_BF16", "1") == "1",
    sat_margin=float(os.environ.get("PROBE_SAT_MARGIN", "2.0")),
    sat_floor=int(os.environ.get("PROBE_SAT_FLOOR", "128")),
    visible_budget=int(os.environ.get("PROBE_VIS", "1500000")),
    backend="stream",
    stream_rows=int(os.environ.get("PROBE_STREAM_ROWS", "32000")),
    stream_cap=int(os.environ.get("PROBE_STREAM_CAP", "4096")),
)

sb = jax.jit(lambda: compute_stream_binning(
    params["means3D"], jnp.exp(params["log_scales"]),
    params["unnorm_rotations"], camera, rc,
    opacities=jax.nn.sigmoid(params["logit_opacities"][:, 0]),
    compact=rc.visible_budget > 0,
))()
print("binning rows", int(sb.lists.n_rows), "refs", int(sb.lists.n_refs),
      flush=True)

cols = ([params["means3D"][:, i] for i in range(3)]
        + [params["log_scales"][:, 0], params["logit_opacities"][:, 0]]
        + [params["rgb_colors"][:, i] for i in range(3)])
if SEM:
    cols += [params["semantic"][:, i] for i in range(SEM)]
table = pack_cols_table(cols, width_mult=8)
active = jnp.ones((N,), bool)
q0 = jnp.array([1.0, 0, 0, 0])
t0_ = jnp.zeros(3)


IN_JIT = os.environ.get("STRESS_INJIT", "0") == "1"
FULL_LOSS = os.environ.get("STRESS_FULL_LOSS", "0") == "1"
ADAM = os.environ.get("STRESS_ADAM", "0") == "1"
WIN = int(os.environ.get("STRESS_WIN", "4"))

if FULL_LOSS:
    from hierslam_tpu.slam import optim
    from hierslam_tpu.slam.losses import LossConfig, mapping_loss, mlp_init
    from hierslam_tpu.slam.losses import render_gaussians as _rg
    from hierslam_tpu.ops.ssim import ssim_ref_stats

    sem_levels = (2, 3, 5, 7, 9) if SEM == 26 else ()
    loss_cfg = LossConfig(
        use_sil_for_loss=False, sil_thres=0.5, w_im=0.5, w_depth=1.0,
        w_sem=0.2 if SEM else 0.0, sem_levels=sem_levels, num_leaf=102,
        use_mlp=bool(SEM))
    out0 = _rg(params, active, q0, t0_, camera, rc, with_semantic=False,
               gaussians_grad=False, camera_grad=False)
    im_gt = jnp.clip(out0.im, 0, 1)
    depth_gt = out0.depth
    labels = jnp.asarray(np.concatenate(
        [rng.integers(0, n, (1, H, W)) for n in sem_levels + (102,)],
        0).astype(np.int32)) if SEM else None
    gt_ssim = ssim_ref_stats(im_gt)
    mlp = mlp_init(SEM, 102, key) if SEM else None
else:
    mlp = None
    if ADAM:
        from hierslam_tpu.slam import optim


def loss(tb, bc, mlp_=None, it=0):
    out = render_packed_stream(tb, active, bc, q0, t0_, camera, rc, 3 + SEM)
    if FULL_LOSS:
        l, _ = mapping_loss(out, im_gt, depth_gt, labels, mlp_, it,
                            loss_cfg, gt_ssim=gt_ssim)
        return l
    return (jnp.sum(out.im) * 1e-3 + jnp.sum(out.depth) * 1e-4
            + jnp.sum(out.final_opacity) * 1e-3)


rand_idx = jnp.asarray(rng.integers(0, WIN, LOOP), jnp.int32)


PACK_INJIT = os.environ.get("STRESS_PACK_INJIT", "0") == "1"
PACK_MULT = int(os.environ.get("STRESS_PACK_MULT", "8"))


DYNPOSE = os.environ.get("STRESS_DYNPOSE", "0") == "1"
wq_all = jnp.tile(q0[None], (WIN, 1))
wt_all = jnp.tile(t0_[None], (WIN, 1))


@jax.jit
def stress(tb, cols_=None):
    if IN_JIT and DYNPOSE:
        wq = jax.lax.stop_gradient(wq_all)
        wt = jax.lax.stop_gradient(wt_all)
    if PACK_INJIT:
        tb = pack_cols_table(cols_, width_mult=PACK_MULT)
    if IN_JIT:
        # mirror the mapper: binnings built in the SAME program (lax.map
        # over window poses), sliced per iteration by a dynamic index
        margin = float(os.environ.get("STRESS_MARGIN", "0"))

        from hierslam_tpu.core import transforms as _tf

        def bin_one(arg):
            if DYNPOSE:
                q_, t_ = arg
                means_cam, _ = _tf.transform_to_frame(
                    params["means3D"], params["unnorm_rotations"], q_, t_,
                    gaussians_grad=False, camera_grad=False)
            else:
                means_cam = params["means3D"]
            return compute_stream_binning(
                means_cam, jnp.exp(params["log_scales"]),
                params["unnorm_rotations"], camera, rc, active=active,
                margin_px=margin,
                opacities=jax.nn.sigmoid(params["logit_opacities"][:, 0]),
                compact=rc.visible_budget > 0,
            )

        binnings = jax.lax.map(
            bin_one, (wq, wt) if DYNPOSE else jnp.arange(WIN),
            batch_size=4)

    if ADAM:
        opt = optim.adam_init({"table": tb})
        lr_vec = jnp.zeros((tb.shape[1],)).at[0:3].set(1e-4).at[3].set(
            1e-3).at[4].set(0.05).at[5:8].set(2.5e-3)
        if SEM:
            lr_vec = lr_vec.at[8:8 + SEM].set(0.05)
        win_im = jnp.broadcast_to(im_gt[None], (WIN,) + im_gt.shape)
        win_dep = jnp.broadcast_to(depth_gt[None], (WIN,) + depth_gt.shape)

        def body(carry, it):
            tb_, opt_, act_ = carry
            bc = (jax.tree_util.tree_map(lambda x: x[rand_idx[it]], binnings)
                  if IN_JIT else sb)
            k = rand_idx[it]

            def loss_win(tb__, mlp__):
                q_ = wq[k] if (IN_JIT and DYNPOSE) else q0
                t__ = wt[k] if (IN_JIT and DYNPOSE) else t0_
                out = render_packed_stream(
                    tb__, act_, bc, q_, t__, camera, rc, 3 + SEM)
                l, _ = mapping_loss(
                    out, win_im[k], win_dep[k], labels, mlp__, it, loss_cfg,
                    gt_ssim=gt_ssim)
                return l

            l, g = jax.value_and_grad(loss_win)(tb_, mlp)
            # prune block (mapper shape): column reads + active carry +
            # moment-row surgery
            small = jax.nn.sigmoid(tb_[:, 4]) < 0.005
            big = jnp.exp(tb_[:, 3]) > 0.23
            removed = (it % 20 == 0) & act_ & (small | big)
            act_ = act_ & ~removed
            opt_ = optim.zero_moment_rows(opt_, removed)
            gp_, opt_ = optim.adam_step(
                {"table": tb_}, {"table": g}, opt_, {"table": lr_vec},
                eps=1e-15)
            return (gp_["table"], opt_, act_), l

        (_, _, _), ls = jax.lax.scan(
            body, (tb, opt, active), jnp.arange(LOOP))
        return 0.0, ls

    def body(c, it):
        bc = (jax.tree_util.tree_map(lambda x: x[rand_idx[it]], binnings)
              if IN_JIT else sb)
        l, g = jax.value_and_grad(loss)(
            tb, bc, mlp if FULL_LOSS else None, it)
        return c + l * 0, l + jnp.sum(g) * 1e-9
    return jax.lax.scan(body, 0.0, jnp.arange(LOOP))


t0 = time.time()
_pack_args = (tuple(cols),) if os.environ.get("STRESS_PACK_INJIT", "0") == "1" else ()
_, ls = jax.block_until_ready(stress(table, *_pack_args))
print(f"stress{LOOP} compile+run {time.time()-t0:.1f}s l={float(ls[-1]):.4f}",
      flush=True)
t0 = time.time()
_pack_args = (tuple(cols),) if os.environ.get("STRESS_PACK_INJIT", "0") == "1" else ()
_, ls = jax.block_until_ready(stress(table, *_pack_args))
dt = time.time() - t0
print(f"stress{LOOP} run {dt:.2f}s ({dt/LOOP*1e3:.1f} ms/iter "
      f"gather+blend+bwd+route)", flush=True)
