"""Replay a mapping phase from a nan_autopsy_*.npz dump, one iteration at a
time, and report the first non-finite quantity (loss parts, gradients,
parameter extremes).

    python tools/nan_autopsy.py <dump.npz> [--max-per-tile 1024]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from hierslam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def finite_report(name, x):
    x = np.asarray(x)
    bad = ~np.isfinite(x)
    if bad.any():
        print(f"  !! {name}: {bad.sum()} non-finite of {x.size}")
        return False
    if x.size:
        print(f"     {name}: min {x.min():.4g} max {x.max():.4g}")
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dump")
    ap.add_argument("--max-per-tile", type=int, default=1024)
    ap.add_argument("--budget", type=int, default=3_000_000)
    ap.add_argument("--bf16", type=int, default=1)
    ap.add_argument("--iters", type=int, default=60)
    args = ap.parse_args()

    z = np.load(args.dump)
    params = {k[6:]: jnp.asarray(z[k]) for k in z.files if k.startswith("param.")}
    variables = {k[4:]: jnp.asarray(z[k]) for k in z.files if k.startswith("var.")}
    mlp = {k[4:]: jnp.asarray(z[k]) for k in z.files if k.startswith("mlp.")}
    window = {k[7:]: jnp.asarray(z[k]) for k in z.files if k.startswith("window.")}
    rand_idx = np.asarray(z["rand_idx"])
    losses_orig = np.asarray(z["losses"])
    bad_iters = np.where(~np.isfinite(losses_orig))[0]
    print(f"original phase losses: first bad iter = "
          f"{bad_iters[0] if len(bad_iters) else 'none'} of {len(losses_orig)}")
    print("losses around it:", losses_orig[max(0, (bad_iters[0] if len(bad_iters) else 0) - 3):
                                           (bad_iters[0] if len(bad_iters) else 0) + 2])

    print("\n-- pre-phase state health --")
    for k, v in params.items():
        finite_report(f"param {k}", v)
    for k, v in variables.items():
        if np.asarray(v).dtype != bool:
            finite_report(f"var {k}", v)

    H, W = window["depth"].shape[-2:]
    from hierslam_tpu.core.camera import intrinsics_matrix, setup_camera
    from hierslam_tpu.ops.rasterize import RasterConfig
    from hierslam_tpu.slam import optim
    from hierslam_tpu.slam.losses import LossConfig
    from hierslam_tpu.slam.mapping import PruneConfig, make_mapper

    fx = 600.0 * W / 1200
    camera = setup_camera(W, H, intrinsics_matrix(fx, fx, (W - 1) / 2, (H - 1) / 2),
                          np.eye(4))
    rc = RasterConfig(max_per_tile=args.max_per_tile, gaussian_chunk=256,
                      tile_batch=48, grad_pair_budget=args.budget,
                      grad_bf16=bool(args.bf16))
    n_lvl = window["labels"].shape[1] - 1 if "labels" in window else 0
    SEM = params["semantic"].shape[1] if "semantic" in params else 0
    # proc_room uses a 2-level tree; level widths from the generator
    sem_levels = tuple(
        int(x) for x in os.environ.get("AUTOPSY_LEVELS", "6,20").split(",")
    )[:n_lvl] if n_lvl else ()
    cfg = LossConfig(
        use_sil_for_loss=False, sil_thres=0.5, w_im=0.5, w_depth=1.0,
        w_sem=0.2 if sem_levels else 0.0, sem_levels=sem_levels,
        num_leaf=mlp["w"].shape[0] if mlp else 0, use_mlp=bool(mlp),
    )
    lrs = dict(means3D=1e-4, rgb_colors=2.5e-3, unnorm_rotations=1e-3,
               logit_opacities=0.05, log_scales=1e-3, semantic=0.05)

    # single-iteration mapper, reusing the phase Adam state across calls is
    # NOT possible through make_mapper (fresh opt per call) — so replay with
    # a manual loop built on the same pieces.
    from hierslam_tpu.core import transforms as tf
    from hierslam_tpu.ops.rasterize import compute_binning
    from hierslam_tpu.slam.losses import mapping_loss, render_gaussians

    gkeys = [k for k in ("means3D", "rgb_colors", "unnorm_rotations",
                         "logit_opacities", "log_scales", "semantic") if k in params]
    gp = {k: params[k] for k in gkeys}
    opt = optim.adam_init(gp)
    mlp_state = optim.adam_init(mlp) if mlp else None

    wq = params["cam_unnorm_rots"][0].T[window["time_idx"]]
    wt = params["cam_trans"][0].T[window["time_idx"]]

    @jax.jit
    def bin_frame(gp, q, t):
        means_cam, _ = tf.transform_to_frame(
            gp["means3D"], gp["unnorm_rotations"], q, t,
            gaussians_grad=False, camera_grad=False)
        return compute_binning(
            means_cam, jnp.exp(gp["log_scales"]), gp["unnorm_rotations"],
            camera, rc, active=variables["active"], margin_px=8.0)

    @jax.jit
    def one_iter(gp, opt, mlp, mlp_state, q, t, binning, im_gt, depth_gt,
                 labels, it):
        def loss_fn(gp_, mlp_):
            full = dict(params)
            full.update(gp_)
            out = render_gaussians(
                full, variables["active"], q, t, camera, rc,
                with_semantic=bool(sem_levels), gaussians_grad=True,
                camera_grad=False, binning_cache=binning)
            loss, parts = mapping_loss(out, im_gt, depth_gt, labels, mlp_, it, cfg)
            return loss, parts

        if mlp:
            (loss, parts), (ggp, gmlp) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(gp, mlp)
        else:
            (loss, parts), ggp = jax.value_and_grad(loss_fn, has_aux=True)(gp, mlp)
            gmlp = None
        gp2, opt2 = optim.adam_step(gp, ggp, opt, lrs, eps=1e-15)
        if gmlp is not None:
            mlp, mlp_state = optim.adam_step(mlp, gmlp, mlp_state,
                                             {"w": 5e-4, "b": 5e-4}, eps=1e-8)
        gnorms = {k: jnp.max(jnp.abs(v)) for k, v in ggp.items()}
        return gp2, opt2, mlp, mlp_state, loss, parts, gnorms

    binnings = {}
    for it in range(args.iters):
        k = int(rand_idx[it])
        if k not in binnings:
            binnings[k] = jax.block_until_ready(bin_frame(gp, wq[k], wt[k]))
        labels = window["labels"][k] if "labels" in window else None
        gp, opt, mlp, mlp_state, loss, parts, gnorms = one_iter(
            gp, opt, mlp, mlp_state, wq[k], wt[k], binnings[k],
            window["im"][k], window["depth"][k], labels, it)
        lv = float(loss)
        pstr = " ".join(f"{k2}={float(v):.4g}" for k2, v in parts.items())
        gstr = " ".join(f"g.{k2}={float(v):.3g}" for k2, v in gnorms.items())
        print(f"iter {it:3d} frame {k:2d} loss={lv:.5g} | {pstr} | {gstr}",
              flush=True)
        if not np.isfinite(lv):
            print("\n-- first non-finite iteration: post-step param health --")
            for k2, v in gp.items():
                finite_report(f"param {k2}", v)
            break


if __name__ == "__main__":
    main()
