"""Minimal-repro bisect for the narrow-table TPU worker crash.

Observed in round 4: the stream mapping phase (slam/mapping.py) with a
packed parameter table at the USED width (width_mult=8 -> 40 columns for
3+1+1+3+26) *and* visible-rank compaction (visible_budget > 0) at N=2M
reliably kills the TPU worker mid-phase ("TPU worker process crashed or
restarted"), while width 128 runs, and width 40 *without* compaction runs.
The production mapper therefore pins the table at the 128-lane width and
refuses narrow+compacted configs (RasterConfig.stream_table_width).

This script owns the repro matrix.  Each cell runs in a SUBPROCESS (a
crash takes the whole TPU client down), driving the real
``make_mapper``-built phase at the shipped knobs for a configurable
(width, visible_budget, N) triple, and the parent records ok/crash per
cell plus the tightest crashing configuration found.

Usage:
    python tools/stream_width_repro.py            # default bisect matrix
    REPRO_CELLS="40:1500000:2000000,128:1500000:2000000" \
        python tools/stream_width_repro.py        # explicit cells
    REPRO_ITERS=10 python tools/stream_width_repro.py

Writes a JSON summary to stdout (one line) and a human log to stderr.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time
sys.path.insert(0, os.environ["REPRO_REPO"])
import numpy as np
import jax, jax.numpy as jnp
from hierslam_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from hierslam_tpu.core import gaussians as G
from hierslam_tpu.core.camera import intrinsics_matrix, setup_camera
from hierslam_tpu.ops.rasterize import RasterConfig
from hierslam_tpu.slam import optim
from hierslam_tpu.slam.losses import LossConfig, mlp_init
from hierslam_tpu.slam.mapping import PruneConfig, make_mapper

WIDTH = int(os.environ["REPRO_WIDTH"])
VIS = int(os.environ["REPRO_VIS"])
N = int(os.environ["REPRO_N"])
ITERS = int(os.environ.get("REPRO_ITERS", "20"))
H, W, SEM, WIN = 680, 1200, 26, 4

rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)
params = G.empty_params(N, 8, SEM)
params["means3D"] = jnp.asarray(np.stack(
    [rng.uniform(-3, 3, N), rng.uniform(-2, 2, N), rng.uniform(0.5, 5, N)],
    -1).astype(np.float32))
params["rgb_colors"] = jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32)
params["logit_opacities"] = jnp.asarray(rng.normal(1.5, 1.0, (N, 1)), jnp.float32)
params["log_scales"] = jnp.asarray(
    np.log(rng.uniform(0.008, 0.03, (N, 1))), jnp.float32)
params["semantic"] = jax.random.uniform(key, (N, SEM))
variables = G.empty_variables(N)
variables["active"] = jnp.ones((N,), bool)
variables["n_active"] = jnp.asarray(N, jnp.int32)
variables["scene_radius"] = jnp.asarray(2.3, jnp.float32)
camera = setup_camera(W, H, intrinsics_matrix(600, 600, 599.5, 339.5), np.eye(4))

rc = RasterConfig(
    max_per_tile=1024, gaussian_chunk=256, tile_batch=48,
    grad_pair_budget=2_000_000, grad_bf16=True,
    sat_margin=2.0, sat_floor=128, visible_budget=VIS,
    backend="stream", stream_rows=78_000, stream_cap=4096,
    stream_table_width=WIDTH,
)
loss_cfg = LossConfig(
    use_sil_for_loss=False, sil_thres=0.5, w_im=0.5, w_depth=1.0, w_sem=0.2,
    sem_levels=(2, 3, 5, 7, 9), num_leaf=102, use_mlp=True)
lrs = dict(means3D=1e-4, rgb_colors=2.5e-3, unnorm_rotations=1e-3,
           logit_opacities=0.05, log_scales=1e-3, semantic=0.05)
mapper = make_mapper(camera, loss_cfg, rc, lrs, ITERS, PruneConfig())

from hierslam_tpu.slam.losses import render_gaussians
out = render_gaussians(params, variables["active"], jnp.array([1.0, 0, 0, 0]),
                       jnp.zeros(3), camera, rc, with_semantic=False,
                       gaussians_grad=False, camera_grad=False)
im_gt = jnp.clip(out.im, 0, 1)
depth_gt = out.depth
labels = jnp.asarray(np.concatenate(
    [rng.integers(0, n, (1, H, W)) for n in (2, 3, 5, 7, 9, 102)], 0
).astype(np.int32))
window = {
    "im": jnp.broadcast_to(im_gt[None], (WIN, 3, H, W)),
    "depth": jnp.broadcast_to(depth_gt[None], (WIN, H, W)),
    "labels": jnp.broadcast_to(labels[None], (WIN, 6, H, W)),
    "time_idx": jnp.zeros((WIN,), jnp.int32),
}
rand_idx = jnp.asarray(rng.integers(0, WIN, ITERS), jnp.int32)
mlp = mlp_init(SEM, 102, key)
mlp_state = optim.adam_init(mlp)

t0 = time.time()
p2, v2, m2, ms2, losses = mapper(params, variables, window, rand_idx, mlp, mlp_state)
l = float(losses["loss"][-1])
print(f"OK loss={l:.4f} wall={time.time()-t0:.1f}s", flush=True)
"""


def run_cell(width, vis, n, iters):
    env = dict(os.environ)
    env.update(
        REPRO_REPO=REPO, REPRO_WIDTH=str(width), REPRO_VIS=str(vis),
        REPRO_N=str(n), REPRO_ITERS=str(iters),
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", CHILD], env=env, capture_output=True,
            text=True, timeout=1200,
        )
    except subprocess.TimeoutExpired:
        return dict(status="timeout")
    tail = (proc.stdout + proc.stderr)[-2000:]
    if proc.returncode == 0 and "OK loss=" in proc.stdout:
        return dict(status="ok", tail=proc.stdout.strip().splitlines()[-1])
    crash = ("TPU worker process crashed" in tail) or proc.returncode < 0
    return dict(
        status="crash" if crash else "error",
        rc=proc.returncode, tail=tail[-600:],
    )


def main():
    iters = int(os.environ.get("REPRO_ITERS", "20"))
    cells_env = os.environ.get("REPRO_CELLS", "")
    if cells_env:
        cells = [tuple(int(v) for v in c.split(":"))
                 for c in cells_env.split(",")]
    else:
        # the round-4 observation triangle + scale bisect
        cells = [
            (40, 1_500_000, 2_000_000),   # crashed in r4
            (128, 1_500_000, 2_000_000),  # ran in r4
            (40, 0, 2_000_000),           # ran in r4
            (40, 1_500_000, 1_000_000),   # does it need N=2M?
            (40, 750_000, 2_000_000),     # does it need V=1.5M?
            (48, 1_500_000, 2_000_000),   # width threshold probe
        ]
    results = []
    for width, vis, n in cells:
        print(f"[repro] width={width} vis={vis} N={n} ...",
              file=sys.stderr, flush=True)
        r = run_cell(width, vis, n, iters)
        r.update(width=width, visible_budget=vis, n=n)
        print(f"[repro]   -> {r['status']} {r.get('tail', '')[:200]}",
              file=sys.stderr, flush=True)
        results.append(r)
    crashing = [r for r in results if r["status"] == "crash"]
    print(json.dumps({
        "iters": iters,
        "cells": results,
        "crashing": [
            {k: r[k] for k in ("width", "visible_budget", "n")}
            for r in crashing
        ],
    }))


if __name__ == "__main__":
    main()
