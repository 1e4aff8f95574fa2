"""Device-trace profile of the bench mapping phase (jax.profiler + xplane).

Runs the EXACT bench.py mapping phase once under jax.profiler.trace and
aggregates per-op device time from the xplane, so the 250ms/iter can be
attributed to real kernels (dispatch-free, unlike standalone stage timers
which pay ~25ms of axon-tunnel latency per call).

Usage: python tools/profile_map.py [outdir]
"""
import collections
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from hierslam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from hierslam_tpu.core import gaussians as G
from hierslam_tpu.core.camera import intrinsics_matrix, setup_camera
from hierslam_tpu.ops.rasterize import RasterConfig
from hierslam_tpu.slam import optim
from hierslam_tpu.slam.losses import LossConfig, mlp_init
from hierslam_tpu.slam.mapping import PruneConfig, make_mapper

H, W = 680, 1200
N_GAUSS = int(os.environ.get("PROFILE_N", "300000"))
N_SEM = 26
MAP_ITERS = 60
WINDOW = 24
K = int(os.environ.get("PROFILE_K", "512"))

rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)
means = np.stack(
    [rng.uniform(-3, 3, N_GAUSS), rng.uniform(-2, 2, N_GAUSS),
     rng.uniform(0.5, 5.0, N_GAUSS)], -1).astype(np.float32)
params = G.empty_params(N_GAUSS, 8, N_SEM)
params["means3D"] = jnp.asarray(means)
params["rgb_colors"] = jnp.asarray(rng.uniform(0, 1, (N_GAUSS, 3)), jnp.float32)
params["logit_opacities"] = jnp.asarray(rng.normal(1.5, 1.0, (N_GAUSS, 1)), jnp.float32)
params["log_scales"] = jnp.asarray(np.log(rng.uniform(0.008, 0.03, (N_GAUSS, 1))), jnp.float32)
params["semantic"] = jax.random.uniform(key, (N_GAUSS, N_SEM))
variables = G.empty_variables(N_GAUSS)
variables["active"] = jnp.ones((N_GAUSS,), bool)
variables["n_active"] = jnp.asarray(N_GAUSS, jnp.int32)
variables["scene_radius"] = jnp.asarray(2.3, jnp.float32)

camera = setup_camera(W, H, intrinsics_matrix(600.0, 600.0, 599.5, 339.5), np.eye(4))
_spec = os.environ.get("PROFILE_BUCKETS", "")  # "128:4096,384:1024,-1:256"
rc = RasterConfig(
    max_per_tile=K, gaussian_chunk=256, tile_batch=48,
    grad_pair_budget=int(os.environ.get("PROFILE_PAIR_BUDGET", "0")),
    grad_bf16=os.environ.get("PROFILE_BF16", "0") == "1",
    escalate_tiles=int(os.environ.get("PROFILE_ESC_TILES", "0")),
    escalate_k=int(os.environ.get("PROFILE_ESC_K", "0")),
    bucket_spec=tuple(
        tuple(int(v) for v in e.split(":")) for e in _spec.split(",")
    ) if _spec else None,
    sat_margin=float(os.environ.get("PROFILE_SAT_MARGIN", "0")),
    sat_floor=int(os.environ.get("PROFILE_SAT_FLOOR", "128")),
    visible_budget=int(os.environ.get("PROFILE_VIS", "0")),
    backend=os.environ.get("PROFILE_BACKEND", "pallas"),
    stream_rows=int(os.environ.get("PROFILE_STREAM_ROWS", "0")),
    stream_cap=int(os.environ.get("PROFILE_STREAM_CAP", "4096")),
)

from hierslam_tpu.slam.losses import render_gaussians

out = render_gaussians(
    params, variables["active"], jnp.array([1.0, 0, 0, 0]), jnp.zeros(3),
    camera, rc, with_semantic=False, gaussians_grad=False, camera_grad=False)
im_gt = jax.block_until_ready(jnp.clip(out.im, 0, 1))
depth_gt = out.depth
sem_levels = (2, 3, 5, 7, 9)
labels = np.concatenate(
    [rng.integers(0, n, (1, H, W)) for n in sem_levels + (102,)], 0).astype(np.int32)

map_loss = LossConfig(
    use_sil_for_loss=False, sil_thres=0.5, w_im=0.5, w_depth=1.0, w_sem=0.2,
    sem_levels=sem_levels, num_leaf=102, use_mlp=True)
lrs = dict(means3D=1e-4, rgb_colors=2.5e-3, unnorm_rotations=1e-3,
           logit_opacities=0.05, log_scales=1e-3, semantic=0.05)
mapper = make_mapper(camera, map_loss, rc, lrs, MAP_ITERS, PruneConfig())
mlp = mlp_init(N_SEM, 102, key)
mlp_state = optim.adam_init(mlp)
window = {
    "im": jnp.broadcast_to(im_gt[None], (WINDOW, 3, H, W)),
    "depth": jnp.broadcast_to(depth_gt[None], (WINDOW, H, W)),
    "labels": jnp.broadcast_to(jnp.asarray(labels, jnp.int16)[None], (WINDOW, 6, H, W)),
    "time_idx": jnp.zeros((WINDOW,), jnp.int32),
}
rand_idx = jnp.asarray(rng.integers(0, WINDOW, MAP_ITERS), jnp.int32)


def run_map():
    p2, v2, m2, ms2, losses = mapper(params, variables, window, rand_idx, mlp, mlp_state)
    return float(losses["loss"][-1])


t0 = time.time()
run_map()
print(f"# compile+run {time.time()-t0:.1f}s", file=sys.stderr)

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/map_trace"
os.makedirs(outdir, exist_ok=True)
t0 = time.time()
with jax.profiler.trace(outdir):
    run_map()
wall = time.time() - t0
print(f"# traced run {wall:.1f}s", file=sys.stderr)

# ---- parse the xplane ----
pbs = sorted(glob.glob(outdir + "/**/*.xplane.pb", recursive=True),
             key=os.path.getmtime)
pb = pbs[-1]
data = jax.profiler.ProfileData.from_file(pb)
by_op = collections.Counter()
total = 0
for plane in data.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name.lower():
        continue
    for line in plane.lines:
        lname = line.name.lower()
        if "step" in lname or "sparse" in lname:
            continue
        for ev in line.events:
            dur = ev.duration_ns
            by_op[ev.name] += dur
            total += dur
print(f"\ntotal device-event ns across TPU lines: {total/1e6:.1f} ms "
      f"(wall {wall*1e3:.0f} ms, {MAP_ITERS} iters)")
print(f"{'op':<72} {'ms':>10} {'ms/iter':>8} {'%':>6}")
for name, ns in by_op.most_common(45):
    print(f"{name[:72]:<72} {ns/1e6:>10.1f} {ns/1e6/MAP_ITERS:>8.2f} "
          f"{100*ns/max(total,1):>6.1f}")
