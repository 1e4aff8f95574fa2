"""Device-trace profile of the bench tracking phase (40-iter scan)."""
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
from hierslam_tpu.slam.losses import LossConfig, render_gaussians
from hierslam_tpu.slam.tracking import make_tracker

H, W = 680, 1200
N_GAUSS = 300_000
TRACK_ITERS = 40

rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)
params = G.empty_params(N_GAUSS, 8, 26)
params["means3D"] = jnp.asarray(np.stack(
    [rng.uniform(-3, 3, N_GAUSS), rng.uniform(-2, 2, N_GAUSS),
     rng.uniform(0.5, 5.0, N_GAUSS)], -1).astype(np.float32))
params["rgb_colors"] = jnp.asarray(rng.uniform(0, 1, (N_GAUSS, 3)), jnp.float32)
params["logit_opacities"] = jnp.asarray(rng.normal(1.5, 1.0, (N_GAUSS, 1)), jnp.float32)
params["log_scales"] = jnp.asarray(np.log(rng.uniform(0.008, 0.03, (N_GAUSS, 1))), jnp.float32)
variables = G.empty_variables(N_GAUSS)
variables["active"] = jnp.ones((N_GAUSS,), bool)

camera = setup_camera(W, H, intrinsics_matrix(600.0, 600.0, 599.5, 339.5), np.eye(4))
rc = RasterConfig(max_per_tile=512, gaussian_chunk=256, tile_batch=48)

out = render_gaussians(
    params, variables["active"], jnp.array([1.0, 0, 0, 0]), jnp.zeros(3),
    camera, rc, with_semantic=False, gaussians_grad=False, camera_grad=False)
im_gt = jax.block_until_ready(jnp.clip(out.im, 0, 1))
depth_gt = out.depth

track_loss = LossConfig(use_sil_for_loss=True, sil_thres=0.99, w_im=0.5, w_depth=1.0)
tracker = make_tracker(camera, track_loss, rc, 4e-4, 2e-3, TRACK_ITERS)
params["cam_unnorm_rots"] = params["cam_unnorm_rots"].at[0, :, 1].set(
    jnp.array([1.0, 0.001, 0.0, 0.0]))


def run_track():
    p2, bl, mr, _, _ = tracker(
        params, variables["active"], variables["max_2D_radius"],
        im_gt, depth_gt, 1)
    return float(bl)


t0 = time.time()
run_track()
print(f"# compile+run {time.time()-t0:.1f}s", file=sys.stderr)

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/track_trace"
os.makedirs(outdir, exist_ok=True)
t0 = time.time()
with jax.profiler.trace(outdir):
    run_track()
wall = time.time() - t0
print(f"# traced run {wall:.1f}s", file=sys.stderr)

pbs = sorted(glob.glob(outdir + "/**/*.xplane.pb", recursive=True), key=os.path.getmtime)
data = jax.profiler.ProfileData.from_file(pbs[-1])
by_op = collections.Counter()
total = 0
for plane in data.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name.lower():
        continue
    for line in plane.lines:
        if "step" in line.name.lower() or "sparse" in line.name.lower():
            continue
        for ev in line.events:
            by_op[ev.name] += ev.duration_ns
            total += ev.duration_ns
print(f"\ntotal device-event ns: {total/1e6:.1f} ms (wall {wall*1e3:.0f} ms, {TRACK_ITERS} iters)")
print(f"{'op':<72} {'ms':>10} {'ms/iter':>8} {'%':>6}")
for name, ns in by_op.most_common(30):
    print(f"{name[:72]:<72} {ns/1e6:>10.1f} {ns/1e6/TRACK_ITERS:>8.2f} "
          f"{100*ns/max(total,1):>6.1f}")
