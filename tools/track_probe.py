import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from hierslam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from hierslam_tpu.core import gaussians as G
from hierslam_tpu.core.camera import intrinsics_matrix, setup_camera
from hierslam_tpu.ops.rasterize import RasterConfig
from hierslam_tpu.slam.losses import LossConfig, render_gaussians
from hierslam_tpu.slam.tracking import make_tracker

N = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
K = int(sys.argv[2]) if len(sys.argv) > 2 else 512
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 40
H, W = 680, 1200

rng = np.random.default_rng(0)
params = G.empty_params(N, 8, 0)
params["means3D"] = jnp.asarray(
    np.stack([rng.uniform(-3, 3, N), rng.uniform(-2, 2, N), rng.uniform(0.5, 5, N)], -1
             ).astype(np.float32))
params["rgb_colors"] = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))
params["logit_opacities"] = jnp.asarray(rng.normal(1.5, 1.0, (N, 1)).astype(np.float32))
params["log_scales"] = jnp.asarray(np.log(rng.uniform(0.008, 0.03, (N, 1))).astype(np.float32))
variables = G.empty_variables(N)
variables["active"] = jnp.ones((N,), bool)

import os

camera = setup_camera(W, H, intrinsics_matrix(600, 600, 599.5, 339.5), np.eye(4))
_spec = os.environ.get("PROBE_BUCKETS", "")  # "128:1024,384:512,-1:128"
rc = RasterConfig(
    max_per_tile=K, gaussian_chunk=256, tile_batch=48,
    track_bucket_spec=tuple(
        tuple(int(v) for v in e.split(":")) for e in _spec.split(",")
    ) if _spec else None,
    sat_margin=float(os.environ.get("PROBE_SAT_MARGIN", "0")),
    sat_floor=int(os.environ.get("PROBE_SAT_FLOOR", "128")),
)

out = render_gaussians(params, variables["active"], jnp.array([1.0, 0, 0, 0]),
                       jnp.zeros(3), camera, rc, with_semantic=False,
                       gaussians_grad=False, camera_grad=False)
im_gt = jnp.clip(out.im, 0, 1)
depth_gt = out.depth
print("render ok", int(out.n_dropped), int(out.tile_count.max()), flush=True)

cfg = LossConfig(use_sil_for_loss=True, sil_thres=0.99, w_im=0.5, w_depth=1.0)
tracker = make_tracker(camera, cfg, rc, 4e-4, 2e-3, ITERS)
params["cam_unnorm_rots"] = params["cam_unnorm_rots"].at[0, :, 1].set(
    jnp.array([1.0, 0.001, 0.0, 0.0]))

t0 = time.time()
p2, bl, mr, _, _ = tracker(params, variables["active"], variables["max_2D_radius"],
                        im_gt, depth_gt, 1)
print("track compile+run", time.time() - t0, float(bl), flush=True)
t0 = time.time()
reps = 3
for _ in range(reps):
    p2, bl, mr, _, _ = tracker(params, variables["active"], variables["max_2D_radius"],
                            im_gt, depth_gt, 1)
    lv = float(bl)
dt = (time.time() - t0) / reps
print(f"track frame {dt:.3f}s  per-iter {dt/ITERS*1e3:.1f} ms  loss {lv}", flush=True)
