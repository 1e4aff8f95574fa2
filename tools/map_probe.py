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
from hierslam_tpu.slam import optim
from hierslam_tpu.slam.losses import LossConfig, mlp_init, render_gaussians
from hierslam_tpu.slam.mapping import PruneConfig, make_mapper

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
K = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
WIN = int(sys.argv[3]) if len(sys.argv) > 3 else 4
ITERS = int(sys.argv[4]) if len(sys.argv) > 4 else 10
SEM = int(sys.argv[5]) if len(sys.argv) > 5 else 26
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
if SEM:
    params["semantic"] = jax.random.uniform(key, (N, SEM))
variables = G.empty_variables(N)
variables["active"] = jnp.ones((N,), bool)
variables["n_active"] = jnp.asarray(N, jnp.int32)
variables["scene_radius"] = jnp.asarray(2.3, jnp.float32)

camera = setup_camera(W, H, intrinsics_matrix(600, 600, 599.5, 339.5), np.eye(4))
import os

_spec = os.environ.get("PROBE_BUCKETS", "")  # e.g. "128:4096,384:1024,-1:256"
rc = RasterConfig(
    max_per_tile=K, gaussian_chunk=256, tile_batch=48,
    grad_pair_budget=int(os.environ.get("PROBE_PAIR_BUDGET", "1500000")),
    grad_bf16=os.environ.get("PROBE_BF16", "1") == "1",
    track_max_per_tile=0,
    escalate_tiles=int(os.environ.get("PROBE_ESC_TILES", "0")),
    escalate_k=int(os.environ.get("PROBE_ESC_K", "0")),
    bucket_spec=tuple(
        tuple(int(v) for v in e.split(":")) for e in _spec.split(",")
    ) if _spec else None,
    sat_margin=float(os.environ.get("PROBE_SAT_MARGIN", "0")),
    sat_floor=int(os.environ.get("PROBE_SAT_FLOOR", "128")),
    visible_budget=int(os.environ.get("PROBE_VIS", "0")),
    backend=os.environ.get("PROBE_BACKEND", "pallas"),
    stream_rows=int(os.environ.get("PROBE_STREAM_ROWS", "0")),
    stream_cap=int(os.environ.get("PROBE_STREAM_CAP", "4096")),
)

out = render_gaussians(params, variables["active"], jnp.array([1.0, 0, 0, 0]),
                       jnp.zeros(3), camera, rc, with_semantic=False,
                       gaussians_grad=False, camera_grad=False)
im_gt = jnp.clip(out.im, 0, 1)
depth_gt = out.depth
print("render ok, dropped", int(out.n_dropped), "maxtile", int(out.tile_count.max()), flush=True)

if rc.backend == "stream":
    from hierslam_tpu.ops.render_stream import compute_stream_binning as _csb

    _sl = jax.jit(lambda: _csb(
        params["means3D"], jnp.exp(params["log_scales"]),
        params["unnorm_rotations"], camera, rc,
        margin_px=float(os.environ.get("PROBE_MARGIN", "0")),
        opacities=jax.nn.sigmoid(params["logit_opacities"][:, 0]),
        compact=os.environ.get("PROBE_SL_COMPACT", "0") == "1",
    ).lists)()
    ke = np.asarray(_sl.k_eff)
    print("stream k_eff quantiles", np.percentile(ke, [50, 90, 99, 100]).astype(int),
          "rows", int(_sl.n_rows), "/", _sl.idx.shape[0],
          "refs", int(_sl.n_refs), "sat_masked", int(_sl.n_sat_masked),
          "dropped", int(_sl.n_dropped), flush=True)
elif rc.sat_margin > 0 or rc.bucket_spec:
    from hierslam_tpu.ops.rasterize import compute_binning as _cbp

    _bl = jax.jit(lambda: _cbp(
        params["means3D"], jnp.tile(jnp.exp(params["log_scales"]), (1, 3)),
        params["unnorm_rotations"], camera, rc,
        opacities=jax.nn.sigmoid(params["logit_opacities"]),
        compact=rc.visible_budget > 0,
    ))().lists
    ke = np.asarray(_bl.k_eff)
    print("k_eff quantiles", np.percentile(ke, [50, 90, 99, 100]).astype(int),
          "sat_masked", int(_bl.n_sat_masked), "dropped", int(_bl.n_dropped),
          "refs", int(_bl.n_refs), flush=True)

sem_levels = (2, 3, 5, 7, 9) if SEM == 26 else ()
loss_cfg = LossConfig(use_sil_for_loss=False, sil_thres=0.5, w_im=0.5, w_depth=1.0,
                      w_sem=0.2 if SEM else 0.0, sem_levels=sem_levels,
                      num_leaf=102, use_mlp=bool(SEM))
lrs = dict(means3D=1e-4, rgb_colors=2.5e-3, unnorm_rotations=1e-3,
           logit_opacities=0.05, log_scales=1e-3, semantic=0.05)
mapper = make_mapper(camera, loss_cfg, rc, lrs, ITERS, PruneConfig())
labels = np.concatenate(
    [rng.integers(0, n, (1, H, W)) for n in sem_levels + (102,)], 0).astype(np.int32)
window = {
    "im": jnp.broadcast_to(im_gt[None], (WIN, 3, H, W)),
    "depth": jnp.broadcast_to(depth_gt[None], (WIN, H, W)),
    "time_idx": jnp.zeros((WIN,), jnp.int32),
}
if SEM:
    window["labels"] = jnp.broadcast_to(jnp.asarray(labels)[None], (WIN, 6, H, W))
mlp = mlp_init(SEM, 102, key) if SEM else None
mlp_state = optim.adam_init(mlp) if SEM else None
rand_idx = jnp.asarray(rng.integers(0, WIN, ITERS), jnp.int32)

t0 = time.time()
p2, v2, m2, ms2, losses = mapper(params, variables, window, rand_idx, mlp, mlp_state)
print("map compile+run", time.time() - t0, float(losses["loss"][-1]), flush=True)
t0 = time.time()
p2, v2, m2, ms2, losses = mapper(params, variables, window, rand_idx, mlp, mlp_state)
lv = float(losses["loss"][-1])  # scalar fetch = true fence through the relay
dt = time.time() - t0
print("map per-iter", dt / ITERS, lv, flush=True)
