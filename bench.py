"""Benchmark: SLAM throughput on a Replica-room0-shaped workload.

Measures the two hot loops on real hardware at the reference's headline
configuration (1200x680 frames, 40 tracking iters/frame, 60 mapping iters
every 8th frame, 24-frame window semantics with a 26-channel hierarchical
embedding — configs/replica/hierslam_semantic_run.py:15-19), SWEEPING the
map size N over {300k, 1M, 2M} active Gaussians (a real room0 run
densifies past 1M), and derives end-to-end SLAM FPS per size:

    fps = 1 / (tracking_frame_time + mapping_frame_time / map_every)

The HEADLINE value is the WORST case over the sweep.  ``vs_baseline``
compares against ASSUMED_BASELINE_FPS — the reference publishes no numbers
(README claims "Fast" only; BASELINE.json "published": {}), so we use 0.5
SLAM FPS as a representative figure for SplaTAM-class CUDA systems at this
workload on a desktop GPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import numpy as np

ASSUMED_BASELINE_FPS = 0.5

# Workload shape (Replica room0 semantic).
H, W = 680, 1200
N_SWEEP = (300_000, 1_000_000, 2_000_000)
N_SEM = 26
TRACK_ITERS = 40
MAP_ITERS = 60
MAP_EVERY = 8
WINDOW = 24


def build_state(n_gauss, rng, key):
    import jax
    import jax.numpy as jnp

    from hierslam_tpu.core import gaussians as G

    means = np.stack(
        [
            rng.uniform(-3, 3, n_gauss),
            rng.uniform(-2, 2, n_gauss),
            rng.uniform(0.5, 5.0, n_gauss),
        ],
        -1,
    ).astype(np.float32)
    params = G.empty_params(n_gauss, 8, N_SEM)
    params["means3D"] = jnp.asarray(means)
    params["rgb_colors"] = jnp.asarray(rng.uniform(0, 1, (n_gauss, 3)), jnp.float32)
    params["logit_opacities"] = jnp.asarray(
        rng.normal(1.5, 1.0, (n_gauss, 1)), jnp.float32
    )
    params["log_scales"] = jnp.asarray(
        np.log(rng.uniform(0.008, 0.03, (n_gauss, 1))), jnp.float32
    )
    params["semantic"] = jax.random.uniform(key, (n_gauss, N_SEM))
    variables = G.empty_variables(n_gauss)
    variables["active"] = jnp.ones((n_gauss,), bool)
    variables["n_active"] = jnp.asarray(n_gauss, jnp.int32)
    variables["scene_radius"] = jnp.asarray(2.3, jnp.float32)
    return params, variables


def bench_size(n_gauss, camera, rc, rng, key):
    import jax
    import jax.numpy as jnp

    from hierslam_tpu.slam import optim
    from hierslam_tpu.slam.losses import LossConfig, mlp_init, render_gaussians
    from hierslam_tpu.slam.mapping import PruneConfig, make_mapper
    from hierslam_tpu.slam.tracking import make_tracker

    params, variables = build_state(n_gauss, rng, key)

    # GT frame = a render of the map itself.
    out = render_gaussians(
        params, variables["active"], jnp.array([1.0, 0, 0, 0]), jnp.zeros(3),
        camera, rc, with_semantic=False, gaussians_grad=False, camera_grad=False,
    )
    im_gt = jax.block_until_ready(jnp.clip(out.im, 0, 1))
    depth_gt = out.depth
    dropped = int(out.n_dropped)
    sem_levels = (2, 3, 5, 7, 9)
    labels = np.concatenate(
        [rng.integers(0, n, (1, H, W)) for n in sem_levels + (102,)], 0
    ).astype(np.int32)

    # ---- tracking ---------------------------------------------------------
    track_loss = LossConfig(use_sil_for_loss=True, sil_thres=0.99, w_im=0.5, w_depth=1.0)
    tracker = make_tracker(camera, track_loss, rc, 4e-4, 2e-3, TRACK_ITERS)
    params["cam_unnorm_rots"] = params["cam_unnorm_rots"].at[0, :, 1].set(
        jnp.array([1.0, 0.001, 0.0, 0.0])
    )

    def run_track():
        p2, bl, mr, _, _ = tracker(
            params, variables["active"], variables["max_2D_radius"],
            im_gt, depth_gt, 1,
        )
        return float(bl)  # scalar fetch = reliable completion fence

    t0 = time.time()
    run_track()  # compile
    print(f"# N={n_gauss} tracking compile+run {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        run_track()
    track_frame_s = (time.time() - t0) / reps
    print(
        f"# N={n_gauss} tracking frame {track_frame_s:.3f}s "
        f"({track_frame_s/TRACK_ITERS*1e3:.1f} ms/iter)",
        file=sys.stderr, flush=True,
    )

    # ---- mapping ----------------------------------------------------------
    map_loss = LossConfig(
        use_sil_for_loss=False, sil_thres=0.5, w_im=0.5, w_depth=1.0, w_sem=0.2,
        sem_levels=sem_levels, num_leaf=102, use_mlp=True,
    )
    lrs = dict(
        means3D=1e-4, rgb_colors=2.5e-3, unnorm_rotations=1e-3,
        logit_opacities=0.05, log_scales=1e-3, semantic=0.05,
    )
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
        return float(losses["loss"][-1])  # scalar fetch = reliable completion fence

    t0 = time.time()
    run_map()  # compile
    print(f"# N={n_gauss} mapping compile+run {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    t0 = time.time()
    for _ in range(2):
        run_map()
    map_frame_s = (time.time() - t0) / 2
    print(f"# N={n_gauss} mapping frame {map_frame_s:.3f}s", file=sys.stderr, flush=True)

    fps = 1.0 / (track_frame_s + map_frame_s / MAP_EVERY)
    return {
        "fps": round(fps, 4),
        "tracking_iter_ms": round(track_frame_s / TRACK_ITERS * 1e3, 2),
        "tracking_frame_s": round(track_frame_s, 3),
        "mapping_iter_ms": round(map_frame_s / MAP_ITERS * 1e3, 2),
        "mapping_frame_s": round(map_frame_s, 3),
        "n_gaussians": n_gauss,
        "bin_overflow_pairs": dropped,
    }


def main():
    import jax

    from hierslam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from hierslam_tpu.core.camera import intrinsics_matrix, setup_camera
    from hierslam_tpu.ops.rasterize import RasterConfig

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    camera = setup_camera(W, H, intrinsics_matrix(600.0, 600.0, 599.5, 339.5), np.eye(4))

    # ONE source of truth for the raster knobs: the flagship shipped config
    # (configs/replica/hierslam_semantic_run.py) — the bench measures the
    # per-tile caps / budgets a real run would actually use.
    from importlib.machinery import SourceFileLoader

    shipped = SourceFileLoader(
        "hierslam_semantic_run",
        "configs/replica/hierslam_semantic_run.py",
    ).load_module().config
    from hierslam_tpu.config import raster_config

    rc = raster_config(shipped)

    sweep = [bench_size(n, camera, rc, rng, key) for n in N_SWEEP]
    worst = min(sweep, key=lambda r: r["fps"])
    result = {
        "metric": "slam_fps_replica_room0_shape_worstN",
        "value": worst["fps"],
        "unit": "frames/sec",
        "vs_baseline": round(worst["fps"] / ASSUMED_BASELINE_FPS, 3),
        "detail": {
            "headline": worst,
            "sweep": sweep,
            "raster_knobs": dict(shipped["raster"], source="configs/replica/hierslam_semantic_run.py"),
            "max_per_tile": rc.max_per_tile,
            "track_max_per_tile": rc.track_max_per_tile,
            "grad_pair_budget": rc.grad_pair_budget,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
