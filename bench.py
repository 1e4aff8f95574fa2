"""Benchmark: SLAM throughput on a Replica-room0-shaped workload.

Measures the two hot loops on real hardware at the reference's headline
configuration (1200x680 frames, 40 tracking iters/frame, 60 mapping iters
every 8th frame, 24-frame window semantics with a 26-channel hierarchical
embedding — configs/replica/hierslam_semantic_run.py:15-19), SWEEPING the
map size N over {300k, 1M, 2M} active Gaussians (a real room0 run
densifies past 1M), and derives end-to-end SLAM FPS per size:

    fps = 1 / (tracking_frame_time + mapping_frame_time / map_every)

(the reference's own end-of-run accounting, scripts/hierslam.py:2148-2155
— densify/keyframe-selection/host costs are NOT modeled; the end-to-end
wall-clock evidence lives in the real_shape_report artifacts).

The HEADLINE value is the WORST case over the sweep.  ``vs_baseline``
compares against ASSUMED_BASELINE_FPS — the reference publishes no numbers
(README claims "Fast" only; BASELINE.json "published": {}), so we use 0.5
SLAM FPS as a representative figure for SplaTAM-class CUDA systems at this
workload on a desktop GPU.

``detail.scannet74`` is one extra row at the widest shipped embedding
(BASELINE config 5 shape: ScanNet tree_large, 640x480, 74 semantic
channels, 550 leaves, map_every=1, 100/30 iters) proving the
runtime-channel-width design holds its throughput story — the reference
needs a NUM_SEMANTIC=74 recompile for this configuration
(cuda_rasterizer/config.h:15-18).

Per-size ``overflow`` splits the binning drop accounting: ``sat_masked``
pairs are provably invisible (below the blend's transmittance cutoff under
conservative per-quadrant alpha bounds) while ``dropped`` are real pair
losses (emission caps + stream waterfill budget); ``grad_dropped`` counts
backward-routing truncation by grad_pair_budget.

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


def build_state(n_gauss, rng, key, n_sem=N_SEM):
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
    params = G.empty_params(n_gauss, 8, n_sem)
    params["means3D"] = jnp.asarray(means)
    params["rgb_colors"] = jnp.asarray(rng.uniform(0, 1, (n_gauss, 3)), jnp.float32)
    params["logit_opacities"] = jnp.asarray(
        rng.normal(1.5, 1.0, (n_gauss, 1)), jnp.float32
    )
    params["log_scales"] = jnp.asarray(
        np.log(rng.uniform(0.008, 0.03, (n_gauss, 1))), jnp.float32
    )
    params["semantic"] = jax.random.uniform(key, (n_gauss, n_sem))
    variables = G.empty_variables(n_gauss)
    variables["active"] = jnp.ones((n_gauss,), bool)
    variables["n_active"] = jnp.asarray(n_gauss, jnp.int32)
    variables["scene_radius"] = jnp.asarray(2.3, jnp.float32)
    return params, variables


def bench_config(n_gauss, camera, rc, rng, key, *, h, w, n_sem, sem_levels,
                 num_leaf, track_iters, map_iters, map_every, window):
    import jax
    import jax.numpy as jnp

    from hierslam_tpu.slam import optim
    from hierslam_tpu.slam.losses import LossConfig, mlp_init, render_gaussians
    from hierslam_tpu.slam.mapping import PruneConfig, make_mapper
    from hierslam_tpu.slam.tracking import make_tracker

    params, variables = build_state(n_gauss, rng, key, n_sem)

    # GT frame = a render of the map itself.
    out = render_gaussians(
        params, variables["active"], jnp.array([1.0, 0, 0, 0]), jnp.zeros(3),
        camera, rc, with_semantic=False, gaussians_grad=False, camera_grad=False,
    )
    im_gt = jax.block_until_ready(jnp.clip(out.im, 0, 1))
    depth_gt = out.depth
    dropped = int(out.n_dropped)
    labels = np.concatenate(
        [rng.integers(0, n, (1, h, w)) for n in sem_levels + (num_leaf,)], 0
    ).astype(np.int16)

    # ---- tracking ---------------------------------------------------------
    track_loss = LossConfig(use_sil_for_loss=True, sil_thres=0.99, w_im=0.5, w_depth=1.0)
    tracker = make_tracker(camera, track_loss, rc, 4e-4, 2e-3, track_iters)
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
        f"({track_frame_s/track_iters*1e3:.1f} ms/iter)",
        file=sys.stderr, flush=True,
    )

    # ---- mapping ----------------------------------------------------------
    map_loss = LossConfig(
        use_sil_for_loss=False, sil_thres=0.5, w_im=0.5, w_depth=1.0, w_sem=0.2,
        sem_levels=sem_levels, num_leaf=num_leaf, use_mlp=True,
    )
    lrs = dict(
        means3D=1e-4, rgb_colors=2.5e-3, unnorm_rotations=1e-3,
        logit_opacities=0.05, log_scales=1e-3, semantic=0.05,
    )
    mapper = make_mapper(camera, map_loss, rc, lrs, map_iters, PruneConfig())
    mlp = mlp_init(n_sem, num_leaf, key)
    mlp_state = optim.adam_init(mlp)
    window_d = {
        "im": jnp.broadcast_to(im_gt[None], (window, 3, h, w)),
        "depth": jnp.broadcast_to(depth_gt[None], (window, h, w)),
        "labels": jnp.broadcast_to(
            jnp.asarray(labels)[None], (window, len(sem_levels) + 1, h, w)
        ),
        "time_idx": jnp.zeros((window,), jnp.int32),
    }
    rand_idx = jnp.asarray(rng.integers(0, window, map_iters), jnp.int32)

    last_losses = {}

    def run_map():
        p2, v2, m2, ms2, losses = mapper(
            params, variables, window_d, rand_idx, mlp, mlp_state
        )
        last_losses["v"] = losses
        return float(losses["loss"][-1])  # scalar fetch = completion fence

    t0 = time.time()
    run_map()  # compile
    print(f"# N={n_gauss} mapping compile+run {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    t0 = time.time()
    for _ in range(2):
        run_map()
    map_frame_s = (time.time() - t0) / 2
    print(f"# N={n_gauss} mapping frame {map_frame_s:.3f}s", file=sys.stderr, flush=True)

    losses = last_losses["v"]
    grad_dropped = int(np.max(np.asarray(losses["n_grad_dropped"])))
    map_bin_dropped = int(np.max(np.asarray(losses["n_map_bin_dropped"])))

    # stream-binning drop split at the mapping margin (sat-masked pairs are
    # provably invisible; "dropped" are real losses)
    overflow = {"densify_render_dropped": dropped}
    if rc.backend == "stream":
        from hierslam_tpu.core import transforms as _tf
        from hierslam_tpu.ops.render_stream import compute_stream_binning

        sl = jax.jit(lambda: compute_stream_binning(
            _tf.transform_to_frame(
                params["means3D"], params["unnorm_rotations"],
                jnp.array([1.0, 0, 0, 0]), jnp.zeros(3),
                gaussians_grad=False, camera_grad=False,
            )[0],
            jnp.exp(params["log_scales"]), params["unnorm_rotations"],
            camera, rc, active=variables["active"], margin_px=4.0,
            opacities=jax.nn.sigmoid(params["logit_opacities"][:, 0]),
            compact=False,
        ).lists)()
        overflow.update(
            stream_rows_used=int(sl.n_rows),
            stream_rows_budget=int(rc.stream_rows_for(rc.grid(h, w))),
            stream_refs=int(sl.n_refs),
            sat_masked=int(sl.n_sat_masked),
            dropped=int(sl.n_dropped),
        )
    overflow["grad_dropped"] = grad_dropped
    overflow["map_bin_dropped"] = map_bin_dropped

    fps = 1.0 / (track_frame_s + map_frame_s / map_every)
    return {
        "fps": round(fps, 4),
        "tracking_iter_ms": round(track_frame_s / track_iters * 1e3, 2),
        "tracking_frame_s": round(track_frame_s, 3),
        "mapping_iter_ms": round(map_frame_s / map_iters * 1e3, 2),
        "mapping_frame_s": round(map_frame_s, 3),
        "n_gaussians": n_gauss,
        "bin_overflow_pairs": dropped,
        "overflow": overflow,
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

    replica_kw = dict(h=H, w=W, n_sem=N_SEM, sem_levels=(2, 3, 5, 7, 9),
                      num_leaf=102, track_iters=TRACK_ITERS,
                      map_iters=MAP_ITERS, map_every=MAP_EVERY, window=WINDOW)
    sweep = [
        bench_config(n, camera, rc, rng, key, **replica_kw) for n in N_SWEEP
    ]
    worst = min(sweep, key=lambda r: r["fps"])

    # ---- 74-channel row (BASELINE config 5: ScanNet tree_large) ----------
    h74, w74 = 480, 640
    cam74 = setup_camera(
        w74, h74, intrinsics_matrix(577.87, 577.87, 319.5, 239.5), np.eye(4)
    )
    s74 = SourceFileLoader(
        "hierslam_semantic_large_run",
        "configs/scannet/hierslam_semantic_large_run.py",
    ).load_module().config
    rc74 = raster_config(s74)
    row74 = bench_config(
        1_000_000, cam74, rc74, rng, key,
        h=h74, w=w74, n_sem=74, sem_levels=(4, 8, 12, 20, 30),
        num_leaf=550, track_iters=100, map_iters=30, map_every=1, window=10,
    )

    result = {
        "metric": "slam_fps_replica_room0_shape_worstN",
        "value": worst["fps"],
        "unit": "frames/sec",
        "vs_baseline": round(worst["fps"] / ASSUMED_BASELINE_FPS, 3),
        "detail": {
            "headline": worst,
            "sweep": sweep,
            "scannet74": row74,
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
