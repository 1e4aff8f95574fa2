"""Compile-only HBM sizing of the bench mapping phase at a given N.

Builds the exact bench.py mapping workload (1200x680, 24-frame window,
26-channel semantics, shipped-config raster knobs) and AOT-compiles
``map_phase`` WITHOUT running it, printing the compiled program's memory
analysis — the fast feedback loop for chasing layout-padding OOMs
(a T(8,128)-padded [1.5M, c<128] temp costs 732MB regardless of c).

Usage:  python tools/mem_probe.py [N=2000000]
"""
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    import jax
    import jax.numpy as jnp

    from hierslam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bench import H, MAP_ITERS, N_SEM, W, WINDOW, build_state
    from hierslam_tpu.core.camera import intrinsics_matrix, setup_camera
    from hierslam_tpu.slam import optim
    from hierslam_tpu.slam.losses import LossConfig, mlp_init
    from hierslam_tpu.slam.mapping import PruneConfig, make_mapper

    camera = setup_camera(
        W, H, intrinsics_matrix(600.0, 600.0, 599.5, 339.5), np.eye(4)
    )
    from importlib.machinery import SourceFileLoader

    shipped = SourceFileLoader(
        "hierslam_semantic_run", "configs/replica/hierslam_semantic_run.py"
    ).load_module().config
    from hierslam_tpu.config import raster_config

    rc = raster_config(shipped)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    params, variables = build_state(n, rng, key)
    sem_levels = (2, 3, 5, 7, 9)
    map_loss = LossConfig(
        use_sil_for_loss=False, sil_thres=0.5, w_im=0.5, w_depth=1.0,
        w_sem=0.2, sem_levels=sem_levels, num_leaf=102, use_mlp=True,
    )
    lrs = dict(
        means3D=1e-4, rgb_colors=2.5e-3, unnorm_rotations=1e-3,
        logit_opacities=0.05, log_scales=1e-3, semantic=0.05,
    )
    mapper = make_mapper(camera, map_loss, rc, lrs, MAP_ITERS, PruneConfig())
    mlp = mlp_init(N_SEM, 102, key)
    mlp_state = optim.adam_init(mlp)
    window = {
        "im": jnp.zeros((WINDOW, 3, H, W)),
        "depth": jnp.zeros((WINDOW, H, W)),
        "labels": jnp.zeros((WINDOW, 6, H, W), jnp.int32),
        "time_idx": jnp.zeros((WINDOW,), jnp.int32),
    }
    rand_idx = jnp.zeros((MAP_ITERS,), jnp.int32)

    print(f"lowering map_phase at N={n} ...", flush=True)
    lowered = mapper.lower(params, variables, window, rand_idx, mlp, mlp_state)
    print("compiling ...", flush=True)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    gb = 1024 ** 3
    print(
        f"N={n}  temp={ma.temp_size_in_bytes / gb:.2f}G  "
        f"args={ma.argument_size_in_bytes / gb:.2f}G  "
        f"out={ma.output_size_in_bytes / gb:.2f}G  "
        f"total={(ma.temp_size_in_bytes + ma.argument_size_in_bytes + ma.output_size_in_bytes) / gb:.2f}G"
    )


if __name__ == "__main__":
    main()
