"""Persistent XLA compilation cache.

Remote-TPU compiles cost 30s-5min per executable in tunneled environments;
the persistent cache makes every rerun (benchmarks, SLAM restarts,
checkpointed resumes) reuse compiled executables from disk.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get(
        "HIERSLAM_JAX_CACHE", os.path.expanduser("~/.cache/hierslam_jax")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:
        print(f"compilation cache unavailable: {e}")
    return path
