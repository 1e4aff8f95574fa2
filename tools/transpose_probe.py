"""Microbench: [R, 128, 128] gather output -> [R, cp, 128] stream layout.

The stream mapper's per-iteration table build is gather -> slice ->
swapaxes; the XLA transpose custom-call ran at ~40 ms/iter in the r5
trace (16 GB/s effective — far off bandwidth).  Candidates:

    xla     — jnp.swapaxes(g[..., :cp], 1, 2)  (the current path)
    xla_rev — slice AFTER transpose (swap first, then row slice)
    pallas  — per-block Pallas transpose kernel

Usage: python tools/transpose_probe.py [R] [cp]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from hierslam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

R = int(sys.argv[1]) if len(sys.argv) > 1 else 32000
CP = int(sys.argv[2]) if len(sys.argv) > 2 else 40
BLK = int(os.environ.get("TP_BLK", "8"))

key = jax.random.PRNGKey(0)
g = jax.random.normal(key, (R, 128, 128), jnp.float32)


@jax.jit
def xla(g):
    return jnp.swapaxes(g[..., :CP], 1, 2)


@jax.jit
def xla_rev(g):
    return jnp.swapaxes(g, 1, 2)[:, :CP, :]


def _tr_kernel(x_ref, o_ref):
    o_ref[:] = jnp.swapaxes(x_ref[:], 1, 2)[:, :CP, :]


@jax.jit
def pallas_tr(g):
    return pl.pallas_call(
        _tr_kernel,
        grid=(R // BLK,),
        in_specs=[pl.BlockSpec((BLK, 128, 128), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((BLK, CP, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((R, CP, 128), jnp.float32),
    )(g)


def bench(name, fn):
    try:
        o = fn(g)
        o.block_until_ready()
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            o = fn(g)
        float(o[0, 0, 0])
        dt = (time.time() - t0) / reps * 1e3
        gb = (R * 128 * 128 + R * CP * 128) * 4 / 1e9
        print(f"{name:10s} {dt:8.2f} ms  ({gb/dt*1e3:6.1f} GB/s r+w)", flush=True)
    except Exception as e:
        print(f"{name:10s} FAILED: {str(e)[:200]}", flush=True)


for name, fn in [("xla", xla), ("xla_rev", xla_rev), ("pallas", pallas_tr)]:
    bench(name, fn)
