"""In-jit microbenchmarks (dispatch-free): each op runs inside one jitted
lax.scan with a serializing data dependency, so per-call axon-tunnel
latency (~25ms) is amortized away and the per-op device cost is real.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from hierslam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

REPS = 30


def bench(name, make_step, *args):
    """make_step(*args) -> (carry0, step_fn). Times REPS scan iterations."""
    carry0, step = make_step(*args)

    @jax.jit
    def run(c0):
        c, _ = jax.lax.scan(step, c0, None, length=REPS)
        return jax.tree_util.tree_map(
            lambda x: x.reshape(-1)[0] if hasattr(x, "reshape") else x, c
        )

    jax.block_until_ready(run(carry0))
    t0 = time.time()
    jax.block_until_ready(run(carry0))
    dt = (time.time() - t0) / REPS * 1e3
    print(f"{name}: {dt:.2f} ms", flush=True)
    return dt


rng = np.random.default_rng(0)
N = 300_000
M = 1_651_200


def dep(arr, out):
    """Make arr depend on out (serializes scan iterations), cheap."""
    return jax.lax.dynamic_update_slice(
        arr, (arr[:1, :1] + out.reshape(-1)[0].astype(arr.dtype)[None, None]), (0, 0)
    )


# ---- row gather [N,C] -> [M,C] (forward-style, tile-coherent idx) ----
def g_rows(c, dtype, m=M, coherent=True):
    arr = jnp.asarray(rng.uniform(0, 1, (N, c)), dtype)
    if coherent:
        base = np.sort(rng.integers(0, N, m // 8))
        idx = jnp.asarray((base[:, None] + np.arange(8)[None]).reshape(-1) % N, jnp.int32)
    else:
        idx = jnp.asarray(rng.integers(0, N, m), jnp.int32)

    def mk():
        def step(a, _):
            out = a[idx]
            return dep(a, out), None
        return arr, step
    return mk


for c in (8, 36):
    bench(f"row gather N->M C={c} f32 coherent", g_rows(c, jnp.float32))
bench("row gather N->M C=36 f32 random", g_rows(36, jnp.float32, coherent=False))
bench("row gather N->M C=36 bf16", g_rows(36, jnp.bfloat16))
bench("row gather N->M C=36 f32 M=1.1M", g_rows(36, jnp.float32, m=1_100_000))

# ---- permutation gather [M,C] -> [M,C] (backward-style) ----
def g_perm(c, dtype, m=M, lanes=False):
    perm = jnp.asarray(rng.permutation(m), jnp.int32)
    shape = (c, m) if lanes else (m, c)
    arr = jnp.asarray(rng.uniform(0, 1, shape), dtype)

    def mk():
        def step(a, _):
            out = a[:, perm] if lanes else a[perm]
            return dep(a, out), None
        return arr, step
    return mk


bench("perm gather M rows C=36 f32", g_perm(36, jnp.float32))
bench("perm gather M rows C=36 bf16", g_perm(36, jnp.bfloat16))
bench("perm gather M lanes [36,M] f32", g_perm(36, jnp.float32, lanes=True))
bench("perm gather 1.1M rows C=36 f32", g_perm(36, jnp.float32, m=1_100_000))

# ---- head gather [M,C] -> [N,C] ----
def g_head(c=36):
    idx = jnp.asarray(np.sort(rng.integers(0, M, N)), jnp.int32)
    arr = jnp.asarray(rng.uniform(0, 1, (M, c)), jnp.float32)

    def mk():
        def step(a, _):
            out = a[idx]
            return dep(a, out), None
        return arr, step
    return mk


bench("head gather M->N C=36 f32 (sorted idx)", g_head())

# ---- suffix-sum doubling passes over [M, 36] ----
def g_suffix():
    arr = jnp.asarray(rng.uniform(0, 1, (M, 36)), jnp.float32)
    skey = jnp.asarray(np.sort(rng.integers(0, N, M)), jnp.int32)

    def mk():
        def step(a, _):
            y = a
            s = 1
            while s < 16:
                same = (skey[:-s] == skey[s:])[:, None]
                y = jnp.concatenate(
                    [y[:-s] + jnp.where(same, y[s:], 0.0), y[-s:]], axis=0)
                s *= 2
            return dep(a, y), None
        return arr, step
    return mk


bench("suffix doubling x4 [M,36]", g_suffix())

# ---- sorts ----
def g_sort(m, n_ops=2):
    keys = jnp.asarray(rng.integers(0, 1 << 24, m), jnp.int32)
    pos = jnp.arange(m, dtype=jnp.int32)

    def mk():
        def step(k, _):
            out = jax.lax.sort((k,) + (pos,) * (n_ops - 1), num_keys=1)
            k2 = jax.lax.dynamic_update_slice(
                k, out[0][:1] % 7 + k[:1] % 5, (0,))
            return k2, None
        return keys, step
    return mk


bench("sort 1.95M (key,pos)", g_sort(1_950_000))
bench("sort 4.8M (key,pos)", g_sort(4_800_000))

# ---- big render-shaped image ops for scale ----
def g_img():
    a = jnp.asarray(rng.uniform(0, 1, (31, 680, 1200)), jnp.float32)

    def mk():
        def step(x, _):
            y = x * 1.0001 + 0.001
            return y, None
        return a, step
    return mk


bench("elementwise [31,680,1200] touch", g_img())
