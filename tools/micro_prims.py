"""Microbenchmarks of the TPU primitives that dominate mapping at N=2M.

Measures, on the real chip:
  * random row gathers (the fwd table gather / bwd cotangent permutation /
    per-gaussian head gather) vs row count and width, f32 vs bf16;
  * MONOTONE row gathers (sorted indices — segment expand);
  * 2-operand int32 ``lax.sort`` at pair-emission sizes;
  * sort with f32 payload columns (sort-as-permutation alternative);
  * the Hillis-Steele masked shift-add suffix sum.

Run: python tools/micro_prims.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=5):
    fn_j = jax.jit(fn)
    out = jax.block_until_ready(fn_j(*args))  # compile
    t0 = time.time()
    for _ in range(reps):
        out = fn_j(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps * 1e3


def main():
    rng = np.random.default_rng(0)
    N = 2_000_000

    print("== random row gather: M rows from [2M, C] f32 ==")
    for C in (8, 16, 38, 40, 64, 128):
        tab = jnp.asarray(rng.normal(size=(N, C)), jnp.float32)
        for M in (1_600_000, 3_300_000, 10_000_000):
            idx = jnp.asarray(rng.integers(0, N, M), jnp.int32)
            ms = timeit(lambda t, i: t[i], tab, idx)
            print(f"  C={C:3d} M={M/1e6:5.1f}M random: {ms:7.2f} ms "
                  f"({ms*1e6/M:6.1f} ns/row, {M*C*4/ms/1e6:7.1f} GB/s)")

    print("== monotone (sorted-index) row gather ==")
    for C in (38, 40):
        tab = jnp.asarray(rng.normal(size=(N, C)), jnp.float32)
        for M in (3_300_000, 10_000_000):
            idx = jnp.sort(jnp.asarray(rng.integers(0, N, M), jnp.int32))
            ms = timeit(lambda t, i: t[i], tab, idx)
            print(f"  C={C:3d} M={M/1e6:5.1f}M sorted: {ms:7.2f} ms ({ms*1e6/M:6.1f} ns/row)")

    print("== gather with bf16 table ==")
    tab16 = jnp.asarray(rng.normal(size=(N, 40)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, N, 3_300_000), jnp.int32)
    ms = timeit(lambda t, i: t[i], tab16, idx)
    print(f"  C=40 M=3.3M bf16 random: {ms:7.2f} ms ({ms*1e6/3.3e6:6.1f} ns/row)")

    print("== gather as one [M] linear index vs [M,1] take_along ==")
    tab = jnp.asarray(rng.normal(size=(N, 40)), jnp.float32)
    idxs = jnp.asarray(rng.integers(0, N, 3_300_000), jnp.int32)
    ms = timeit(lambda t, i: jnp.take(t, i, axis=0), tab, idxs)
    print(f"  jnp.take: {ms:7.2f} ms")

    print("== 2-operand int32 lax.sort (pair emission) ==")
    for M in (4_000_000, 8_000_000, 16_000_000, 32_000_000):
        k1 = jnp.asarray(rng.integers(0, 3225, M), jnp.int32)
        k2 = jnp.asarray(rng.integers(0, N, M), jnp.int32)
        ms = timeit(lambda a, b: jax.lax.sort((a, b), num_keys=1, is_stable=True), k1, k2)
        print(f"  M={M/1e6:5.1f}M: {ms:7.2f} ms ({ms*1e6/M:5.1f} ns/key)")

    print("== sort with f32 payload (1 key + P payload cols, M=3.3M) ==")
    M = 3_300_000
    k1 = jnp.asarray(rng.integers(0, N, M), jnp.int32)
    for P in (2, 8, 38):
        ops = [jnp.asarray(rng.normal(size=(M,)), jnp.float32) for _ in range(P)]
        ms = timeit(lambda a, *o: jax.lax.sort((a, *o), num_keys=1), k1, *ops)
        print(f"  P={P:2d}: {ms:7.2f} ms")

    print("== Hillis-Steele 4-step masked shift-add over [3.3M, 38] f32 ==")
    y0 = jnp.asarray(rng.normal(size=(3_300_000, 38)), jnp.float32)
    key = jnp.sort(jnp.asarray(rng.integers(0, N, 3_300_000), jnp.int32))

    def hs(y, k):
        s = 1
        while s < 16:
            same = (k[:-s] == k[s:])[:, None]
            y = jnp.concatenate([y[:-s] + jnp.where(same, y[s:], 0.0), y[-s:]], axis=0)
            s *= 2
        return y

    ms = timeit(hs, y0, key)
    print(f"  {ms:7.2f} ms")

    print("== argsort 2M f32 (depth order) + N-row gather by order ==")
    depth = jnp.asarray(rng.uniform(0.5, 5, N), jnp.float32)
    tab = jnp.asarray(rng.normal(size=(N, 4)), jnp.float32)
    ms = timeit(lambda d: jnp.argsort(d, stable=True), depth)
    print(f"  argsort 2M: {ms:7.2f} ms")

    print("== one-hot matmul head-select: [256,B]@[B,40] per block ==")
    # monotone head gather alternative: 2M heads from [3.3M,40] suffix array
    G_, B = 256, 512
    nblk = 2_000_000 // G_
    oneh = jnp.asarray(rng.normal(size=(nblk, G_, B)), jnp.bfloat16)
    src = jnp.asarray(rng.normal(size=(nblk, B, 40)), jnp.bfloat16)
    ms = timeit(
        lambda a, b: jnp.einsum("ngb,nbc->ngc", a, b,
                                preferred_element_type=jnp.float32), oneh, src)
    print(f"  blocked one-hot matmul ({nblk} blocks): {ms:7.2f} ms")


if __name__ == "__main__":
    main()
