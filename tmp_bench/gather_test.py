import time
import numpy as np
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)
N = 300_000
for F in [38, 128]:
    src = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, (3264, 2048)), jnp.int32)
    f = jax.jit(lambda s, i: jnp.sum(s[i], axis=(0, 1, 2)))
    r = float(f(src, idx))
    t0 = time.time()
    for _ in range(5):
        r = float(f(src, idx))
    print(f"gather 6.7M x {F}:", (time.time() - t0) / 5, flush=True)

M = 9_600_000
tile = jnp.asarray(rng.integers(0, 3264, M), jnp.int32)
rank = jnp.asarray(rng.integers(0, N, M), jnp.int32)
val = jnp.asarray(rng.integers(0, N, M), jnp.int32)
g = jax.jit(lambda t, r, v: jax.lax.sort((t, r, v), num_keys=2)[2][0])
x = float(g(tile, rank, val))
t0 = time.time()
for _ in range(5):
    x = float(g(tile, rank, val))
print("sort2key 9.6M:", (time.time() - t0) / 5, flush=True)

h = jax.jit(lambda t: jnp.sum(t[:4]))
x = float(h(tile))
t0 = time.time()
for _ in range(10):
    x = float(h(tile))
print("floor:", (time.time() - t0) / 10, flush=True)
