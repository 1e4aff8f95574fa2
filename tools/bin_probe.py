"""Component-level TPU timings for the binning pipeline at bench scale.

Times, on synthetic data matching the N=2M bench distribution:
  1. full bin_gaussians (current tree)
  2. the emission sort: 2-key stable vs 3-key unstable
  3. the [T, K] list extraction: 1-col narrow vs 8-col widened gather
  4. build_inverse_map
Scalar fences (float fetch) per the relay discipline.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from hierslam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp
import numpy as np

from hierslam_tpu.ops import binning

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
K = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
GRID = (43, 75)
T = GRID[0] * GRID[1]

rng = np.random.default_rng(0)
# rect distribution like the bench scene: most gaussians touch 1-4 tiles
cx = rng.integers(0, GRID[1], N)
cy = rng.integers(0, GRID[0], N)
w = np.clip(rng.geometric(0.55, N), 1, 6)
h = np.clip(rng.geometric(0.55, N), 1, 6)
rect_min = np.stack([np.clip(cx, 0, GRID[1] - 1), np.clip(cy, 0, GRID[0] - 1)], -1)
rect_max = np.stack(
    [np.clip(cx + w, 1, GRID[1]), np.clip(cy + h, 1, GRID[0])], -1
).astype(np.int32)
rect_min = rect_min.astype(np.int32)
valid = rng.uniform(size=N) > 0.25
depth = rng.uniform(0.3, 6.0, N).astype(np.float32)

rect_min, rect_max = jnp.asarray(rect_min), jnp.asarray(rect_max)
valid, depth = jnp.asarray(valid), jnp.asarray(depth)


def fence(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def timeit(name, fn, *args, reps=5):
    r = fn(*args)
    fence(jax.tree_util.tree_leaves(r)[0])
    t0 = time.time()
    for _ in range(reps):
        r = fn(*args)
        fence(jax.tree_util.tree_leaves(r)[0])
    print(f"{name}: {(time.time() - t0) / reps * 1e3:.1f} ms", flush=True)
    return r


# ---- 1. full binning ----------------------------------------------------
bin_full = jax.jit(
    lambda a, b, c, d: binning.bin_gaussians(a, b, c, d, GRID, K)[0]
)
lists = timeit("bin_gaussians(full)", bin_full, rect_min, rect_max, valid, depth)
print("  maxtile", int(lists.count.max()), "dropped", int(lists.n_dropped), flush=True)

# ---- 2. emission + sort variants ---------------------------------------
r_cap = 16
budgets = binning.default_emission_budgets(N, r_cap)


@jax.jit
def emit(rect_min, rect_max, valid, depth):
    w_rect = (rect_max[:, 0] - rect_min[:, 0]).astype(jnp.int32)
    touched_all = jnp.where(
        valid, w_rect * (rect_max[:, 1] - rect_min[:, 1]).astype(jnp.int32), 0
    )
    touched = jnp.minimum(touched_all, r_cap)
    order = jnp.argsort(-touched, stable=True).astype(jnp.int32)
    packed_src = jax.lax.optimization_barrier(
        jnp.stack(
            [rect_min[:, 0], rect_min[:, 1], jnp.maximum(w_rect, 1), touched,
             jax.lax.bitcast_convert_type(depth, jnp.int32),
             jnp.zeros_like(touched), jnp.zeros_like(touched),
             jnp.zeros_like(touched)], -1,
        )
    )
    packed = jax.lax.optimization_barrier(packed_src[order])
    depth_s = jax.lax.bitcast_convert_type(packed[:, 4], jnp.float32)
    tiles_parts, depth_parts, gauss_parts = [], [], []
    for r in range(r_cap):
        b = budgets[r]
        pk = packed[:b]
        cell_x = pk[:, 0] + r % pk[:, 2]
        cell_y = pk[:, 1] + r // pk[:, 2]
        ok = r < pk[:, 3]
        tiles_parts.append(
            jnp.where(ok, cell_y * GRID[1] + cell_x, T).astype(jnp.int32)
        )
        depth_parts.append(depth_s[:b])
        gauss_parts.append(order[:b])
    return (
        jnp.concatenate(tiles_parts),
        jnp.concatenate(depth_parts),
        jnp.concatenate(gauss_parts),
    )


flat_tile, flat_depth, flat_gauss = emit(rect_min, rect_max, valid, depth)
flat_tile.block_until_ready()
print("emitted", flat_tile.shape[0], "keys", flush=True)

sort3 = jax.jit(
    lambda t, d, g: jax.lax.sort((t, d, g), num_keys=3, is_stable=False)
)
sort2 = jax.jit(
    lambda t, d, g: jax.lax.sort((t, d, g), num_keys=2, is_stable=True)
)
s_tile, _, s_gauss = timeit("sort 3-key unstable", sort3, flat_tile, flat_depth, flat_gauss)
timeit("sort 2-key stable  ", sort2, flat_tile, flat_depth, flat_gauss)

# ---- 3. [T, K] extraction variants --------------------------------------
tile_ids = jnp.arange(T, dtype=jnp.int32)
starts = jnp.searchsorted(s_tile, tile_ids).astype(jnp.int32)
ends = jnp.searchsorted(s_tile, tile_ids, side="right").astype(jnp.int32)
counts = ends - starts
m = s_gauss.shape[0]


@jax.jit
def extract_wide(s_gauss, starts, counts):
    kk = jnp.arange(K, dtype=jnp.int32)
    take = starts[:, None] + kk[None, :]
    ok = kk[None, :] < counts[:, None]
    pad = jnp.concatenate([s_gauss, jnp.full((1,), -1, jnp.int32)])
    src8 = jax.lax.optimization_barrier(jnp.pad(pad[:, None], ((0, 0), (0, 7))))
    lists8 = jax.lax.optimization_barrier(src8[jnp.minimum(take, m)])
    return jnp.where(ok, lists8[..., 0], -1)


@jax.jit
def extract_narrow(s_gauss, starts, counts):
    kk = jnp.arange(K, dtype=jnp.int32)
    take = starts[:, None] + kk[None, :]
    ok = kk[None, :] < counts[:, None]
    pad = jnp.concatenate([s_gauss, jnp.full((1,), -1, jnp.int32)])
    return jnp.where(ok, pad[jnp.minimum(take, m)], -1)


timeit("extract [T,K] 8-col widened", extract_wide, s_gauss, starts, counts)
timeit("extract [T,K] 1-col narrow ", extract_narrow, s_gauss, starts, counts)

# ---- 4. inverse map ------------------------------------------------------
from hierslam_tpu.ops.gather_vjp import build_inverse_map

lists_idx = extract_narrow(s_gauss, starts, counts)
inv = jax.jit(lambda idx: build_inverse_map(idx, N, r_cap))
timeit("build_inverse_map", inv, lists_idx)
