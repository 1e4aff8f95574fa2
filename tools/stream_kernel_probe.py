"""Standalone TPU compile/run probe for the stream blend kernels.

Usage: python tools/stream_kernel_probe.py [fwd|bwd|both] [T] [rows] [cap]
Times compile + run of ops/render_stream.blend_stream forward and backward
in isolation at a synthetic ragged stream, so Mosaic failures can be
attributed to one kernel without waiting on the full mapper build.
"""
import sys
import time

import numpy as np

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hierslam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp

from hierslam_tpu.ops import render_stream as rs

which = sys.argv[1] if len(sys.argv) > 1 else "both"
T = int(sys.argv[2]) if len(sys.argv) > 2 else 64          # tiles
R = int(sys.argv[3]) if len(sys.argv) > 3 else 512         # stream rows
CAP = int(sys.argv[4]) if len(sys.argv) > 4 else 1024      # per-tile cap
N_FEAT = 26 + 3
grid = (8, T // 8)
tile_shape = (16, 16)
H, W = grid[0] * 16, grid[1] * 16

rng = np.random.default_rng(0)
V = 20000
tab = np.zeros((V + 1, 128), np.float32)
tab[:V, rs.COL_MEAN:rs.COL_MEAN + 3] = np.stack(
    [rng.uniform(-2, 2, V), rng.uniform(-2, 2, V), rng.uniform(0.5, 5, V)], -1)
tab[:V, rs.COL_LOGS] = np.log(rng.uniform(0.01, 0.05, V))
tab[:V, rs.COL_LOGIT] = rng.normal(1.0, 1.0, V)
tab[:V, rs.COL_FEAT:rs.COL_FEAT + N_FEAT] = rng.uniform(0, 1, (V, N_FEAT))
tab[V, rs.COL_LOGIT] = rs.SENTINEL_LOGIT

rows_per_tile = R // T
row_off = np.arange(T + 1, dtype=np.int32) * rows_per_tile
stream = rng.integers(0, V, (R, 128)).astype(np.int32)
CP = -(-(rs.COL_FEAT + N_FEAT) // 8) * 8
g = jnp.swapaxes(
    jnp.asarray(tab)[jnp.asarray(stream).reshape(-1)].reshape(R, 128, 128)[
        ..., :CP
    ],
    1, 2,
)  # [R, CP, 128] columns-first


class Cam:
    focal_x = focal_y = 300.0
    tan_fovx = W / (2 * 300.0)
    tan_fovy = H / (2 * 300.0)
    height, width = H, W
    proj_height = H
    full_proj = np.array(
        [[2 * 300.0 / W, 0, 0, 0], [0, 2 * 300.0 / H, 0, 0],
         [0, 0, 1.0001, -0.01], [0, 0, 1, 0]], np.float32).T


sc = rs.make_scalars(jnp.eye(4, dtype=jnp.float32), Cam)
ro = jnp.asarray(row_off)

t0 = time.time()
fwd = jax.jit(lambda g_: rs.blend_stream(
    g_, sc, ro, grid, tile_shape, N_FEAT, (H, W), CAP, False))
acc, ft, med = jax.block_until_ready(fwd(g))
print(f"fwd compile+run {time.time()-t0:.1f}s acc_sum={float(acc.sum()):.3f} "
      f"ft_mean={float(ft.mean()):.4f}", flush=True)
t0 = time.time()
jax.block_until_ready(fwd(g))
print(f"fwd run {time.time()-t0:.3f}s", flush=True)

if which.startswith("loop"):
    # mirror the mapping scan: many kernel launches inside ONE execution
    n_loop = int(which[4:] or "60")

    def loss(g_):
        acc, ft, med = rs.blend_stream(
            g_, sc, ro, grid, tile_shape, N_FEAT, (H, W), CAP, False)
        return jnp.sum(acc * 1e-3) + jnp.sum(ft) * 1e-3 + jnp.sum(med) * 1e-4

    @jax.jit
    def many(g_):
        def body(c, _):
            l, dg = jax.value_and_grad(loss)(g_ + c * 0e-9)
            return c + l * 1e-9 + jnp.sum(dg) * 1e-12, l
        return jax.lax.scan(body, 0.0, None, length=n_loop)

    t0 = time.time()
    s, ls = jax.block_until_ready(many(g))
    print(f"loop{n_loop} compile+run {time.time()-t0:.1f}s s={float(s):.4f}",
          flush=True)
    t0 = time.time()
    jax.block_until_ready(many(g))
    print(f"loop{n_loop} run {time.time()-t0:.2f}s "
          f"({(time.time()-t0)/n_loop*1e3:.1f} ms/iter fwd+bwd)", flush=True)
    sys.exit(0)

if which in ("bwd", "both"):
    def loss(g_):
        acc, ft, med = rs.blend_stream(
            g_, sc, ro, grid, tile_shape, N_FEAT, (H, W), CAP, False)
        return jnp.sum(acc * 1e-3) + jnp.sum(ft) * 1e-3 + jnp.sum(med) * 1e-4

    t0 = time.time()
    bwd = jax.jit(jax.grad(loss))
    dg = jax.block_until_ready(bwd(g))
    print(f"bwd compile+run {time.time()-t0:.1f}s dg_norm="
          f"{float(jnp.linalg.norm(dg)):.4f}", flush=True)
    t0 = time.time()
    jax.block_until_ready(bwd(g))
    print(f"bwd run {time.time()-t0:.3f}s", flush=True)
