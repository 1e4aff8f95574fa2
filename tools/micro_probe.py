"""Micro-probes for the remaining mapping-iteration costs: loss pieces
(SSIM / level CEs / MLP CE / depth+mask) and per-group Adam."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from hierslam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from hierslam_tpu.ops.ssim import calc_ssim
from hierslam_tpu.slam import optim
from hierslam_tpu.slam.losses import cross_entropy_mean_cmajor, mlp_apply

H, W, SEM = 680, 1200, 26
rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)


def timeit(name, f, *args, reps=10):
    r = jax.block_until_ready(f(*args))
    t0 = time.time()
    for _ in range(reps):
        r = jax.block_until_ready(f(*args))
    print(f"{name}: {(time.time()-t0)/reps*1e3:.1f} ms", flush=True)
    return r


im = jnp.asarray(rng.uniform(0, 1, (3, H, W)).astype(np.float32))
gt = jnp.asarray(rng.uniform(0, 1, (3, H, W)).astype(np.float32))
sem = jnp.asarray(rng.normal(0, 1, (SEM, H, W)).astype(np.float32))
labels = jnp.asarray(np.concatenate(
    [rng.integers(0, n, (1, H, W)) for n in (2, 3, 5, 7, 9, 102)], 0).astype(np.int32))
mlp = {"w": jax.random.normal(key, (102, SEM)) * 0.1, "b": jnp.zeros(102)}
depth = jnp.asarray(rng.uniform(0.5, 5, (H, W)).astype(np.float32))
dgt = jnp.asarray(rng.uniform(0.5, 5, (H, W)).astype(np.float32))

timeit("ssim fwd", jax.jit(calc_ssim), im, gt)
timeit("ssim fwd+bwd", jax.jit(jax.grad(lambda a, b: calc_ssim(a, b))), im, gt)

def level_ces(s, lab):
    off, total = 0, 0.0
    for i, n in enumerate((2, 3, 5, 7, 9)):
        total += cross_entropy_mean_cmajor(s[off:off + n], lab[i])
        off += n
    return total

timeit("level CEs fwd", jax.jit(level_ces), sem, labels)
timeit("level CEs fwd+bwd", jax.jit(jax.grad(level_ces)), sem, labels)

def leaf_ce(s, m, lab):
    return cross_entropy_mean_cmajor(mlp_apply(m, s), lab[-1])

timeit("leaf CE fwd", jax.jit(leaf_ce), sem, mlp, labels)
timeit("leaf CE fwd+bwd",
       jax.jit(jax.grad(leaf_ce, argnums=(0, 1))), sem, mlp, labels)

def depth_im_loss(d, i_):
    mask = dgt > 0
    cnt = jnp.maximum(jnp.sum(mask), 1)
    l = jnp.sum(jnp.abs(dgt - d) * mask) / cnt
    l = l + 0.8 * jnp.mean(jnp.abs(i_ - gt))
    return l

timeit("depth+L1 fwd+bwd", jax.jit(jax.grad(depth_im_loss, argnums=(0, 1))), depth, im)

# ---------------- adam per group ----------------
N = 300_000
shapes = dict(means3D=(N, 3), rgb_colors=(N, 3), unnorm_rotations=(N, 4),
              logit_opacities=(N, 1), log_scales=(N, 1), semantic=(N, 26))
lrs = dict(means3D=1e-4, rgb_colors=2.5e-3, unnorm_rotations=1e-3,
           logit_opacities=0.05, log_scales=1e-3, semantic=0.05)
for k_, shp in shapes.items():
    p = {k_: jnp.asarray(rng.normal(size=shp).astype(np.float32))}
    st = optim.adam_init(p)
    timeit(f"adam[{k_} {shp}]",
           jax.jit(lambda p_, s_: optim.adam_step(p_, p_, s_, lrs, eps=1e-15)), p, st)

full = {k_: jnp.asarray(rng.normal(size=s).astype(np.float32)) for k_, s in shapes.items()}
st = optim.adam_init(full)
timeit("adam[all groups]",
       jax.jit(lambda p_, s_: optim.adam_step(p_, p_, s_, lrs, eps=1e-15)), full, st)
