"""Decompose the mapping loss stack cost at the bench shape (TPU).

Times each term standalone (fwd+bwd wrt the rendered images): depth+mask,
RGB L1, SSIM, per-level CEs, MLP leaf CE — plus variants (bf16 CE stack,
fused level CE) to pick optimizations.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from hierslam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from hierslam_tpu.ops.ssim import calc_ssim
from hierslam_tpu.slam.losses import cross_entropy_mean_cmajor, mlp_apply

H, W, SEM = 680, 1200, 26
rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)
im = jnp.asarray(rng.uniform(0, 1, (3, H, W)).astype(np.float32))
im_gt = jnp.asarray(rng.uniform(0, 1, (3, H, W)).astype(np.float32))
depth = jnp.asarray(rng.uniform(0.5, 5, (H, W)).astype(np.float32))
depth_gt = jnp.asarray(rng.uniform(0.5, 5, (H, W)).astype(np.float32))
sem = jnp.asarray(rng.normal(0, 1, (SEM, H, W)).astype(np.float32))
sem_levels = (2, 3, 5, 7, 9)
labels = jnp.asarray(
    np.stack([rng.integers(0, n, (H, W)) for n in sem_levels + (102,)], 0).astype(np.int32)
)
mlp = {"w": jax.random.normal(key, (102, SEM)) * 0.1, "b": jnp.zeros(102)}


def timeit(name, f, *args, reps=10):
    r = jax.block_until_ready(f(*args))
    t0 = time.time()
    for _ in range(reps):
        r = jax.block_until_ready(f(*args))
    print(f"{name}: {(time.time()-t0)/reps*1e3:.2f} ms", flush=True)
    return r


grad = lambda f, n=1: jax.jit(jax.grad(f, argnums=tuple(range(n))))

# depth term
def f_depth(d):
    mask = depth_gt > 0
    cnt = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.abs(depth_gt - d) * mask) / cnt

timeit("depth fwd+bwd", grad(f_depth), depth)

# rgb L1
timeit("rgb L1 fwd+bwd", grad(lambda x: jnp.mean(jnp.abs(x - im_gt))), im)

# ssim
timeit("ssim fwd+bwd", grad(lambda x: calc_ssim(x, im_gt)), im)

# level CEs
def f_lvl(s):
    tot, off = 0.0, 0
    for i, n in enumerate(sem_levels):
        tot = tot + cross_entropy_mean_cmajor(s[off:off + n], labels[i])
        off += n
    return tot

timeit("level CEs fwd+bwd", grad(f_lvl), sem)

# mlp CE
def f_mlp(s, m):
    return cross_entropy_mean_cmajor(mlp_apply(m, s), labels[-1])

timeit("mlp CE fwd+bwd", grad(f_mlp, 2), sem, mlp)

# whole sem stack
def f_sem(s, m):
    return f_lvl(s) + 5.0 * f_mlp(s, m)

timeit("sem stack fwd+bwd", grad(f_sem, 2), sem, mlp)

# ---- variants ----
# bf16 mlp matmul
def f_mlp_bf16(s, m):
    logits = (
        jnp.einsum(
            "shw,ls->lhw",
            s.astype(jnp.bfloat16),
            m["w"].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        + m["b"][:, None, None]
    )
    return cross_entropy_mean_cmajor(logits, labels[-1])

timeit("mlp CE bf16-mm fwd+bwd", grad(f_mlp_bf16, 2), sem, mlp)

# flattened-pixel-major mlp CE (HW, C layout)
def f_mlp_pmajor(s, m):
    x = s.reshape(SEM, H * W).T  # [P, S]
    logits = x @ m["w"].T + m["b"]  # [P, 102]
    lab = labels[-1].reshape(-1)
    mx = jnp.max(logits, axis=1)
    lse = jnp.log(jnp.sum(jnp.exp(logits - mx[:, None]), axis=1)) + mx
    cls = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    picked = jnp.sum(jnp.where(cls == lab[:, None], logits, 0.0), axis=1)
    return jnp.mean(lse - picked)

timeit("mlp CE pixel-major fwd+bwd", grad(f_mlp_pmajor, 2), sem, mlp)

# one-hot matmul CE: picked = sum(logits * onehot) via masked sum already;
# try single fused lse over all levels at once (padded block CE)
def f_lvl_onepass(s):
    # levels packed contiguously: compute exp once, segment-sum via matmul
    m = jnp.max(s, axis=0, keepdims=True)  # shared max (upper bound) per pixel
    e = jnp.exp(s - m)
    seg = np.zeros((len(sem_levels), SEM), np.float32)
    off = 0
    for i, n in enumerate(sem_levels):
        seg[i, off:off + n] = 1.0
        off += n
    segm = jnp.asarray(seg)
    denom = jnp.einsum("ls,shw->lhw", segm, e)  # [L, H, W]
    lse = jnp.log(denom) + m[0]
    cls = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    offs = np.concatenate([[0], np.cumsum(sem_levels)]).astype(np.int32)
    picked = []
    for i in range(len(sem_levels)):
        lab = labels[i][None] + offs[i]
        picked.append(jnp.sum(jnp.where(cls == lab, s, 0.0), axis=0))
    picked = jnp.stack(picked)
    return jnp.sum(jnp.mean(lse - picked, axis=(1, 2)))

r1 = jax.jit(f_lvl)(sem)
r2 = jax.jit(f_lvl_onepass)(sem)
print(f"level CE onepass match: {float(jnp.abs(r1 - r2)):.2e}")
timeit("level CEs onepass fwd+bwd", grad(f_lvl_onepass), sem)
