"""Measure the mapping loss stack (SSIM + level CEs + MLP CE) fwd+bwd cost
in isolation on the TPU — roadmap data for fusing/trimming it."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from hierslam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from hierslam_tpu.ops.rasterize import RenderOutput
from hierslam_tpu.slam.losses import LossConfig, mapping_loss, mlp_init

H, W, SEM = 680, 1200, 26
rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)
im = jnp.asarray(rng.uniform(0, 1, (3, H, W)).astype(np.float32))
dep = jnp.asarray(rng.uniform(0.5, 5, (H, W)).astype(np.float32))
sem = jnp.asarray(rng.uniform(0, 1, (SEM, H, W)).astype(np.float32))
fo = jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32))
sem_levels = (2, 3, 5, 7, 9)
labels = jnp.asarray(np.concatenate(
    [rng.integers(0, n, (1, H, W)) for n in sem_levels + (102,)], 0).astype(np.int32))
cfg = LossConfig(use_sil_for_loss=False, sil_thres=0.5, w_im=0.5, w_depth=1.0,
                 w_sem=0.2, sem_levels=sem_levels, num_leaf=102, use_mlp=True)
mlp = mlp_init(SEM, 102, key)


def loss(imr, depr, semr, mlp_):
    out = RenderOutput(im=imr, radii=None, depth=depr, median_depth=depr,
                       final_opacity=fo, mask=fo, semantic=semr,
                       n_dropped=jnp.zeros((), jnp.int32), tile_count=None)
    l, _ = mapping_loss(out, im, dep, labels, mlp_, 20, cfg)
    return l


g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
r = g(im, dep, sem, mlp)
x = float(r[0].reshape(-1)[0])
t0 = time.time()
for _ in range(5):
    r = g(im, dep, sem, mlp)
    x = float(r[0].reshape(-1)[0])
print("mapping loss stack fwd+bwd:", (time.time() - t0) / 5, "s", flush=True)
