"""Print the per-tile overlap-count distribution of the bench scene at N.

Sizes the bucketed-K population spec: how many tiles actually exceed each
candidate per-tile capacity (python tools/count_dist.py [N]).
"""
import sys

sys.path.insert(0, "/root/repo")
from hierslam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp
import numpy as np

from hierslam_tpu.core import gaussians as G
from hierslam_tpu.core.camera import intrinsics_matrix, setup_camera
from hierslam_tpu.ops.rasterize import RasterConfig, compute_binning

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
H, W = 680, 1200
rng = np.random.default_rng(0)
means = np.stack(
    [rng.uniform(-3, 3, N), rng.uniform(-2, 2, N), rng.uniform(0.5, 5.0, N)], -1
).astype(np.float32)
scales = np.log(rng.uniform(0.008, 0.03, (N, 1))).astype(np.float32)
camera = setup_camera(W, H, intrinsics_matrix(600.0, 600.0, 599.5, 339.5), np.eye(4))
rc = RasterConfig(max_per_tile=1024, escalate_tiles=256, escalate_k=4096)

rots = np.zeros((N, 4), np.float32)
rots[:, 0] = 1
b = jax.jit(
    lambda m, s, r: compute_binning(m, jnp.tile(jnp.exp(s), (1, 3)), r, camera, rc)
)(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(rots))
counts = np.asarray(b.lists.count)
counts_sorted = np.sort(counts)[::-1]
print("T =", counts.size, " sum(count) =", int(counts.sum()))
print("max =", counts_sorted[0])
for q in (64, 128, 256, 512, 768, 1024, 1536, 2048, 3072, 4096):
    print(f"tiles with count > {q}: {int((counts > q).sum())}")
for r in (64, 128, 256, 512, 1024, 2048, 3224):
    print(f"count at rank {r}: {counts_sorted[min(r, counts.size - 1)]}")
# how many (gaussian, tile) pairs would a rank-bucketed spec render/drop?
for spec in (
    ((256, 4096), (512, 2048), (1024, 1024), (4096, 512)),
    ((256, 4096), (768, 1024), (1024, 512), (4096, 256)),
    ((128, 4096), (512, 1024), (1024, 512), (4096, 256)),
):
    slots = rendered = 0
    lo = 0
    for nt, k in spec:
        hi = min(lo + nt, counts.size)
        cs = counts_sorted[lo:hi]
        slots += cs.size * k
        rendered += int(np.minimum(cs, k).sum())
        lo = hi
        if lo >= counts.size:
            break
    print(
        f"spec {spec}: slots {slots/1e6:.2f}M rendered {rendered/1e6:.2f}M "
        f"dropped {(counts.sum() - rendered)/1e6:.2f}M"
    )
# today's layout for comparison
base = np.minimum(counts, 1024).sum()
esc_extra = (np.minimum(counts_sorted[:256], 4096) - np.minimum(counts_sorted[:256], 1024)).sum()
print(
    f"today (K=1024 + esc 256@4096): slots {(counts.size * 1024 + 256 * 4096)/1e6:.2f}M "
    f"rendered {(base + esc_extra)/1e6:.2f}M dropped {(counts.sum() - base - esc_extra)/1e6:.2f}M"
)
