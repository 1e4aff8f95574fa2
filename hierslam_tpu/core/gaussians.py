"""Fixed-capacity Gaussian map state + depth back-projection initialization.

The reference grows/shrinks torch tensors every densify/prune
(scripts/hierslam.py:1342-1350, utils/slam_external.py:139-160) — a
dynamic-shape event per mapping phase.  On TPU everything under jit must be
static, so the map is a **capacity-N SoA with an `active` mask**: densify
writes into free slots, prune clears mask bits, and the rasterizer honors
the mask.  Param dict keys mirror the reference exactly so `params.npz`
artifacts interoperate (scripts/hierslam.py:322-409, :2163-2176).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]
Variables = Dict[str, jax.Array]

# Per-Gaussian parameter keys (rows are capacity slots); camera keys are
# excluded from densify/prune, mirroring slam_external.py:141.
GAUSSIAN_KEYS = (
    "means3D",
    "rgb_colors",
    "unnorm_rotations",
    "logit_opacities",
    "log_scales",
    "semantic",
)
CAMERA_KEYS = ("cam_unnorm_rots", "cam_trans")


def pixel_rays(width: int, height: int, intrinsics: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Normalized pixel ray directions ((x-cx)/fx, (y-cy)/fy) flattened row-major.

    Matches the meshgrid of get_pointcloud (scripts/hierslam.py:152-159).
    """
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    xs = (jnp.arange(width, dtype=jnp.float32) - cx) / fx
    ys = (jnp.arange(height, dtype=jnp.float32) - cy) / fy
    xx = jnp.tile(xs[None, :], (height, 1)).reshape(-1)
    yy = jnp.tile(ys[:, None], (1, width)).reshape(-1)
    return xx, yy


def backproject(
    depth: jax.Array,        # [H, W] meters
    intrinsics: jax.Array,   # [3, 3]
    w2c: jax.Array,          # [4, 4]
) -> jax.Array:
    """Depth image -> world-frame points [H*W, 3]
    (get_pointcloud, scripts/hierslam.py:144-194)."""
    h, w = depth.shape
    xx, yy = pixel_rays(w, h, intrinsics)
    z = depth.reshape(-1)
    pts_cam = jnp.stack([xx * z, yy * z, z], -1)
    c2w = jnp.linalg.inv(w2c)
    # f32-exact: default TPU matmul is single-pass bf16 (mm-scale error)
    return (
        jnp.dot(pts_cam, c2w[:3, :3].T, precision=jax.lax.Precision.HIGHEST)
        + c2w[:3, 3]
    )


def mean_sq_dist_projective(depth: jax.Array, intrinsics: jax.Array) -> jax.Array:
    """Projective scale prior: (z / mean focal)^2 (scripts/hierslam.py:174-177)."""
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    z = depth.reshape(-1)
    s = z / ((fx + fy) / 2)
    return s * s


def empty_params(
    capacity: int, num_frames: int, num_semantic: int = 0, dtype=jnp.float32
) -> Params:
    """Capacity-shaped zero params.  Camera trajectory layout matches the
    reference artifact: cam_unnorm_rots [1,4,F] (identity quats),
    cam_trans [1,3,F] zeros (scripts/hierslam.py:341-345)."""
    p: Params = {
        "means3D": jnp.zeros((capacity, 3), dtype),
        "rgb_colors": jnp.zeros((capacity, 3), dtype),
        "unnorm_rotations": jnp.zeros((capacity, 4), dtype).at[:, 0].set(1.0),
        "logit_opacities": jnp.zeros((capacity, 1), dtype),
        "log_scales": jnp.zeros((capacity, 1), dtype),
        "cam_unnorm_rots": jnp.zeros((1, 4, num_frames), dtype).at[:, 0, :].set(1.0),
        "cam_trans": jnp.zeros((1, 3, num_frames), dtype),
    }
    if num_semantic > 0:
        p["semantic"] = jnp.zeros((capacity, num_semantic), dtype)
    return p


def empty_variables(capacity: int) -> Variables:
    """Aux per-Gaussian bookkeeping (scripts/hierslam.py:354-357) plus the
    capacity machinery (active mask + live count)."""
    return {
        "active": jnp.zeros((capacity,), bool),
        "n_active": jnp.zeros((), jnp.int32),
        "max_2D_radius": jnp.zeros((capacity,), jnp.float32),
        "means2D_gradient_accum": jnp.zeros((capacity,), jnp.float32),
        "denom": jnp.zeros((capacity,), jnp.float32),
        "timestep": jnp.zeros((capacity,), jnp.float32),
        "scene_radius": jnp.ones((), jnp.float32),
    }


def insert_gaussians(
    params: Params,
    variables: Variables,
    new_fields: Params,      # per-key [M, ...] candidate rows
    mask: jax.Array,         # [M] bool — which candidates to insert
    time_idx,
) -> Tuple[Params, Variables, jax.Array]:
    """Scatter masked candidate rows into free capacity slots (append order
    preserved).  Returns (params, variables, n_overflowed).

    Equivalent to the torch.cat append of initialize_new_params_semantic /
    add_new_gaussians (scripts/hierslam.py:1342-1350) under a static
    capacity: rows that don't fit are counted, not silently lost.
    """
    capacity = params["means3D"].shape[0]
    n_active = variables["n_active"]
    m = mask.shape[0]

    slot = n_active + jnp.cumsum(mask.astype(jnp.int32)) - 1
    ok = mask & (slot < capacity)
    tgt = jnp.where(ok, slot, capacity)  # scatter-drop index

    out = dict(params)
    for k in GAUSSIAN_KEYS:
        if k not in params:
            continue
        out[k] = params[k].at[tgt].set(new_fields[k], mode="drop")

    n_insert = jnp.sum(ok.astype(jnp.int32))
    n_requested = jnp.sum(mask.astype(jnp.int32))
    variables = dict(variables)
    variables["active"] = variables["active"].at[tgt].set(True, mode="drop")
    variables["timestep"] = variables["timestep"].at[tgt].set(
        jnp.full((m,), time_idx, jnp.float32), mode="drop"
    )
    variables["n_active"] = n_active + n_insert
    return out, variables, n_requested - n_insert


def pointcloud_fields(
    color: jax.Array,        # [3, H, W] in [0, 1]
    depth: jax.Array,        # [H, W]
    intrinsics: jax.Array,
    w2c: jax.Array,
    num_semantic: int,
    key: Optional[jax.Array],
) -> Params:
    """Candidate Gaussian rows from one RGB-D view (all H*W pixels; caller
    masks).  Scale init: log sqrt((z/f)^2) (scripts/hierslam.py:328,387);
    opacity logit 0 (=0.5); identity rotations; semantic ~ U[0,1)
    (flag_init=2, scripts/hierslam.py:363-376,1139-1150)."""
    pts = backproject(depth, intrinsics, w2c)
    m3sd = mean_sq_dist_projective(depth, intrinsics)
    n = pts.shape[0]
    cols = color.reshape(3, -1).T
    fields: Params = {
        "means3D": pts,
        "rgb_colors": cols,
        "unnorm_rotations": jnp.zeros((n, 4)).at[:, 0].set(1.0),
        "logit_opacities": jnp.zeros((n, 1)),
        "log_scales": 0.5 * jnp.log(jnp.maximum(m3sd, 1e-12))[:, None],
    }
    if num_semantic > 0:
        fields["semantic"] = jax.random.uniform(key, (n, num_semantic))
    return fields


PER_GAUSSIAN_VARS = (
    "active", "max_2D_radius", "means2D_gradient_accum", "denom", "timestep"
)


@jax.jit
def compact_slots(params: Params, variables: Variables) -> Tuple[Params, Variables]:
    """Stable-partition live rows to the front of every capacity array.

    Pruning only clears ``active`` bits, so long runs accumulate holes in
    the [0, n_active) prefix and the active-prefix compute bucket keeps
    paying for dead slots; once ``n_active`` reaches capacity, insertion
    stops forever even though live gaussians may be far fewer.  Compaction
    reclaims the holes as reusable append slots (the reference reclaims by
    physically reallocating smaller tensors, utils/slam_external.py:139-160).

    Relative order of live rows is preserved (stable partition), matching
    the reference's boolean-mask row removal.
    """
    active = variables["active"]
    # stable argsort of (not active): live rows first, original order kept
    order = jnp.argsort(~active, stable=True).astype(jnp.int32)
    out = dict(params)
    for k in GAUSSIAN_KEYS:
        if k in params:
            out[k] = params[k][order]
    v = dict(variables)
    for k in PER_GAUSSIAN_VARS:
        v[k] = variables[k][order]
    v["n_active"] = jnp.sum(active.astype(jnp.int32))
    return out, v


@jax.jit
def emergency_prune(
    params: Params, variables: Variables, need_free, max_fraction=0.2
) -> Tuple[Variables, jax.Array]:
    """Deactivate the ``need_free`` least-opaque live gaussians (capped at
    ``max_fraction`` of the live map).  Escalating prune pressure for
    capacity saturation: the map keeps its most confident geometry and
    densification regains room.  Returns (variables, n_freed)."""
    active = variables["active"]
    n_live = jnp.sum(active.astype(jnp.int32))
    k = jnp.minimum(
        jnp.asarray(need_free, jnp.int32),
        (max_fraction * n_live.astype(jnp.float32)).astype(jnp.int32),
    )
    opa = jnp.where(active, params["logit_opacities"][:, 0], jnp.inf)
    srt = jnp.sort(opa)
    # threshold at the k-th smallest live opacity (k=0 -> -inf: none pruned)
    thresh = jnp.where(k > 0, srt[jnp.maximum(k - 1, 0)], -jnp.inf)
    drop = active & (opa <= thresh)
    v = dict(variables)
    v["active"] = active & ~drop
    return v, jnp.sum(drop.astype(jnp.int32))


def active_params_to_numpy(params: Params, variables: Variables) -> Dict[str, "object"]:
    """Host-side compaction to live rows only, for `params.npz` artifacts
    (matches the dynamic-shape arrays the reference saves)."""
    import numpy as np

    act = np.asarray(variables["active"])
    out = {}
    for k, v in params.items():
        v = np.asarray(v)
        out[k] = v[act] if k in GAUSSIAN_KEYS else v
    out["timestep"] = np.asarray(variables["timestep"])[act]
    return out
