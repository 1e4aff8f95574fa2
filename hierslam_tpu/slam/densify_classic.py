"""Classic 3DGS gradient-driven clone/split densification
(utils/slam_external.py:191-243) over capacity slots.

Disabled in every shipped reference config
(``use_gaussian_splatting_densification=False``,
configs/replica/hierslam_semantic_run.py:129) but part of the API surface:
provided as a standalone jitted step.

Semantics reproduced:
* accumulate ``||dL/d means2D||`` into ``means2D_gradient_accum`` / ``denom``
  for Gaussians seen this iteration (accumulate_mean2d_gradient, :100-104);
* CLONE: grad >= thresh and max scale <= 0.01 * scene_radius — duplicate
  in place (:198-201);
* SPLIT: grad >= thresh and max scale > 0.01 * scene_radius — insert
  ``n`` samples drawn from the Gaussian itself with scales shrunk by
  ``0.8 n`` and remove the original (:206-224);
* opacity/size pruning on the densify schedule (:226-234);
* appended rows start with zero Adam moments; removed rows' moments are
  zeroed (cat_params_to_optimizer / remove_points).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from hierslam_tpu.core import gaussians as G
from hierslam_tpu.core.transforms import quat_to_rotmat
from hierslam_tpu.slam import optim


@dataclass(frozen=True)
class DensifyConfig:
    """densify_dict schema (configs/replica/hierslam_semantic_run.py:130-140)."""

    start_after: int = 500
    remove_big_after: int = 3000
    stop_after: int = 5000
    densify_every: int = 100
    grad_thresh: float = 0.0002
    num_to_split_into: int = 2
    removal_opacity_threshold: float = 0.005
    final_removal_opacity_threshold: float = 0.005
    reset_opacities_every: int = 3000


def accumulate_mean2d_gradient(variables: Dict, means2d_grad: jax.Array, seen: jax.Array) -> Dict:
    """variables['means2D_gradient_accum'][seen] += ||grad[:, :2]||;
    denom[seen] += 1 (utils/slam_external.py:100-104)."""
    norm = jnp.linalg.norm(means2d_grad[:, :2], axis=-1)
    variables = dict(variables)
    variables["means2D_gradient_accum"] = variables["means2D_gradient_accum"] + jnp.where(
        seen, norm, 0.0
    )
    variables["denom"] = variables["denom"] + seen.astype(jnp.float32)
    return variables


def densify_step(
    params: Dict,
    variables: Dict,
    opt: optim.AdamState,
    iter_idx,
    cfg: DensifyConfig,
    key: jax.Array,
) -> Tuple[Dict, Dict, optim.AdamState, jax.Array]:
    """One clone/split/prune pass (call under the densify schedule).
    Returns (params, variables, opt, n_overflowed)."""
    it = jnp.asarray(iter_idx, jnp.int32)
    active = variables["active"]
    grads = variables["means2D_gradient_accum"] / jnp.maximum(variables["denom"], 1e-12)
    grads = jnp.where(jnp.isnan(grads) | ~active, 0.0, grads)
    scales = jnp.exp(params["log_scales"])
    max_scale = jnp.max(scales, axis=1)
    small = max_scale <= 0.01 * variables["scene_radius"]

    to_clone = (grads >= cfg.grad_thresh) & small & active
    to_split = (grads >= cfg.grad_thresh) & ~small & active

    gkeys = [k for k in G.GAUSSIAN_KEYS if k in params]

    # --- clones: exact copies appended into free slots -------------------
    fields_clone = {k: params[k] for k in gkeys}
    params, variables, over1 = G.insert_gaussians(
        params, variables, fields_clone, to_clone, variables["timestep"]
    )

    # --- splits: n resampled shrunken copies, original removed -----------
    n = cfg.num_to_split_into
    R = quat_to_rotmat(params["unnorm_rotations"])  # [N,3,3]
    over2 = jnp.zeros((), jnp.int32)
    for j in range(n):
        key, sub = jax.random.split(key)
        eps = jax.random.normal(sub, params["means3D"].shape)
        local = eps * jnp.broadcast_to(scales, params["means3D"].shape)
        offset = jnp.einsum("nij,nj->ni", R, local)
        fields = {k: params[k] for k in gkeys}
        fields = dict(fields)
        fields["means3D"] = params["means3D"] + offset
        fields["log_scales"] = params["log_scales"] - jnp.log(0.8 * n)
        params, variables, ov = G.insert_gaussians(
            params, variables, fields, to_split, variables["timestep"]
        )
        over2 = over2 + ov
    variables = dict(variables)
    variables["active"] = variables["active"] & ~to_split
    opt = optim.zero_moment_rows(opt, to_split)

    # --- prune (slam_external.py:226-234) ---------------------------------
    thresh = jnp.where(
        it == cfg.stop_after, cfg.final_removal_opacity_threshold,
        cfg.removal_opacity_threshold,
    )
    removed = jax.nn.sigmoid(params["logit_opacities"][:, 0]) < thresh
    big = (jnp.exp(jnp.max(params["log_scales"], axis=1)) > 0.1 * variables["scene_radius"]) & (
        it >= cfg.remove_big_after
    )
    removed = (removed | big) & variables["active"]
    variables["active"] = variables["active"] & ~removed
    opt = optim.zero_moment_rows(opt, removed)

    # reset the densification stats at the new size (slam_external.py:220-222)
    variables["means2D_gradient_accum"] = jnp.zeros_like(variables["means2D_gradient_accum"])
    variables["denom"] = jnp.zeros_like(variables["denom"])
    variables["max_2D_radius"] = jnp.zeros_like(variables["max_2D_radius"])
    return params, variables, opt, over1 + over2
