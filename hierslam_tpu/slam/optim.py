"""Per-group Adam over param dicts, with capacity-slot moment surgery.

Reproduces the reference's torch.optim.Adam usage:
* tracking: fresh Adam per frame, default eps=1e-8
  (scripts/hierslam.py:411-417, :1812);
* mapping: fresh Adam per mapping phase, eps=1e-15 (:417, :1979);
* per-param-group learning rates from the config lrs dicts;
* prune/densify moment surgery — removed rows' moments are zeroed, appended
  rows start at zero (utils/slam_external.py:107-160).  With a fixed
  capacity this is just row-masking the moment buffers.

A hand-rolled Adam (rather than optax) keeps the moment buffers as plain
[capacity, ...] arrays we can row-surgery inside jit.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, jax.Array]


class AdamState(NamedTuple):
    mu: Params
    nu: Params
    count: jax.Array  # int32 scalar (steps taken)


def adam_init(params: Params) -> AdamState:
    z = {k: jnp.zeros_like(v) for k, v in params.items()}
    return AdamState(mu=z, nu={k: jnp.zeros_like(v) for k, v in params.items()},
                     count=jnp.zeros((), jnp.int32))


def adam_step(
    params: Params,
    grads: Params,
    state: AdamState,
    lrs: Dict[str, float],
    eps: float = 1e-8,
    betas: Tuple[float, float] = (0.9, 0.999),
) -> Tuple[Params, AdamState]:
    b1, b2 = betas
    count = state.count + 1
    t = count.astype(jnp.float32)
    bc1 = 1.0 - b1**t
    bc2 = 1.0 - b2**t
    new_p, new_mu, new_nu = dict(params), dict(state.mu), dict(state.nu)
    for k, g in grads.items():
        lr = lrs.get(k, 0.0)
        mu = b1 * state.mu[k] + (1 - b1) * g
        nu = b2 * state.nu[k] + (1 - b2) * (g * g)
        new_mu[k], new_nu[k] = mu, nu
        # lr may be a per-column vector (the packed-table mapping scan uses
        # one [128] lr row broadcast over [N, 128] tables)
        if isinstance(lr, (int, float)) and lr == 0.0:
            continue
        update = lr * (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
        new_p[k] = params[k] - update
    return new_p, AdamState(mu=new_mu, nu=new_nu, count=count)


def zero_moment_rows(state: AdamState, removed: jax.Array) -> AdamState:
    """Zero first-axis rows of every moment buffer where ``removed`` is True
    (the masked-capacity equivalent of remove_points' moment slicing,
    utils/slam_external.py:146-147)."""
    keep = (~removed).astype(jnp.float32)

    def mask_rows(x):
        if x.ndim == 0 or x.shape[0] != removed.shape[0]:
            return x
        return x * keep.reshape((-1,) + (1,) * (x.ndim - 1))

    return AdamState(
        mu={k: mask_rows(v) for k, v in state.mu.items()},
        nu={k: mask_rows(v) for k, v in state.nu.items()},
        count=state.count,
    )


def zero_moments_for_key(state: AdamState, key: str) -> AdamState:
    """Reset a whole param group's moments (update_params_and_optimizer,
    utils/slam_external.py:107-119 — used by opacity reset)."""
    mu = dict(state.mu)
    nu = dict(state.nu)
    mu[key] = jnp.zeros_like(mu[key])
    nu[key] = jnp.zeros_like(nu[key])
    return AdamState(mu=mu, nu=nu, count=state.count)
