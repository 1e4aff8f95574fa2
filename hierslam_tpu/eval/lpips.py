"""LPIPS (AlexNet) in pure JAX, fed from a local weights file.

The reference computes LPIPS with a torchmetrics AlexNet metric
(utils/eval_helpers.py:25-26).  Zero-egress environments cannot download
the pretrained weights, so this module implements the exact LPIPS-alex
forward from a local ``.npz``:

* AlexNet feature stack (torchvision layout): conv1 11x11/4 p2 -> relu ->
  maxpool 3/2 -> conv2 5x5 p2 -> relu -> maxpool 3/2 -> conv3 3x3 p1 ->
  relu -> conv4 3x3 p1 -> relu -> conv5 3x3 p1 -> relu; LPIPS taps the
  five relu outputs (before the pools);
* the LPIPS input scaling layer (shift/scale per RGB channel applied to
  [-1, 1] inputs) and channel-unit-normalized squared feature differences
  weighted by the five learned 1x1 "lin" layers, spatially averaged and
  summed over layers.

Expected ``.npz`` keys (export with ``tools/export_lpips_weights.py`` on
any machine with the ``lpips`` pip package):

    conv{i}_w [out,in,kh,kw], conv{i}_b [out]   for i in 1..5
    lin{i}_w  [C_i]                             for i in 1..5

Pass the file via config key ``lpips_weights`` or the ``LPIPS_WEIGHTS``
environment variable.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# (kernel, stride, pad, pool_after) per conv layer — torchvision AlexNet.
ALEX_LAYERS = (
    (11, 4, 2, True),
    (5, 1, 2, True),
    (3, 1, 1, False),
    (3, 1, 1, False),
    (3, 1, 1, False),
)
# LPIPS ScalingLayer constants (lpips/lpips.py).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x: jax.Array, w: jax.Array, b: jax.Array, stride: int, pad: int) -> jax.Array:
    out = jax.lax.conv_general_dilated(
        x[None], w, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0]
    return out + b[:, None, None]


def _maxpool3s2(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 2, 2), "VALID"
    )


def _unit_normalize(f: jax.Array, eps: float = 1e-10) -> jax.Array:
    """lpips.normalize_tensor: x / (||x||_channel + eps)."""
    n = jnp.sqrt(jnp.sum(f * f, axis=0, keepdims=True))
    return f / (n + eps)


def alexnet_features(params: Dict[str, jax.Array], x: jax.Array):
    """Relu-tap features of AlexNet for x [3,H,W] already scaled to the
    LPIPS input distribution."""
    feats = []
    h = x
    for i, (_, stride, pad, pool) in enumerate(ALEX_LAYERS, start=1):
        h = _conv(h, params[f"conv{i}_w"], params[f"conv{i}_b"], stride, pad)
        h = jax.nn.relu(h)
        feats.append(h)
        if pool:
            h = _maxpool3s2(h)
    return feats


@partial(jax.jit, static_argnums=())
def lpips_distance(params: Dict[str, jax.Array], img: jax.Array, gt: jax.Array) -> jax.Array:
    """LPIPS-alex distance of two [3,H,W] images in [0, 1]."""
    shift = jnp.asarray(_SHIFT)[:, None, None]
    scale = jnp.asarray(_SCALE)[:, None, None]

    def prep(x):
        return (2.0 * jnp.clip(x, 0.0, 1.0) - 1.0 - shift) / scale

    fa = alexnet_features(params, prep(img))
    fb = alexnet_features(params, prep(gt))
    total = jnp.zeros(())
    for i, (a, b) in enumerate(zip(fa, fb), start=1):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2   # [C, H, W]
        w = params[f"lin{i}_w"].reshape(-1, 1, 1)
        total = total + jnp.mean(jnp.sum(d * w, axis=0))
    return total


def load_lpips_params(path: str) -> Dict[str, jax.Array]:
    data = np.load(path)
    params = {}
    for i in range(1, 6):
        params[f"conv{i}_w"] = jnp.asarray(data[f"conv{i}_w"], jnp.float32)
        params[f"conv{i}_b"] = jnp.asarray(data[f"conv{i}_b"], jnp.float32)
        params[f"lin{i}_w"] = jnp.asarray(data[f"lin{i}_w"], jnp.float32).reshape(-1)
    return params


def default_weights_path() -> str:
    return os.environ.get(
        "LPIPS_WEIGHTS",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "weights", "lpips_alex.npz"),
    )


def lpips_fn(weights_path: Optional[str] = None):
    """Build an ``f(img, gt) -> float`` LPIPS callable, or None.

    Resolution order: explicit ``weights_path`` -> $LPIPS_WEIGHTS ->
    <repo>/weights/lpips_alex.npz -> torchmetrics (if it has cached
    weights) -> None (with the expected path printed once).
    """
    path = weights_path or default_weights_path()
    if path and os.path.isfile(path):
        params = load_lpips_params(path)

        def compute(img, gt):
            return float(lpips_distance(params, jnp.asarray(img), jnp.asarray(gt)))

        return compute
    try:  # cached torchmetrics weights, if the package happens to exist
        import torch
        from torchmetrics.image.lpip import LearnedPerceptualImagePatchSimilarity

        metric = LearnedPerceptualImagePatchSimilarity(net_type="alex", normalize=True)

        def compute(img, gt):
            a = torch.tensor(np.asarray(img))[None]
            b = torch.tensor(np.asarray(gt))[None]
            return float(metric(a.clamp(0, 1), b.clamp(0, 1)))

        return compute
    except Exception:
        print(
            f"LPIPS disabled: no weights at {path!r} and no torchmetrics "
            "cache. Export lpips_alex.npz with tools/export_lpips_weights.py "
            "and set LPIPS_WEIGHTS or config['lpips_weights']."
        )
        return None
