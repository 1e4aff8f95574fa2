"""SSIM with an 11x11 sigma=1.5 Gaussian window (utils/slam_external.py:54-97).

Depthwise convolution via lax.conv_general_dilated with
feature_group_count=C, zero ('SAME') padding — identical to the torch
conv2d(groups=channel, padding=window//2) the reference uses.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _window(window_size: int, sigma: float) -> np.ndarray:
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2) / (2 * sigma**2))
    g = g / g.sum()
    w2d = np.outer(g, g)
    return w2d.astype(np.float32)


def _filter(img: jax.Array, win: jax.Array) -> jax.Array:
    """Depthwise 2D Gaussian filter.  img: [C, H, W].

    The 2D window is an outer product of the 1D Gaussian, so the filter is
    applied SEPARABLY (two 1D depthwise convs, 2k taps instead of k^2) —
    identical math to the reference's dense conv2d up to fp summation
    order."""
    c = img.shape[0]
    k = win.shape[0]
    g1 = jnp.sum(win, axis=1)  # the 1D kernel (win = outer(g, g), sum=g)
    lhs = img[None]
    rv = jnp.broadcast_to(g1[None, None, :, None], (c, 1, k, 1))
    rh = jnp.broadcast_to(g1[None, None, None, :], (c, 1, 1, k))
    # precision=HIGHEST is load-bearing: TPU XLA lowers f32 convs to
    # single-pass bf16 on the MXU by default, and the SSIM variance
    # E[x^2] - mu^2 then cancels at bf16 precision — variances come out
    # negative by ~3e-3, the (sigma1+sigma2+C2) denominator flips sign, and
    # SSIM explodes to +-1e6 (observed as mapping-gradient spikes -> NaN on
    # the first real-scale run; CPU tests never see it, f32 convs there).
    out = jax.lax.conv_general_dilated(
        lhs, rv, (1, 1), [(k // 2, k // 2), (0, 0)], feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    out = jax.lax.conv_general_dilated(
        out, rh, (1, 1), [(0, 0), (k // 2, k // 2)], feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[0]


def ssim_ref_stats(img2: jax.Array, window_size: int = 11):
    """(mu2, sigma2_sq) of a reference image — constant across an
    optimization phase, precompute once and pass to :func:`calc_ssim`."""
    win = jnp.asarray(_window(window_size, 1.5))
    mu2 = _filter(img2, win)
    sigma2_sq = _filter(img2 * img2, win) - mu2 * mu2
    return mu2, sigma2_sq


def calc_ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11,
              ref_stats=None) -> jax.Array:
    """Mean SSIM between two [C, H, W] images.

    ``ref_stats``: optional precomputed :func:`ssim_ref_stats` of ``img2``
    (the GT side is iteration-invariant during mapping — skipping its two
    filters per iteration).
    """
    win = jnp.asarray(_window(window_size, 1.5))
    mu1 = _filter(img1, win)
    if ref_stats is None:
        mu2 = _filter(img2, win)
        sigma2_sq = _filter(img2 * img2, win) - mu2 * mu2
    else:
        mu2, sigma2_sq = ref_stats
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter(img1 * img1, win) - mu1_sq
    sigma12 = _filter(img1 * img2, win) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)


def calc_psnr(img1: jax.Array, img2: jax.Array) -> jax.Array:
    """Per-image PSNR (utils/slam_external.py:49-51), scalar for [C,H,W]."""
    mse = jnp.mean((img1 - img2) ** 2)
    return 20 * jnp.log10(1.0 / jnp.sqrt(mse))
