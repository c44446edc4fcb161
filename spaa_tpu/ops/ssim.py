"""Gaussian-window SSIM (MATLAB-consistent), NHWC.

Re-derivation of the SSIM used as training loss and metric by the reference
(``pytorch_ssim/__init__.py:9-107``): 11x11 Gaussian window, sigma 1.5,
**replicate padding** (ref line 26-28), per-channel depthwise filtering,
C1=0.01^2, C2=0.03^2.

TPU design: the 2-D Gaussian is separable, so instead of one dense 11x11
depthwise conv we run two 1-D depthwise convs (11x + x11) — fewer FLOPs and
XLA fuses the elementwise SSIM map computation behind them.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _gaussian_1d(window_size: int, sigma: float) -> np.ndarray:
    g = np.array([
        math.exp(-((x - window_size // 2) ** 2) / (2.0 * sigma ** 2))
        for x in range(window_size)
    ], np.float32)
    return g / g.sum()


def _depthwise_blur(x: jax.Array, window_size: int, sigma: float) -> jax.Array:
    """Separable depthwise Gaussian filtering of a *pre-padded* NHWC image,
    'VALID' so output spatial dims shrink by window_size-1."""
    c = x.shape[-1]
    g = jnp.asarray(_gaussian_1d(window_size, sigma))
    # kernel layout HWIO with feature_group_count=C (depthwise)
    kh = jnp.tile(g.reshape(window_size, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(g.reshape(1, window_size, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=c,
                                     precision=jax.lax.Precision.HIGHEST)
    dn = jax.lax.conv_dimension_numbers(x.shape, kw.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=c,
                                     precision=jax.lax.Precision.HIGHEST)
    return x


def ssim_map(img1: jax.Array, img2: jax.Array, window_size: int = 11,
             sigma: float = 1.5) -> jax.Array:
    """Per-pixel SSIM map [N, H, W, C] with replicate padding
    (matches ref ``pytorch_ssim/__init__.py:24-51``)."""
    pad = window_size // 2
    pads = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    p1 = jnp.pad(img1, pads, mode="edge")
    p2 = jnp.pad(img2, pads, mode="edge")

    mu1 = _depthwise_blur(p1, window_size, sigma)
    mu2 = _depthwise_blur(p2, window_size, sigma)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2

    sigma1_sq = _depthwise_blur(p1 * p1, window_size, sigma) - mu1_sq
    sigma2_sq = _depthwise_blur(p2 * p2, window_size, sigma) - mu2_sq
    sigma12 = _depthwise_blur(p1 * p2, window_size, sigma) - mu1_mu2

    c1 = 0.01 ** 2
    c2 = 0.03 ** 2
    return ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))


def ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11,
         size_average: bool = True, mask: jax.Array | None = None,
         weights: jax.Array | None = None) -> jax.Array:
    """Scalar (or per-sample) SSIM. Mirrors ref ``pytorch_ssim`` semantics:
    - size_average: mean over everything; else mean per sample [N]
    - mask/weights: optional pixel weighting (ref lines 54-67)."""
    m = ssim_map(img1, img2, window_size)
    if weights is not None:
        m = m * weights
    if size_average:
        if mask is not None:
            return jnp.sum(m * mask) / jnp.maximum(jnp.sum(mask * jnp.ones_like(m)), 1e-8)
        return jnp.mean(m)
    if mask is not None:
        m = m * mask
    return jnp.mean(m, axis=(1, 2, 3))
