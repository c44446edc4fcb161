"""Flax building blocks with torch Conv2d/ConvTranspose2d semantics.

The reference models (``models.py``) are built from nn.Conv2d /
nn.ConvTranspose2d with specific (kernel, stride, padding, output_padding)
combos and kaiming-normal weight init. These wrappers reproduce the exact
output shapes/semantics in NHWC so the architectures transfer weight-for-
weight, while using lax convolutions that XLA maps onto the MXU.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def kaiming_normal_torch(key, shape, dtype=jnp.float32):
    """torch ``nn.init.kaiming_normal_`` default (fan_in, leaky_relu a=0 →
    gain √2) for HWIO conv kernels. Ref ``models.py:55-58``."""
    kh, kw, cin, _ = shape
    fan_in = kh * kw * cin
    std = np.sqrt(2.0 / fan_in)
    return jax.random.normal(key, shape, dtype) * std


def normal_init(std: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std
    return init


def torch_conv_default_kernel_init(key, shape, dtype=jnp.float32):
    """torch Conv2d default: kaiming_uniform(a=√5) → U(-1/√fan_in, ...)."""
    kh, kw, cin, _ = shape
    fan_in = kh * kw * cin
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _bias_init_for(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class Conv2dTorch(nn.Module):
    """NHWC conv matching torch ``nn.Conv2d(cin, cout, k, s, p)``.

    kernel stored HWIO. ``kernel_init`` defaults to kaiming-normal (the
    reference's ``_initialize_weights``); bias uses torch's default uniform.
    """
    features: int
    kernel_size: int | Sequence[int]
    strides: int | Sequence[int] = 1
    padding: int | Sequence[int] = 0
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = kaiming_normal_torch

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.strides)
        ph, pw = _pair(self.padding)
        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (kh, kw, cin, self.features))
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x, kernel, (sh, sw), ((ph, ph), (pw, pw)), dimension_numbers=dn)
        if self.use_bias:
            bias = self.param("bias", _bias_init_for(kh * kw * cin),
                              (self.features,))
            y = y + bias
        return y


class ConvTranspose2dTorch(nn.Module):
    """NHWC transposed conv matching torch
    ``nn.ConvTranspose2d(cin, cout, k, s, p, output_padding)``.

    Implemented as a fractionally-strided conv (lhs_dilation = stride) with
    a spatially flipped kernel and per-side padding k-1-p (+output_padding
    on the bottom/right) — the exact torch output: (H-1)s - 2p + k + op.
    """
    features: int
    kernel_size: int | Sequence[int]
    strides: int | Sequence[int] = 1
    padding: int | Sequence[int] = 0
    output_padding: int | Sequence[int] = 0
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = torch_conv_default_kernel_init

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.strides)
        ph, pw = _pair(self.padding)
        oph, opw = _pair(self.output_padding)
        cin = x.shape[-1]
        # stored like a forward conv kernel HWIO with I=cin (the torch
        # (cin, cout, kh, kw) tensor transposed+flipped at convert time)
        kernel = self.param("kernel", self.kernel_init, (kh, kw, cin, self.features))
        flipped = jnp.flip(kernel, axis=(0, 1))
        dn = jax.lax.conv_dimension_numbers(x.shape, flipped.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        pad = ((kh - 1 - ph, kh - 1 - ph + oph),
               (kw - 1 - pw, kw - 1 - pw + opw))
        y = jax.lax.conv_general_dilated(
            x, flipped, (1, 1), pad, lhs_dilation=(sh, sw),
            dimension_numbers=dn)
        if self.use_bias:
            bias = self.param("bias", _bias_init_for(kh * kw * self.features),
                              (self.features,))
            y = y + bias
        return y
