"""ResNet-18 in Flax/NHWC (inference), torchvision-architecture-compatible.

Mirrors the torchvision ``resnet18`` graph the reference wraps
(``classifier.py:25-28``): 7x7/2 stem, 3x3/2 maxpool, 4 stages of two
BasicBlocks (64/128/256/512), global avg pool, 1000-way fc. BatchNorm runs
in eval mode (running stats folded in as constants), since the classifier
zoo is always frozen (``classifier.py:41-44``).

Weight conversion from a torchvision state_dict is in ``convert.py``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from spaa_tpu.models.layers import ConvStemTapsBwd, max_pool_taps_bwd


class EvalBatchNorm(nn.Module):
    """Inference-only BatchNorm: y = (x - mean) / sqrt(var + eps) * g + b.
    Stats are ordinary params (frozen models only)."""
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return x * inv + (bias - mean * inv)


def _conv(features, kernel, stride, pad, name):
    return nn.Conv(features, (kernel, kernel), (stride, stride),
                   padding=[(pad, pad), (pad, pad)], use_bias=False,
                   kernel_init=nn.initializers.he_normal(), name=name)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        out = _conv(self.features, 3, self.stride, 1, "conv1")(x)
        out = EvalBatchNorm(name="bn1")(out)
        out = nn.relu(out)
        out = _conv(self.features, 3, 1, 1, "conv2")(out)
        out = EvalBatchNorm(name="bn2")(out)
        if self.downsample:
            identity = _conv(self.features, 1, self.stride, 0, "down_conv")(x)
            identity = EvalBatchNorm(name="down_bn")(identity)
        return nn.relu(out + identity)


class ResNet18(nn.Module):
    num_classes: int = 1000
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    # Route the stem's backward-data pass through the tap-GEMM rewrite —
    # the XLA backward of a Cin=3 conv is MXU-lane-starved (N=3, ~4.5 TF/s
    # measured in the SPAA attack program; see layers.conv2d_taps_bwd).
    # Identical forward; same param path/init as the nn.Conv it replaces
    # (tests/test_taps_bwd.py). Default off everywhere (in-context A/Bs
    # measured the rewrites slower inside the full sweep programs; see
    # the classifiers/__init__.py make_logits_fn docstring) — opt in via
    # model_kw for A/Bs (tools/taps_ab.py).
    taps_stem: bool = False
    # Max-pool backward via the argmax-routing rewrite (see
    # layers.max_pool_taps_bwd) instead of XLA SelectAndScatter.
    taps_pool: bool = False

    input_size = (224, 224)

    @nn.compact
    def __call__(self, x):
        if self.taps_stem:
            x = ConvStemTapsBwd(64, (7, 7), (2, 2), (3, 3), name="conv1")(x)
        else:
            x = _conv(64, 7, 2, 3, "conv1")(x)
        x = EvalBatchNorm(name="bn1")(x)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        if self.taps_pool:
            x = max_pool_taps_bwd(x, (3, 3), (2, 2))
        else:
            x = nn.max_pool(x, (3, 3), (2, 2), padding="VALID")
        for i, (feats, blocks) in enumerate(
                zip((64, 128, 256, 512), self.stage_sizes)):
            for b in range(blocks):
                stride = 2 if (i > 0 and b == 0) else 1
                down = (b == 0 and (stride != 1 or i > 0))
                x = BasicBlock(feats, stride, down,
                               name=f"layer{i + 1}_{b}")(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.num_classes, name="fc")(x)
        return x
