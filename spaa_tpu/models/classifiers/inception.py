"""Inception-v3 in Flax/NHWC (inference), torchvision-architecture-compatible.

Mirrors torchvision ``inception_v3`` as instantiated by the reference with
``transform_input=True`` (``classifier.py:29-33`` — required to reproduce
the legacy pinned checkpoint's behavior). Aux head omitted (eval only).
BatchNorm eps=1e-3 per torchvision BasicConv2d; all BN run in eval mode.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from spaa_tpu.models.classifiers.resnet import EvalBatchNorm
from spaa_tpu.models.layers import ConvStemTapsBwd, max_pool_taps_bwd


class BasicConv2d(nn.Module):
    features: int
    kernel: tuple
    stride: int = 1
    padding: tuple = (0, 0)
    # Route backward-data through layers.conv2d_taps_bwd (for the Cin=3
    # stem, whose XLA backward is MXU-lane-starved in the SPAA attack).
    # Same param path ("conv/kernel") and init either way.
    taps_bwd: bool = False

    @nn.compact
    def __call__(self, x):
        ph, pw = self.padding
        if self.taps_bwd:
            x = ConvStemTapsBwd(self.features, self.kernel,
                                (self.stride, self.stride), (ph, pw),
                                name="conv")(x)
        else:
            x = nn.Conv(self.features, self.kernel,
                        (self.stride, self.stride),
                        padding=[(ph, ph), (pw, pw)], use_bias=False,
                        kernel_init=nn.initializers.he_normal(),
                        name="conv")(x)
        x = EvalBatchNorm(eps=1e-3, name="bn")(x)
        return nn.relu(x)


def _maxpool3x3s2(x, taps=False):
    # taps: backward via layers.max_pool_taps_bwd (identical forward, no
    # SelectAndScatter in the gradient)
    if taps:
        return max_pool_taps_bwd(x, (3, 3), (2, 2))
    return nn.max_pool(x, (3, 3), (2, 2), padding="VALID")


def _avgpool3x3s1p1(x):
    """torch AvgPool2d(3, stride=1, padding=1) with count_include_pad=True."""
    s = nn.avg_pool(jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))),
                    (3, 3), (1, 1), padding="VALID")
    return s


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = _avgpool3x3s1p1(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    taps_pool: bool = False

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = _maxpool3x3s2(x, self.taps_pool)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avgpool3x3s1p1(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    taps_pool: bool = False

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = _maxpool3x3s2(x, self.taps_pool)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = _avgpool3x3s1p1(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    num_classes: int = 1000
    transform_input: bool = True
    # Stem backward-data via the tap-GEMM rewrite (see
    # layers.conv2d_taps_bwd). Default off everywhere (slower in-context;
    # see the classifiers/__init__.py make_logits_fn docstring) — opt in
    # via model_kw for A/Bs.
    taps_stem: bool = False
    # Max-pool backward via the argmax-routing rewrite (see
    # layers.max_pool_taps_bwd) instead of XLA SelectAndScatter.
    taps_pool: bool = False

    input_size = (299, 299)

    @nn.compact
    def __call__(self, x):
        if self.transform_input:
            # legacy re-normalization (torchvision _transform_input):
            # undoes ImageNet normalize, applies (x*2 - 1)-style scaling
            ch0 = x[..., 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
            ch1 = x[..., 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
            ch2 = x[..., 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
            x = jnp.concatenate([ch0, ch1, ch2], axis=-1)
        x = BasicConv2d(32, (3, 3), stride=2, taps_bwd=self.taps_stem,
                        name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _maxpool3x3s2(x, self.taps_pool)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _maxpool3x3s2(x, self.taps_pool)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(taps_pool=self.taps_pool, name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(taps_pool=self.taps_pool, name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(name="Mixed_7c")(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.num_classes, name="fc")(x)
        return x
