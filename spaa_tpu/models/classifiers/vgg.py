"""VGG-16 in Flax/NHWC (inference), torchvision-architecture-compatible.

Mirrors torchvision ``vgg16`` (the 'D' config, no BN) wrapped by the
reference (``classifier.py:21-24``): 13 3x3 convs with 5 maxpools, then
fc 25088→4096→4096→1000. Dropout is inference-off. The first fc expects
torch's CHW flatten order; ``__call__`` flattens NHWC→NCHW-order so
converted torchvision weights drop in unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from spaa_tpu.models.layers import ConvStemTapsBwd, max_pool_taps_bwd

# 'D' config: ints are conv output channels, 'M' is 2x2 maxpool
_CFG_D = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
          512, 512, 512, "M", 512, 512, 512, "M"]


class VGG16(nn.Module):
    num_classes: int = 1000
    # Stem (conv0, Cin=3) backward-data via the tap-GEMM rewrite (see
    # layers.conv2d_taps_bwd). Default off everywhere (slower in-context;
    # see the classifiers/__init__.py make_logits_fn docstring) — opt in
    # via model_kw for A/Bs.
    taps_stem: bool = False
    # Max-pool backward via the argmax-routing rewrite (see
    # layers.max_pool_taps_bwd; bitwise for these non-overlapping 2x2/s2
    # pools) instead of XLA SelectAndScatter.
    taps_pool: bool = False

    input_size = (224, 224)

    @nn.compact
    def __call__(self, x):
        conv_i = 0
        for v in _CFG_D:
            if v == "M":
                x = (max_pool_taps_bwd(x, (2, 2), (2, 2))
                     if self.taps_pool else nn.max_pool(x, (2, 2), (2, 2)))
            else:
                if conv_i == 0 and self.taps_stem:
                    x = ConvStemTapsBwd(v, (3, 3), (1, 1), (1, 1),
                                        use_bias=True, name="conv0")(x)
                else:
                    x = nn.Conv(v, (3, 3), padding=[(1, 1), (1, 1)],
                                kernel_init=nn.initializers.he_normal(),
                                name=f"conv{conv_i}")(x)
                x = nn.relu(x)
                conv_i += 1
        # torch flattens NCHW: [N, C, H, W] -> [N, C*H*W]
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(4096, name="fc1")(x))
        x = nn.relu(nn.Dense(4096, name="fc2")(x))
        x = nn.Dense(self.num_classes, name="fc3")(x)
        return x
