"""CompenNet (photometric compensation) and CompenNet++ (warp ∘ compensate).

Re-design of reference ``models.py:11-94`` (CompenNet) and
``models.py:188-212`` (CompenNet++) in Flax/NHWC. CompenNet is the inverse
problem of ShadingNet: given the desired camera image and the surface image
it infers the projector input. Same two-branch encoder-decoder skeleton;
differences vs ShadingNetSPAA (kept faithfully):
  - surface branch input is 3 channels (no rough render),
  - transConv1 has kernel 2, stride 2 (no output_padding),
  - skipConv1's first conv is 3x3 (ShadingNet uses 1x1),
  - skipConv3 is a 1x1 conv (ShadingNet uses 3x3),
  - backbone skip res1 is computed from x itself (ShadingNet: from s).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from spaa_tpu.models.layers import (Conv2dTorch, Conv2dTorchE,
                                    ConvTranspose2dTorch,
                                    packed_encoder_forward, packed_which)
from spaa_tpu.models.warping_net import WarpingNet


class SurfaceFeatures(NamedTuple):
    res1: jax.Array
    res2: jax.Array
    res3: jax.Array
    res4: jax.Array


class CompenNet(nn.Module):
    # Same packed two-branch encoder knob as ShadingNetSPAA (the skeleton
    # is shared) — OFF by default for the same in-context reason (see
    # ShadingNetSPAA.packed_encoder / tools/incontext_ab.py).
    packed_encoder: bool | str = False
    # Subpixel form of transConv1/2 (both k2s2 here); off by default
    subpix_tconv: bool | None = None

    @property
    def model_name(self) -> str:
        return "CompenNet"

    def setup(self):
        self.conv1 = Conv2dTorchE(32, 3, 3, 2, 1, name="conv1")
        self.conv2 = Conv2dTorchE(64, 32, 3, 2, 1, name="conv2")
        self.conv3 = Conv2dTorch(128, 3, 1, 1, name="conv3")
        self.conv4 = Conv2dTorch(256, 3, 1, 1, name="conv4")
        self.conv5 = Conv2dTorch(128, 3, 1, 1, name="conv5")

        self.conv1_s = Conv2dTorchE(32, 3, 3, 2, 1, name="conv1_s")
        self.conv2_s = Conv2dTorchE(64, 32, 3, 2, 1, name="conv2_s")
        self.conv3_s = Conv2dTorch(128, 3, 1, 1, name="conv3_s")
        self.conv4_s = Conv2dTorch(256, 3, 1, 1, name="conv4_s")

        self.trans_conv1 = ConvTranspose2dTorch(64, 2, 2, 0, name="transConv1",
                                                subpix=self.subpix_tconv)
        self.trans_conv2 = ConvTranspose2dTorch(32, 2, 2, 0, name="transConv2",
                                                subpix=self.subpix_tconv)
        self.conv6 = Conv2dTorch(3, 3, 1, 1, name="conv6")

        self.skip1a = Conv2dTorch(3, 3, 1, 1, name="skipConv1_0")
        self.skip1b = Conv2dTorch(3, 3, 1, 1, name="skipConv1_2")
        self.skip1c = Conv2dTorch(3, 3, 1, 1, name="skipConv1_4")
        self.skip2 = Conv2dTorch(64, 1, 1, 0, name="skipConv2")
        self.skip3 = Conv2dTorch(128, 1, 1, 0, name="skipConv3")

    def surface_features(self, s: jax.Array) -> SurfaceFeatures:
        """Surface-branch encode; ref ``simplify`` (``models.py:62-71``)."""
        r1 = nn.relu(self.conv1_s(s))
        r2 = nn.relu(self.conv2_s(r1))
        r3 = nn.relu(self.conv3_s(r2))
        r4 = nn.relu(self.conv4_s(r3))
        return SurfaceFeatures(r1, r2, r3, r4)

    def __call__(self, x: jax.Array, s: jax.Array,
                 surface_feats: Optional[SurfaceFeatures] = None) -> jax.Array:
        """x: desired camera image; s: surface image (both NHWC).
        Ref forward ``models.py:74-94``."""
        res1 = nn.relu(self.skip1a(x))
        res1 = nn.relu(self.skip1b(res1))
        res1 = nn.relu(self.skip1c(res1))

        if surface_feats is None and self.packed_encoder:
            # Both branches run: block-diagonal packed encoder (see
            # layers.packed_encoder_forward / pack_block_diag).
            # Compensation with a cached surface passes surface_feats and
            # skips this path.
            h, res2, res3 = packed_encoder_forward(
                self, x, s, which=packed_which(self.packed_encoder))
        else:
            sf = (self.surface_features(s)
                  if surface_feats is None else surface_feats)
            h = nn.relu(self.conv1(x) + sf.res1)
            res2 = self.skip2(h)
            h = nn.relu(self.conv2(h) + sf.res2)
            res3 = self.skip3(h)
            h = nn.relu(self.conv3(h) + sf.res3)
            h = nn.relu(self.conv4(h) + sf.res4)
        h = nn.relu(self.conv5(h) + res3)
        h = nn.relu(self.trans_conv1(h) + res2)
        h = nn.relu(self.trans_conv2(h))
        h = jnp.minimum(nn.relu(self.conv6(h) + res1), 1.0)
        return h


class CompenNetPlusplus(nn.Module):
    """WarpingNet ∘ CompenNet: warps both the desired camera image and the
    surface into projector space, then compensates. Ref ``models.py:188-212``.

    out_size: projector image size (the warp target for compensation).
    """
    out_size: tuple = (256, 256)
    with_refine: bool = True

    @property
    def model_name(self) -> str:
        return "CompenNet++"

    def setup(self):
        self.warping_net = WarpingNet(out_size=self.out_size,
                                      with_refine=self.with_refine)
        self.compen_net = CompenNet()

    def __call__(self, x: jax.Array, s: jax.Array,
                 fine_grid: Optional[jax.Array] = None,
                 surface_feats: Optional[SurfaceFeatures] = None) -> jax.Array:
        """Ref forward ``models.py:204-212`` (warps x and s, compensates)."""
        xw = self.warping_net(x, fine_grid=fine_grid)
        if surface_feats is None:
            sw = self.warping_net(s, fine_grid=fine_grid)
            return self.compen_net(xw, sw)
        return self.compen_net(xw, s, surface_feats=surface_feats)

    def simplify(self, s: jax.Array):
        """Precompute (fine_grid, surface_feats) for a fixed scene s.
        Ref ``models.py:199-201``."""
        fine_grid = self.warping_net.simplify()
        sw = self.warping_net(s, fine_grid=fine_grid)
        return fine_grid, self.compen_net.surface_features(sw)
