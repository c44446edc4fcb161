"""PCNet: the differentiable project-and-capture simulator.

Re-design of reference ``models.py:305-345``: warp the projector input to
camera space (WarpingNet), apply the direct-light mask, then relight with
ShadingNetSPAA conditioned on (scene, rough render = warped·scene).

The mask is a fixed per-setup constant (not a parameter) and is passed to
``__call__`` — keeping the module purely functional so the whole forward
jits into one XLA program. ``simplify_cache`` bakes the sampling grid and
the surface-branch features, which removes the TPS/refine math and half the
shading encoder from the attack hot loop (ref ``simplify``,
``models.py:330-332``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from spaa_tpu.models.shading_net import ShadingNetSPAA, SurfaceFeatures
from spaa_tpu.models.warping_net import WarpingNet


class PCNetCache(NamedTuple):
    """Constants precomputed for a fixed scene (the `simplify` state)."""
    fine_grid: jax.Array                      # [1, H, W, 2]
    surface_feats: Optional[SurfaceFeatures]  # None if not cached


class PCNet(nn.Module):
    """Attributes mirror ref ``PCNet.__init__`` (``models.py:307``):
    out_size is the camera image size; use_mask/use_rough toggle the
    direct-light mask multiply and the rough-render conditioning channel."""
    out_size: Tuple[int, int] = (240, 320)
    grid_shape: Tuple[int, int] = (6, 6)
    with_refine: bool = True
    use_mask: bool = True
    use_rough: bool = True
    # micro-optimization knobs forwarded to ShadingNetSPAA (value-
    # preserving rewrites; OFF by default — in-context TPU measurement
    # shows whole-program regressions despite isolated layer wins, see
    # tools/incontext_ab.py)
    packed_encoder: bool | str = False   # True / 'enc1' / 'enc2'
    subpix_tconv: bool | None = None
    # taps_stem/taps_enc2: conv1/conv1_s (resp. conv2/conv2_s)
    # backward-data via the tap-GEMM rewrite (see ShadingNetSPAA).
    # Default off; the frozen attack forward opts in on TPU
    # (attack/orchestrate.make_pcnet_fn).
    taps_stem: bool = False
    taps_enc2: bool = False

    @property
    def model_name(self) -> str:
        name = "PCNet"
        if not self.use_mask:
            name += "_no_mask"
        if not self.use_rough:
            name += "_no_rough"
        return name

    def setup(self):
        self.warping_net = WarpingNet(out_size=self.out_size,
                                      grid_shape=self.grid_shape,
                                      with_refine=self.with_refine)
        self.shading_net = ShadingNetSPAA(use_rough=self.use_rough,
                                          packed_encoder=self.packed_encoder,
                                          subpix_tconv=self.subpix_tconv,
                                          taps_stem=self.taps_stem,
                                          taps_enc2=self.taps_enc2)

    def __call__(self, x: jax.Array, s: jax.Array,
                 mask: Optional[jax.Array] = None,
                 cache: Optional[PCNetCache] = None,
                 warped: Optional[jax.Array] = None) -> jax.Array:
        """x: projector input [N, Hp, Wp, 3]; s: camera scene [N, H, W, 3]
        or [1, H, W, 3] (a constant scene may stay unbroadcast — ShadingNet
        then runs its scene-only skipConv1 chain on one image; see
        ``ShadingNetSPAA.__call__``); mask: [H, W, 1] or [1, H, W, 1]
        direct-light mask. Ref forward ``models.py:335-345``.

        ``warped``: optionally the already-warped projector image (e.g.
        from the Pallas fixed-grid warp kernel, ``ops.pallas.warp``) —
        skips WarpingNet entirely."""
        fine_grid = cache.fine_grid if cache is not None else None
        sf = cache.surface_feats if cache is not None else None

        xw = warped if warped is not None else \
            self.warping_net(x, fine_grid=fine_grid)
        if self.use_mask and mask is not None:
            xw = xw * mask
        if self.use_rough:
            return self.shading_net(xw, s, xw * s, surface_feats=sf)
        return self.shading_net(xw, s, surface_feats=sf)

    def simplify_cache(self, s: jax.Array,
                       mask: Optional[jax.Array] = None) -> PCNetCache:
        """Bake grid + surface features for scene ``s`` [1, H, W, 3].
        Ref ``simplify`` (``models.py:330-332``) — note the reference feeds
        the *warped scene* to the shading net's simplify; here the scene is
        already in camera space so the surface features use s (and the
        rough render which depends on the warped input x cannot be cached —
        it stays in the hot path, exactly as in the reference where only
        conv*_s activations are cached).
        """
        del mask
        fine_grid = self.warping_net.simplify()
        sf = None
        if not self.use_rough:
            # only the 3-channel surface branch can be cached without x
            sf = self.shading_net.surface_features(s)
        return PCNetCache(fine_grid, sf)
