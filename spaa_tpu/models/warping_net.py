"""WarpingNet: learnable affine ∘ TPS ∘ CNN-refined sampling grid.

TPU-first re-design of reference ``models.py:98-185``:
  - learnable params: 2x3 affine (``affine_mat``), reduced-form TPS theta
    over a 6x6 control grid, and a small grid-refinement CNN,
  - the sampling grid is built once per forward for the whole batch
    (batch-independent, ref ``models.py:172`` repeats it), then applied via
    the differentiable ``ops.grid_sample``;
  - ``simplify`` = functionally compute the final grid once and reuse it as
    a constant (ref ``models.py:149-161``), which removes all grid math
    from the attack hot loop.

Layout: NHWC images, [N, H, W, 2] grids with (x, y) in [-1, 1].
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from spaa_tpu.models.layers import (Conv2dTorch, ConvTranspose2dTorch,
                                    normal_init)
from spaa_tpu.ops.image import affine_grid, grid_sample
from spaa_tpu.ops.tps import tps_grid, uniform_grid


class GridRefineNet(nn.Module):
    """CNN refinement of the 2-channel grid image (ref ``models.py:130-140``).
    Conv weights init N(0, 1e-4), transposed convs keep torch defaults."""

    @nn.compact
    def __call__(self, g):
        x = nn.relu(Conv2dTorch(32, 3, 2, 1, kernel_init=normal_init(1e-4),
                                name="conv1")(g))
        x = nn.relu(Conv2dTorch(64, 3, 2, 1, kernel_init=normal_init(1e-4),
                                name="conv2")(x))
        x = nn.relu(ConvTranspose2dTorch(32, 2, 2, 0, name="tconv1")(x))
        x = nn.leaky_relu(ConvTranspose2dTorch(2, 2, 2, 0, name="tconv2")(x),
                          negative_slope=0.1)
        return x


class WarpingNet(nn.Module):
    """Geometric projector→camera warp.

    Attributes:
      out_size: (H, W) of the warped (camera-space) output.
      grid_shape: TPS control grid (default 6x6, ref ``models.py:99``).
      with_refine: include the grid refinement CNN (ref ``models.py:103``).
    """
    out_size: Tuple[int, int] = (256, 256)
    grid_shape: Tuple[int, int] = (6, 6)
    with_refine: bool = True

    @property
    def model_name(self) -> str:
        return "WarpingNet" if self.with_refine else "WarpingNet_without_refine"

    def setup(self):
        nctrl = self.grid_shape[0] * self.grid_shape[1]
        nparam = nctrl + 2  # reduced-form theta (ref models.py:117-121)
        self.affine_mat = self.param(
            "affine_mat",
            lambda key: jnp.array([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]]))
        self.theta = self.param(
            "theta", lambda key: jnp.full((1, nparam, 2), 1e-3))
        if self.with_refine:
            self.grid_refine_net = GridRefineNet()

    def _ctrl_pts(self):
        return uniform_grid(self.grid_shape).reshape(-1, 2)

    def fine_grid(self) -> jax.Array:
        """Compute the final [1, H, W, 2] sampling grid (the expensive part;
        batch-independent). Mirrors ref ``models.py:149-161,166-178``."""
        h, w = self.out_size
        # coarse affine grid as a 2-channel image, sampled at TPS locations
        coarse_affine = affine_grid(self.affine_mat, (h, w))      # [1,H,W,2]
        coarse_tps = tps_grid(self.theta, self._ctrl_pts(), (1, h, w))
        grid = grid_sample(coarse_affine, coarse_tps)             # [1,H,W,2]
        if self.with_refine:
            grid = grid + self.grid_refine_net(grid)
        return jnp.clip(grid, -1.0, 1.0)

    def __call__(self, x: jax.Array,
                 fine_grid: Optional[jax.Array] = None) -> jax.Array:
        """Warp NHWC ``x`` to camera space. Pass a precomputed ``fine_grid``
        (from :meth:`simplify`) to skip the grid math (inference fast path,
        ref ``models.py:179-181``)."""
        if fine_grid is None:
            fine_grid = self.fine_grid()
        # keep the grid [1, H, W, 2]: grid_sample's batch-shared fast path
        # gathers once for the whole batch (one flat index vector)
        return grid_sample(x, fine_grid)

    def simplify(self) -> jax.Array:
        """Return the baked sampling grid (ref ``models.py:149-161``)."""
        return self.fine_grid()


def affine_from_corners(mask_corners, inverse: bool = False) -> jnp.ndarray:
    """Initial affine from the direct-light mask bbox corners.

    Replaces the reference's ``cv.getAffineTransform(dst, src)`` call
    (``train_network.py:543-546``): solves the 2x3 affine mapping the first
    three bbox corners (in [-1,1] grid coords) to the canonical corners
    [(-1,-1), (1,-1), (1,1)] — grid_sample is an inverse warp, so src/dst
    are swapped exactly as in the reference. This is the correct init for
    PCNet's WarpingNet (camera-sized output sampling the projector image).

    ``inverse=True`` returns the opposite map (canonical → mask corners):
    the correct init for CompenNet++'s WarpingNet, whose projector-sized
    output samples the CAMERA image (each projector pixel reads the camera
    location it lands on). The reference initializes both models with the
    same forward matrix (``train_network.py:655-663`` is a copy of the
    PCNet block); with that init most of the CompenNet++ sampling grid
    falls outside the camera frame, the grid gradient dies in the
    zero-padding region, and compensation converges to predicting the
    batch mean — a silent quality failure reproduced in our simulator.
    See PARITY.md "Known deviations".
    """
    import numpy as np
    dst = np.asarray(mask_corners[0:3], np.float64)           # in cam coords
    src = np.array([[-1, -1], [1, -1], [1, 1]], np.float64)   # canonical
    if inverse:
        dst, src = src, dst
    # solve A @ [x, y, 1]^T = src for each of the 3 correspondences
    m = np.concatenate([dst, np.ones((3, 1))], axis=1)        # [3,3]
    aff = np.linalg.solve(m, src).T                           # [2,3]
    return jnp.asarray(aff[None], jnp.float32)                # [1,2,3]
