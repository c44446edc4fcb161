"""Core image primitives, TPU-first.

Layout convention: images are **NHWC float32 in [0, 1]** everywhere inside
the framework (TPU/XLA native), unlike the reference's NCHW torch tensors.

Reference behaviors reproduced (parity targets, see tests/test_image_ops.py):
  - ``center_crop``   ~ reference ``img_proc.py:126-132``
  - ``resize_area``   ~ torch ``F.interpolate(mode='area')`` used in
                        ``img_proc.py:117-123`` (classifier pre-resize);
                        implemented as two matmuls (MXU-friendly) instead of
                        pooling loops.
  - ``grid_sample``   ~ torch ``F.grid_sample(align_corners=True,
                        mode='bilinear', padding_mode='zeros')`` used by
                        WarpingNet (``models.py:155,172,184``). jax.numpy has
                        no grid_sample; this is a differentiable gather-based
                        implementation (grads flow to both image and grid).
  - ``affine_grid``   ~ torch ``F.affine_grid(align_corners=True)``
                        (``models.py:151,168``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def expand_4d(x: jax.Array) -> jax.Array:
    """Expand a 2D (HW) / 3D (HWC) array to 4D NHWC. Ref ``img_proc.py:110-114``."""
    if x.ndim == 2:
        x = x[..., None]
    if x.ndim == 3:
        x = x[None]
    return x


def center_crop(x: jax.Array, size) -> jax.Array:
    """Center-crop the spatial dims of an NHWC (or HWC/HW) array to
    ``size=(th, tw)``. Ref ``img_proc.py:126-132`` (same round-half rule)."""
    th, tw = int(size[0]), int(size[1])
    h, w = x.shape[-3], x.shape[-2]
    if x.ndim == 2:  # HW
        h, w = x.shape
        i = int(round((h - th) / 2.0))
        j = int(round((w - tw) / 2.0))
        return x[i:i + th, j:j + tw]
    i = int(round((h - th) / 2.0))
    j = int(round((w - tw) / 2.0))
    return x[..., i:i + th, j:j + tw, :]


@functools.lru_cache(maxsize=64)
def _area_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Averaging matrix A[out, in] for 1-D adaptive average pooling
    (= torch 'area' interpolation). Window for output i is
    [floor(i*H/Ho), ceil((i+1)*H/Ho))."""
    a = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        start = int(np.floor(i * in_size / out_size))
        end = int(np.ceil((i + 1) * in_size / out_size))
        a[i, start:end] = 1.0 / (end - start)
    return a


def resize_area(x: jax.Array, size) -> jax.Array:
    """'Area' resize of NHWC/HWC/HW arrays to ``size=(h, w)``.

    Equivalent to torch ``F.interpolate(mode='area')`` (adaptive avg pool),
    expressed as two dense matmuls so it runs on the MXU instead of as a
    gather/pool loop: ``out = A_h @ x @ A_w^T`` applied per channel.
    """
    th, tw = int(size[0]), int(size[1])
    squeeze_to = x.ndim
    x = expand_4d(x)
    n, h, w, c = x.shape
    if (h, w) != (th, tw):
        ah = jnp.asarray(_area_matrix(h, th))   # [th, h]
        aw = jnp.asarray(_area_matrix(w, tw))   # [tw, w]
        # contract H: [N,H,W,C] x [th,H] -> [N,th,W,C]
        x = jnp.einsum("nhwc,th->ntwc", x, ah,
                       precision=jax.lax.Precision.HIGHEST)
        # contract W: [N,th,W,C] x [tw,W] -> [N,th,tw,C]
        x = jnp.einsum("nhwc,tw->nhtc", x, aw,
                       precision=jax.lax.Precision.HIGHEST)
    if squeeze_to == 3:
        return x[0]
    if squeeze_to == 2:
        return x[0, ..., 0]
    return x


def affine_grid(theta: jax.Array, size) -> jax.Array:
    """Affine sampling grid, torch ``F.affine_grid(align_corners=True)``.

    theta: [N, 2, 3]; size: (H, W). Returns [N, H, W, 2] grid of (x, y) in
    [-1, 1] where out(h, w) samples input at theta @ [x_w, y_h, 1].
    """
    h, w = int(size[0]), int(size[1])
    xs = jnp.linspace(-1.0, 1.0, w)
    ys = jnp.linspace(-1.0, 1.0, h)
    gx, gy = jnp.meshgrid(xs, ys)                       # [H, W]
    ones = jnp.ones_like(gx)
    base = jnp.stack([gx, gy, ones], axis=-1)           # [H, W, 3]
    # [N,2,3] @ [H,W,3] -> [N,H,W,2]
    return jnp.einsum("nij,hwj->nhwi", theta, base,
                      precision=jax.lax.Precision.HIGHEST)


def grid_sample(im: jax.Array, grid: jax.Array) -> jax.Array:
    """Bilinear sampling with align_corners=True and zeros padding.

    im:   [N, H, W, C]
    grid: [N, Ho, Wo, 2] with (x, y) normalized coords in [-1, 1]
    Returns [N, Ho, Wo, C].

    Matches torch ``F.grid_sample(align_corners=True, mode='bilinear',
    padding_mode='zeros')`` (WarpingNet, ref ``models.py:155,172,184``):
    out-of-range corner taps contribute zero, bilinear weights are kept, and
    gradients flow to ``im`` (scatter in transpose) and to ``grid`` (through
    the bilinear weights).

    TPU formulation: the 2-D advanced-indexing gather lowers badly on TPU
    (and its autodiff transpose worse). Instead each tap is a flat 1-D
    ``take``: when the grid is batch-shared (grid.shape[0]==1, the
    WarpingNet case — the sampling grid never varies across the batch) the
    image is viewed as [H*W, N*C] and gathered along axis 0 with ONE shared
    index vector; otherwise per-batch flat indices gather [N, H*W, C] along
    axis 1. For a fully static grid the Pallas kernel in
    ``ops.pallas.warp`` is faster still.
    """
    n, h, w, c = im.shape
    ho, wo = grid.shape[1], grid.shape[2]
    x = (grid[..., 0] + 1.0) * 0.5 * (w - 1)            # [G,Ho,Wo], G∈{1,N}
    y = (grid[..., 1] + 1.0) * 0.5 * (h - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wx0 = 1.0 - wx1
    wy1 = y - y0
    wy0 = 1.0 - wy1

    shared = grid.shape[0] == 1
    if shared:
        im_t = im.reshape(n, h * w, c).transpose(1, 0, 2).reshape(h * w, n * c)

    def tap(ix, iy, wxx, wyy):
        valid = ((ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1))
        ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        flat = (iyc * w + ixc).reshape(ix.shape[0], -1)   # [G, Ho*Wo]
        wgt = (wxx * wyy * valid.astype(im.dtype))        # [G, Ho, Wo]
        if shared:
            vals = jnp.take(im_t, flat[0], axis=0)        # [Ho*Wo, N*C]
            vals = vals.reshape(ho * wo, n, c).transpose(1, 0, 2)
            vals = vals.reshape(n, ho, wo, c)
        else:
            vals = jnp.take_along_axis(
                im.reshape(n, h * w, c), flat[:, :, None], axis=1)
            vals = vals.reshape(n, ho, wo, c)
        return vals * wgt[..., None]

    out = (tap(x0, y0, wx0, wy0) + tap(x1, y0, wx1, wy0)
           + tap(x0, y1, wx0, wy1) + tap(x1, y1, wx1, wy1))
    # keep the image dtype: f32 grid weights must not promote a bf16 image
    return out.astype(im.dtype)
