"""Golden-value tests for L0 image primitives vs torch (CPU).

torch.nn.functional is the oracle for grid_sample / affine_grid /
interpolate(mode='area') semantics the reference relies on.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from spaa_tpu.ops import (affine_grid, center_crop, expand_4d, grid_sample,
                          resize_area)


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def test_expand_4d():
    assert expand_4d(jnp.zeros((5, 7))).shape == (1, 5, 7, 1)
    assert expand_4d(jnp.zeros((5, 7, 3))).shape == (1, 5, 7, 3)
    assert expand_4d(jnp.zeros((2, 5, 7, 3))).shape == (2, 5, 7, 3)


def test_center_crop_matches_torch_rounding(rng):
    x = rng.random((2, 11, 13, 3), np.float32)
    out = center_crop(jnp.asarray(x), (6, 7))
    # reference rounding: i = round((h-th)/2)
    i = int(round((11 - 6) / 2.0))
    j = int(round((13 - 7) / 2.0))
    np.testing.assert_allclose(np.asarray(out), x[:, i:i + 6, j:j + 7, :])


@pytest.mark.parametrize("in_sz,out_sz", [((12, 16), (6, 8)),
                                          ((10, 11), (7, 5)),
                                          ((8, 8), (8, 8)),
                                          ((240, 240), (224, 224)),
                                          ((240, 240), (299, 299))])
def test_resize_area_matches_torch(rng, in_sz, out_sz):
    x = rng.random((2, *in_sz, 3), np.float32)
    ours = np.asarray(resize_area(jnp.asarray(x), out_sz))
    ref = F.interpolate(_nchw(x), out_sz, mode="area").numpy()
    np.testing.assert_allclose(ours, np.transpose(ref, (0, 2, 3, 1)),
                               rtol=1e-5, atol=1e-5)


def test_affine_grid_matches_torch(rng):
    theta = rng.random((2, 2, 3)).astype(np.float32)
    ours = np.asarray(affine_grid(jnp.asarray(theta), (5, 7)))
    ref = F.affine_grid(torch.from_numpy(theta), [2, 3, 5, 7],
                        align_corners=True).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("scale", [0.8, 1.0, 1.7])
def test_grid_sample_matches_torch(rng, scale):
    x = rng.random((2, 9, 12, 3), np.float32)
    # grid partly out of range to exercise zeros padding
    grid = (rng.random((2, 6, 8, 2)).astype(np.float32) * 2 - 1) * scale
    ours = np.asarray(grid_sample(jnp.asarray(x), jnp.asarray(grid)))
    ref = F.grid_sample(_nchw(x), torch.from_numpy(grid),
                        mode="bilinear", padding_mode="zeros",
                        align_corners=True).numpy()
    np.testing.assert_allclose(ours, np.transpose(ref, (0, 2, 3, 1)),
                               rtol=1e-4, atol=1e-5)


def test_grid_sample_grads_flow(rng):
    x = jnp.asarray(rng.random((1, 6, 6, 2), np.float32))
    grid = jnp.asarray((rng.random((1, 4, 4, 2)).astype(np.float32) * 2 - 1))

    gi = jax.grad(lambda im: jnp.sum(grid_sample(im, grid) ** 2))(x)
    gg = jax.grad(lambda g: jnp.sum(grid_sample(x, g) ** 2))(grid)
    assert np.isfinite(np.asarray(gi)).all()
    assert np.isfinite(np.asarray(gg)).all()
    assert float(jnp.abs(gg).sum()) > 0

    # grid gradient matches torch
    tx = _nchw(np.asarray(x)).requires_grad_(False)
    tg = torch.from_numpy(np.asarray(grid)).requires_grad_(True)
    out = F.grid_sample(tx, tg, mode="bilinear", padding_mode="zeros",
                        align_corners=True)
    (out ** 2).sum().backward()
    np.testing.assert_allclose(np.asarray(gg), tg.grad.numpy(),
                               rtol=1e-4, atol=1e-5)
