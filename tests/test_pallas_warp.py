"""Pallas fixed-grid warp kernel vs the reference grid_sample, in interpret
mode on CPU (the identical kernel code path that compiles on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spaa_tpu.ops.image import grid_sample
from spaa_tpu.ops.pallas.warp import build_fixed_warp, fixed_warp_apply


def _wavy_grid(ho, wo, scale=0.9, rot_deg=2.0, wiggle=0.03, shift=(0.02, -0.01)):
    yy, xx = np.meshgrid(np.linspace(-1, 1, ho), np.linspace(-1, 1, wo),
                         indexing="ij")
    th = np.deg2rad(rot_deg)
    gx = scale * (np.cos(th) * xx - np.sin(th) * yy) \
        + wiggle * np.sin(3 * yy) + shift[0]
    gy = scale * (np.sin(th) * xx + np.cos(th) * yy) \
        + wiggle * np.cos(2 * xx) + shift[1]
    return np.stack([gx, gy], -1)[None].astype(np.float32)


@pytest.mark.parametrize("shape", [(32, 32, 24, 40), (64, 48, 40, 64)])
def test_fixed_warp_matches_grid_sample(shape, rng):
    h, w, ho, wo = shape
    grid = _wavy_grid(ho, wo)
    im = jnp.asarray(rng.random((3, h, w, 3)).astype(np.float32))
    spec, tables = build_fixed_warp(grid, (h, w))
    out = fixed_warp_apply(spec, tables, im)
    ref = grid_sample(im, jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fixed_warp_gradients_match(rng):
    h, w, ho, wo = 32, 32, 24, 40
    grid = _wavy_grid(ho, wo)
    im = jnp.asarray(rng.random((2, h, w, 3)).astype(np.float32))
    spec, tables = build_fixed_warp(grid, (h, w))

    g = jax.grad(lambda x: jnp.sum(jnp.sin(
        fixed_warp_apply(spec, tables, x))))(im)
    g_ref = jax.grad(lambda x: jnp.sum(jnp.sin(
        grid_sample(x, jnp.asarray(grid)))))(im)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_fixed_warp_out_of_range_zero_padding(rng):
    """Grid points outside [-1,1] must contribute zeros (torch
    padding_mode='zeros')."""
    h, w, ho, wo = 16, 16, 16, 16
    grid = _wavy_grid(ho, wo, scale=1.6)  # large chunks out of range
    im = jnp.asarray(rng.random((1, h, w, 3)).astype(np.float32))
    spec, tables = build_fixed_warp(grid, (h, w))
    out = fixed_warp_apply(spec, tables, im)
    ref = grid_sample(im, jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # corners fully out of range -> exactly zero
    assert np.asarray(out)[0, 0, 0].max() == 0.0
