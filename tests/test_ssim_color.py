"""Golden tests for SSIM (vs an independent torch computation of the
standard MATLAB-style SSIM with replicate padding) and for CIEDE2000
(vs the Sharma et al. 2005 published test pairs) + metric sanity checks."""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from spaa_tpu.ops import ciede2000_diff, deltaE, rgb2lab_diff, ssim
from spaa_tpu.ops.metrics import (calc_img_dists, l2_norm, linf_norm, psnr,
                                  rmse)


def _torch_ssim(a, b, win=11, sigma=1.5):
    """Independent torch oracle: standard SSIM, gaussian window, replicate
    padding, per-channel depthwise conv."""
    g = torch.tensor([math.exp(-((i - win // 2) ** 2) / (2 * sigma ** 2))
                      for i in range(win)])
    g = (g / g.sum()).float()
    k2d = (g[:, None] @ g[None, :])[None, None]
    c = a.shape[1]
    k = k2d.expand(c, 1, win, win)
    pad = win // 2
    a = F.pad(a, (pad,) * 4, mode="replicate")
    b = F.pad(b, (pad,) * 4, mode="replicate")
    mu1 = F.conv2d(a, k, groups=c)
    mu2 = F.conv2d(b, k, groups=c)
    s11 = F.conv2d(a * a, k, groups=c) - mu1 ** 2
    s22 = F.conv2d(b * b, k, groups=c) - mu2 ** 2
    s12 = F.conv2d(a * b, k, groups=c) - mu1 * mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 ** 2 + mu2 ** 2 + c1) * (s11 + s22 + c2))
    return m.mean().item()


def test_ssim_matches_torch_oracle(rng):
    a = rng.random((2, 16, 18, 3), np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32), 0, 1)
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    ta = torch.from_numpy(np.transpose(a, (0, 3, 1, 2)))
    tb = torch.from_numpy(np.transpose(b, (0, 3, 1, 2)))
    assert ours == pytest.approx(_torch_ssim(ta, tb), abs=1e-4)


def test_ssim_identity():
    x = jnp.asarray(np.random.default_rng(3).random((1, 12, 12, 3), np.float32))
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)


# Sharma, Wu & Dalal (2005) CIEDE2000 test pairs:
# (Lab1, Lab2, standard dE00, reference-parity dE00).
# The reference deviates from the standard via cos(h̄'−39°) vs 30° in its T
# term (differential_color_functions.py:160); the 4th column values were
# computed with an independent scalar implementation of that variant.
_SHARMA_PAIRS = [
    ((50.0, 2.6772, -79.7751), (50.0, 0.0, -82.7485), 2.0425, 2.021278),
    ((50.0, 3.1571, -77.2803), (50.0, 0.0, -82.7485), 2.8615, 2.836154),
    ((50.0, -1.3802, -84.2814), (50.0, 0.0, -82.7485), 1.0000, 0.990157),
    ((60.2574, -34.0099, 36.2677), (60.4626, -34.1751, 39.4387), 1.2644, 1.272590),
    ((63.0109, -31.0961, -5.8663), (62.8187, -29.7946, -4.0864), 1.2630, 1.266425),
    ((35.0831, -44.1164, 3.7933), (35.0232, -40.0716, 1.5901), 1.8645, 1.869278),
    ((22.7233, 20.0904, -46.6940), (23.0331, 14.9730, -42.5619), 2.0373, 2.010474),
    ((2.0776, 0.0795, -1.1350), (0.9033, -0.0636, -0.5514), 0.9082, 0.908219),
]


def test_ciede2000_standard_matches_sharma():
    lab1 = jnp.asarray([[[p[0]] for p in _SHARMA_PAIRS]], jnp.float32)
    lab2 = jnp.asarray([[[p[1]] for p in _SHARMA_PAIRS]], jnp.float32)
    expected = np.array([p[2] for p in _SHARMA_PAIRS])
    de = np.asarray(ciede2000_diff(lab1, lab2, standard=True))[0, :, 0]
    np.testing.assert_allclose(de, expected, atol=5e-3)


def test_ciede2000_reference_parity():
    lab1 = jnp.asarray([[[p[0]] for p in _SHARMA_PAIRS]], jnp.float32)
    lab2 = jnp.asarray([[[p[1]] for p in _SHARMA_PAIRS]], jnp.float32)
    expected = np.array([p[3] for p in _SHARMA_PAIRS])
    de = np.asarray(ciede2000_diff(lab1, lab2))[0, :, 0]
    np.testing.assert_allclose(de, expected, atol=5e-3)


def test_rgb2lab_known_values():
    # white -> L≈100, a/b≈0 (with the reference's 4-digit matrix, small bias ok)
    rgb = jnp.asarray([[[[1.0, 1.0, 1.0], [0.0, 0.0, 0.0]]]])
    lab = np.asarray(rgb2lab_diff(rgb))
    assert lab[0, 0, 0, 0] == pytest.approx(100.0, abs=0.5)
    assert abs(lab[0, 0, 0, 1]) < 0.5 and abs(lab[0, 0, 0, 2]) < 0.5
    # reference quirk: f(0) is masked to 0, so pure black gives L = -16
    # (differential_color_functions.py:27-36,57)
    np.testing.assert_allclose(lab[0, 0, 1], [-16, 0, 0], atol=1e-5)


def test_deltaE_zero_and_positive(rng):
    x = jnp.asarray(rng.random((1, 8, 8, 3), np.float32))
    assert float(deltaE(x, x)) == pytest.approx(0.0, abs=1e-4)
    y = jnp.clip(x + 0.1, 0, 1)
    assert float(deltaE(x, y)) > 0.5


def test_metric_bundle(rng):
    x = rng.random((2, 8, 8, 3), np.float32)
    y = np.clip(x + rng.normal(0, 0.05, x.shape).astype(np.float32), 0, 1)
    vals = calc_img_dists(jnp.asarray(x), jnp.asarray(y))
    assert len(vals) == 6
    mse = np.mean((x - y) ** 2)
    assert vals[0] == pytest.approx(10 * np.log10(1 / mse), abs=1e-3)
    assert vals[1] == pytest.approx(np.sqrt(mse * 3), abs=1e-5)
    assert vals[3] == pytest.approx(
        np.mean(np.linalg.norm(x - y, axis=-1)) * 255, rel=1e-4)
    assert vals[4] == pytest.approx(
        np.mean(np.abs(x - y).max(-1)) * 255, rel=1e-4)


def test_gradients_through_color_loss(rng):
    """The camdE stealthiness term must be differentiable (attack loop)."""
    import jax
    x = jnp.asarray(rng.random((1, 6, 6, 3), np.float32) * 0.8 + 0.1)
    y = jnp.asarray(rng.random((1, 6, 6, 3), np.float32) * 0.8 + 0.1)

    def loss(a):
        return jnp.mean(ciede2000_diff(rgb2lab_diff(a), rgb2lab_diff(y)))

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_per_sample_dists_aggregate_to_bundle(rng):
    """per_sample_img_dists + dists_from_per_sample must reproduce
    calc_img_dists for any batch slice (summarize computes the
    targeted/untargeted/all blocks this way from one dispatch)."""
    from spaa_tpu.ops.metrics import (calc_img_dists, dists_from_per_sample,
                                      per_sample_img_dists)
    import jax.numpy as jnp
    x = jnp.asarray(rng.random((5, 24, 32, 3)).astype(np.float32))
    y = jnp.asarray(rng.random((5, 24, 32, 3)).astype(np.float32))
    vals = per_sample_img_dists(x, y)
    for sl in [slice(0, 5), slice(0, 3), slice(3, 4)]:
        a = dists_from_per_sample(vals, sl)
        b = calc_img_dists(x[sl], y[sl])
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
