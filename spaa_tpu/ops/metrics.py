"""Image-distance metrics bundle: PSNR / RMSE / SSIM / L2 / L∞ / ΔE.

Re-derivation of reference ``utils.py:420-491`` in JAX/NHWC. The L2/L∞
flavors are the Zhao CVPR'20 "mean per-pixel channel-norm × 255"
definitions the SPAA paper tables use.

``calc_img_dists`` returns the 6-tuple in the same order as the reference
so stats tables line up column-for-column.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from spaa_tpu.ops.color import deltaE as _deltaE_jnp
from spaa_tpu.ops.image import expand_4d
from spaa_tpu.ops.ssim import ssim as _ssim_jnp


@jax.jit
def _metrics_device(x: jax.Array, y: jax.Array):
    """All six metrics in one jitted call (one device round-trip)."""
    mse = jnp.mean((x - y) ** 2)
    psnr = 10.0 * jnp.log10(1.0 / mse)
    rmse = jnp.sqrt(mse * 3.0)  # RGB, ref utils.py:445
    ssim_v = _ssim_jnp(x, y)
    diff = x - y
    # channel-wise norms: NHWC -> norm over C
    l2 = jnp.mean(jnp.linalg.norm(diff, axis=-1)) * 255.0
    linf = jnp.mean(jnp.max(jnp.abs(diff), axis=-1)) * 255.0
    de = _deltaE_jnp(x, y)
    return psnr, rmse, ssim_v, l2, linf, de


@jax.jit
def per_sample_img_dists(x: jax.Array, y: jax.Array):
    """Per-sample metric primitives, each [N]: (mse, ssim, l2, linf, dE).

    Slice aggregates are linear in these (PSNR/RMSE derive from the mean
    mse), so callers that need metrics over several overlapping batch
    slices — summarize's targeted/untargeted/all blocks — can run ONE
    device dispatch per image stack and combine on the host instead of
    re-running the bundle per slice."""
    from spaa_tpu.ops.color import ciede2000_diff, rgb2lab_diff
    mse = jnp.mean((x - y) ** 2, axis=(1, 2, 3))
    ssim_s = _ssim_jnp(x, y, size_average=False)
    diff = x - y
    l2 = jnp.mean(jnp.linalg.norm(diff, axis=-1), axis=(1, 2)) * 255.0
    linf = jnp.mean(jnp.max(jnp.abs(diff), axis=-1), axis=(1, 2)) * 255.0
    de = jnp.mean(ciede2000_diff(rgb2lab_diff(x), rgb2lab_diff(y)),
                  axis=(1, 2))
    return mse, ssim_s, l2, linf, de


def dists_from_per_sample(vals, sl=slice(None)):
    """(PSNR, RMSE, SSIM, L2, L∞, ΔE) floats for a slice of
    :func:`per_sample_img_dists` outputs (host-side arithmetic)."""
    import numpy as np
    mse, ssim_s, l2, linf, de = (np.asarray(v)[sl] for v in vals)
    m = float(mse.mean())
    with np.errstate(divide="ignore"):
        psnr_v = float(10.0 * np.log10(1.0 / m)) if m > 0 else float("inf")
    return (psnr_v, float(np.sqrt(m * 3.0)), float(ssim_s.mean()),
            float(l2.mean()), float(linf.mean()), float(de.mean()))


def calc_img_dists(x: jax.Array, y: jax.Array):
    """Compute (PSNR, RMSE, SSIM, L2, L∞, ΔE) as python floats.
    Ref ``utils.py:420-423``; inputs NHWC (or HWC) in [0, 1]."""
    x = expand_4d(jnp.asarray(x))
    y = expand_4d(jnp.asarray(y))
    vals = _metrics_device(x, y)
    return tuple(float(v) for v in vals)


def psnr(x, y) -> float:
    x, y = expand_4d(jnp.asarray(x)), expand_4d(jnp.asarray(y))
    return float(10.0 * jnp.log10(1.0 / jnp.mean((x - y) ** 2)))


def rmse(x, y) -> float:
    x, y = expand_4d(jnp.asarray(x)), expand_4d(jnp.asarray(y))
    return float(jnp.sqrt(jnp.mean((x - y) ** 2) * 3.0))


def ssim(x, y) -> float:
    x, y = expand_4d(jnp.asarray(x)), expand_4d(jnp.asarray(y))
    return float(_ssim_jnp(x, y))


def l2_norm(x, y) -> float:
    """Mean per-pixel channel L2 norm ×255 (ref ``utils.py:459-470``)."""
    x, y = expand_4d(jnp.asarray(x)), expand_4d(jnp.asarray(y))
    return float(jnp.mean(jnp.linalg.norm(x - y, axis=-1)) * 255.0)


def linf_norm(x, y) -> float:
    """Mean per-pixel channel L∞ norm ×255 (ref ``utils.py:474-485``)."""
    x, y = expand_4d(jnp.asarray(x)), expand_4d(jnp.asarray(y))
    return float(jnp.mean(jnp.max(jnp.abs(x - y), axis=-1)) * 255.0)


def deltaE(x, y) -> float:
    x, y = expand_4d(jnp.asarray(x)), expand_4d(jnp.asarray(y))
    return float(_deltaE_jnp(x, y))


def l2_norm_to_mse(x: jax.Array, num_chan: int) -> jax.Array:
    """Ref ``utils.py:489-491``."""
    return jnp.mean(x ** 2) / num_chan
