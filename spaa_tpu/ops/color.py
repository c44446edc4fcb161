"""Differentiable color science: sRGB→XYZ→CIELAB and CIEDE2000 ΔE maps.

Re-derivation in JAX/NHWC of the masked-tensor color pipeline the SPAA and
PerC-AL attackers optimize through (reference
``perc_al/differential_color_functions.py``, itself from Zhao et al.
CVPR'20). The exact constants and masking idiosyncrasies of the reference
are kept on purpose (sRGB linearization threshold 0.0405, the +1e-4
epsilons, zero-chroma masks) because attack stealthiness parity depends on
the exact loss surface.

The whole chain is branchless elementwise math (`jnp.where`), which XLA
fuses into a handful of VPU kernels on its own. (A hand-written Pallas
CIEDE2000 kernel with an in-kernel VJP was prototyped and *matched but did
not beat* XLA's fusion on v5e, so it was removed — see commit d119887;
re-attempt only with explicit scheduling.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# sRGB -> XYZ (D65) matrix, same values as ref differential_color_functions.py:13-15
_RGB2XYZ = np.array([[0.4124, 0.3576, 0.1805],
                     [0.2126, 0.7152, 0.0722],
                     [0.0193, 0.1192, 0.9504]], np.float32)

_XN, _YN, _ZN = 95.0489, 100.0, 108.8840  # D65 reference white (ref :49-51)


@jax.custom_jvp
def _srgb_gamma(x: jax.Array) -> jax.Array:
    """((x+0.055)/1.055)^2.4 with a derivative that reuses the forward
    value (d/dx x^2.4 = 2.4 y / x): halves the pow count in backward."""
    return ((x + 0.055) / 1.055) ** 2.4


@_srgb_gamma.defjvp
def _srgb_gamma_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    y = _srgb_gamma(x)
    return y, 2.4 * y / (x + 0.055) * dx


def rgb2xyz(rgb: jax.Array) -> jax.Array:
    """[..., 3] sRGB in [0,1] -> XYZ scaled by 100. Ref ``:12-24``.

    The 3x3 color matrix is applied as elementwise madds, not a matmul:
    a [10M, 3] x [3, 3] contraction can't use the MXU efficiently and the
    materialized passes dominate; as scalar madds it fuses with the rest
    of the Lab chain."""
    linear = 100.0 * jnp.where(rgb > 0.0405, _srgb_gamma(rgb), rgb / 12.92)
    r, g, b = linear[..., 0], linear[..., 1], linear[..., 2]
    m = _RGB2XYZ
    return jnp.stack([m[0, 0] * r + m[0, 1] * g + m[0, 2] * b,
                      m[1, 0] * r + m[1, 1] * g + m[1, 2] * b,
                      m[2, 0] * r + m[2, 1] * g + m[2, 2] * b], axis=-1)


@jax.custom_jvp
def _cbrt(x: jax.Array) -> jax.Array:
    """cube root whose derivative reuses the forward value
    (d/dx x^(1/3) = 1/(3 y^2))."""
    return jnp.cbrt(x)


@_cbrt.defjvp
def _cbrt_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    y = _cbrt(x)
    return y, dx / (3.0 * y * y)


def _pow7(x: jax.Array) -> jax.Array:
    """x^7 as 4 multiplies (XLA lowers float-exponent pow to exp/log —
    ~10x the cost on the VPU)."""
    x2 = x * x
    x4 = x2 * x2
    return x4 * x2 * x


def _xyz_lab_f(t: jax.Array) -> jax.Array:
    """The f() nonlinearity with the reference's zero-input masking
    (ref ``:27-36``): exact zeros stay zero, cube-root branch uses t+1e-4
    guard to avoid inf grads."""
    is_zero = (t == 0.0)
    t_safe = t + 1e-4 * is_zero.astype(t.dtype)
    f = jnp.where(t_safe > 0.008856,
                  _cbrt(t_safe),
                  7.787 * t_safe + 16.0 / 116.0)
    return f * (1.0 - is_zero.astype(t.dtype))


def lab_from_rgb_channels(r: jax.Array, g: jax.Array, b: jax.Array):
    """Channel-separate differentiable sRGB -> CIELAB core (shared by the
    stacked API below and the fused Pallas kernel, where a trailing
    3-channel axis would waste the 128-lane layout)."""
    rl = 100.0 * jnp.where(r > 0.0405, _srgb_gamma(r), r / 12.92)
    gl = 100.0 * jnp.where(g > 0.0405, _srgb_gamma(g), g / 12.92)
    bl = 100.0 * jnp.where(b > 0.0405, _srgb_gamma(b), b / 12.92)
    m = _RGB2XYZ
    x = m[0, 0] * rl + m[0, 1] * gl + m[0, 2] * bl
    y = m[1, 0] * rl + m[1, 1] * gl + m[1, 2] * bl
    z = m[2, 0] * rl + m[2, 1] * gl + m[2, 2] * bl
    fx = _xyz_lab_f(x / _XN)
    fy = _xyz_lab_f(y / _YN)
    fz = _xyz_lab_f(z / _ZN)
    return 116.0 * fy - 16.0, 500.0 * (fx - fy), 200.0 * (fy - fz)


def rgb2lab_diff(rgb: jax.Array) -> jax.Array:
    """Differentiable sRGB -> CIELAB, NHWC [..., 3] -> [..., 3] (L, a, b).
    Ref ``:39-64`` (named `_diff` there for 'differentiable')."""
    l, a, b = lab_from_rgb_channels(rgb[..., 0], rgb[..., 1], rgb[..., 2])
    return jnp.stack([l, a, b], axis=-1)


def _degrees(x):
    return x * (180.0 / jnp.pi)


def _radians(x):
    return x * (jnp.pi / 180.0)


def _hpf(x, y, atan2=jnp.arctan2):

    """Hue angle in degrees in [0, 360), masked at (0,0). Ref ``:73-81``."""
    zero = ((x == 0) & (y == 0)).astype(x.dtype)
    nz = 1.0 - zero
    h = _degrees(atan2(x * nz, y * nz))
    return jnp.where(h >= 0, h, h + 360.0) * nz + 0.0


def _dhpf(c1, c2, h1p, h2p):
    """Hue difference, wrapped to (-180, 180], zero when either chroma is 0.
    Ref ``:84-91``."""
    nz = 1.0 - ((c1 * c2) == 0).astype(c1.dtype)
    d = h2p - h1p
    d = jnp.where(d > 180.0, d - 360.0, jnp.where(d < -180.0, d + 360.0, d))
    return d * nz


def _ahpf(c1, c2, h1p, h2p):
    """Average hue, with the reference's exact mask arithmetic
    (ref ``:94-106`` — note when chroma is zero the reference returns
    (h1p+h2p)/2 * ... via its `res * mask1` term)."""
    zero = ((c1 * c2) == 0).astype(c1.dtype)
    nz = 1.0 - zero
    near = (jnp.abs(h2p - h1p) <= 180.0).astype(c1.dtype)
    far = 1.0 - near
    wrap_lo = (jnp.abs(h2p + h1p) < 360.0).astype(c1.dtype)
    s = h1p + h2p
    res = s * nz * near + (s + 360.0) * nz * far * wrap_lo \
        + (s - 360.0) * nz * far * (1.0 - wrap_lo)
    res = res + res * zero
    return res * 0.5


def ciede2000_diff(lab1: jax.Array, lab2: jax.Array,
                   standard: bool = False) -> jax.Array:
    """CIEDE2000 color-difference map.

    lab1, lab2: [N, H, W, 3] CIELAB. Returns ΔE00 map [N, H, W].
    Faithful to ref ``differential_color_functions.py:109-180`` including
    its neutral-axis masking and sqrt guards (the loss surface the SPAA
    `camdE` stealthiness term optimizes, ``projector_based_attack.py:283``).

    Known deviation of the reference from the Sharma/CIE standard: its T
    term uses ``cos(h̄' − 39°)`` where the standard formula uses 30°
    (ref ``:160``). Default keeps reference behavior for benchmark-table
    parity; pass ``standard=True`` for the textbook formula (verified
    against the Sharma et al. 2005 test pairs).
    """
    return ciede2000_channels(lab1[..., 0], lab1[..., 1], lab1[..., 2],
                              lab2[..., 0], lab2[..., 1], lab2[..., 2],
                              standard=standard)


def ciede2000_channels(l1, a1, b1, l2, a2, b2, standard: bool = False,
                       atan2=jnp.arctan2):
    """Channel-separate CIEDE2000 core (see :func:`ciede2000_diff`).
    ``atan2``: injectable arctangent for kernel variants that must supply
    their own primitive (e.g. a polynomial approximation inside a Pallas
    body, where ``jnp.arctan2`` is unavailable); the default is exact and
    is what every in-tree caller uses."""
    zero1 = ((a1 == 0) & (b1 == 0)).astype(l1.dtype)
    zero2 = ((a2 == 0) & (b2 == 0)).astype(l1.dtype)
    nz1 = 1.0 - zero1
    nz2 = 1.0 - zero2
    b1 = b1 + 1e-4 * zero1
    b2 = b2 + 1e-4 * zero2

    c1 = jnp.sqrt(a1 * a1 + b1 * b1)
    c2 = jnp.sqrt(a2 * a2 + b2 * b2)
    ac = (c1 + c2) / 2.0

    ac7 = _pow7(ac)
    g = 0.5 * (1.0 - jnp.sqrt(ac7 / (ac7 + 25.0 ** 7.0)))
    a1p = (1.0 + g) * a1
    a2p = (1.0 + g) * a2
    c1p = jnp.sqrt(a1p * a1p + b1 * b1)
    c2p = jnp.sqrt(a2p * a2p + b2 * b2)

    h1p = _hpf(b1, a1p, atan2) * nz1
    h2p = _hpf(b2, a2p, atan2) * nz2

    dlp = l2 - l1
    dcp = c2p - c1p
    dhp = _dhpf(c1, c2, h1p, h2p)
    # sqrt-at-0 guard: c1p*c2p can underflow to exactly 0 in f32 for
    # near-neutral pixels, making the sqrt pullback NaN (latent hazard in
    # the reference formulation too); max() routes the gradient safely
    dhp_big = 2.0 * jnp.sqrt(jnp.maximum(c1p * c2p, 1e-30)) \
        * jnp.sin(_radians(dhp) / 2.0)
    nz_both = 1.0 - jnp.maximum(zero1, zero2)
    dhp_big = dhp_big * nz_both

    al = (l1 + l2) / 2.0
    acp = (c1p + c2p) / 2.0
    ahp = _ahpf(c1, c2, h1p, h2p)
    t_shift = 30.0 if standard else 39.0
    t = (1.0 - 0.17 * jnp.cos(_radians(ahp - t_shift))
         + 0.24 * jnp.cos(_radians(2.0 * ahp))
         + 0.32 * jnp.cos(_radians(3.0 * ahp + 6.0))
         - 0.2 * jnp.cos(_radians(4.0 * ahp - 63.0)))
    _dro_arg = (ahp - 275.0) / 25.0
    dro = 30.0 * jnp.exp(-(_dro_arg * _dro_arg))
    acp7 = _pow7(acp)
    rc = jnp.sqrt(acp7 / (acp7 + 25.0 ** 7.0))
    al50sq = (al - 50.0) * (al - 50.0)
    sl = 1.0 + 0.015 * al50sq / jnp.sqrt(20.0 + al50sq)
    sc = 1.0 + 0.045 * acp
    sh = 1.0 + 0.015 * acp * t
    rt = -2.0 * rc * jnp.sin(_radians(2.0 * dro))

    term_l = dlp / sl
    term_c = dcp / sc
    term_h = dhp_big / sh
    res_sq = (term_l * term_l + term_c * term_c * nz_both
              + term_h * term_h * nz_both + rt * term_c * term_h * nz_both)
    nonpos = (res_sq <= 0).astype(res_sq.dtype)
    res = jnp.sqrt(res_sq + 1e-4 * nonpos)
    return res * (1.0 - nonpos)


def deltaE(x: jax.Array, y: jax.Array) -> jax.Array:
    """Scalar mean CIEDE2000 between two NHWC RGB images.
    Ref ``differential_color_functions.py:183-190``."""
    from spaa_tpu.ops.image import expand_4d
    x = expand_4d(x)
    y = expand_4d(y)
    return jnp.mean(ciede2000_diff(rgb2lab_diff(x), rgb2lab_diff(y)))
