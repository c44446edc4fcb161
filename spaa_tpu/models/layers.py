"""Flax building blocks with torch Conv2d/ConvTranspose2d semantics.

The reference models (``models.py``) are built from nn.Conv2d /
nn.ConvTranspose2d with specific (kernel, stride, padding, output_padding)
combos and kaiming-normal weight init. These wrappers reproduce the exact
output shapes/semantics in NHWC so the architectures transfer weight-for-
weight, while using lax convolutions that XLA maps onto the MXU.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def kaiming_normal_torch(key, shape, dtype=jnp.float32):
    """torch ``nn.init.kaiming_normal_`` default (fan_in, leaky_relu a=0 →
    gain √2) for HWIO conv kernels. Ref ``models.py:55-58``."""
    kh, kw, cin, _ = shape
    fan_in = kh * kw * cin
    std = np.sqrt(2.0 / fan_in)
    return jax.random.normal(key, shape, dtype) * std


def normal_init(std: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std
    return init


def torch_conv_default_kernel_init(key, shape, dtype=jnp.float32):
    """torch Conv2d default: kaiming_uniform(a=√5) → U(-1/√fan_in, ...)."""
    kh, kw, cin, _ = shape
    fan_in = kh * kw * cin
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _bias_init_for(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def conv2d_nhwc(x, kernel, bias=None, strides=(1, 1), padding=(0, 0)):
    """The Conv2dTorch forward as a pure function (NHWC x, HWIO kernel)."""
    sh, sw = strides
    ph, pw = padding
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, kernel, (sh, sw), ((ph, ph), (pw, pw)), dimension_numbers=dn)
    if bias is not None:
        y = y + bias
    return y


def _igrad_taps(cot, kernel, strides, padding, in_hw):
    """Input cotangent of ``conv2d_nhwc(x, kernel, strides, padding)``
    computed as a tap-GEMM plus static shifted adds.

    XLA lowers a conv's backward-data pass as another conv whose GEMM
    N-dimension is the INPUT channel count — for small-Cin layers (a
    classifier stem taking a 3-channel image) that uses 3 of the MXU's
    128 lanes and runs at ~4-5 TF/s (measured, tools/trace_attack.py).
    Here the contraction over output channels happens first:

        T[b, ho, wo, (i, j, c)] = sum_o cot[b, ho, wo, o] * W[i, j, c, o]

    one dot_general with N = kh*kw*cin (147 for a 7x7x3 stem — full
    lanes), followed by the purely data-movement overlap-add

        g[b, u, v, c] = sum_{i,j} T[b, (u+ph-i)/sh, (v+pw-j)/sw, (i,j,c)]

    over the taps where the division is exact — static slices + pads +
    adds grouped by output phase (u mod sh, v mod sw), which XLA fuses
    into one pass over T. Same FLOPs, same result up to accumulation
    order (the per-tap dot accumulates in f32 exactly like the conv; the
    <= ceil(kh/sh)*ceil(kw/sw) tap adds happen in cot's dtype).
    """
    kh, kw, ci, co = kernel.shape
    b, ho, wo = cot.shape[:3]
    wr = kernel.reshape(kh * kw * ci, co)
    t = jax.lax.dot_general(cot, wr, (((3,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    t = t.astype(cot.dtype).reshape(b, ho, wo, kh, kw, ci)
    return _overlap_add_taps(lambda i, j: t[:, :, :, i, j, :],
                             (b, ho, wo, ci), (kh, kw), strides, padding,
                             in_hw, t.dtype)


def _overlap_add_taps(get_tap, t_shape, window, strides, padding, in_hw,
                      dtype):
    """Scatter-free overlap-add over a sliding window's taps:

        g[b, u, v, c] = sum_{i,j} tap(i,j)[b, (u+ph-i)/sh, (v+pw-j)/sw, c]

    over the taps (i, j) where the division is exact — static slices +
    pads + adds grouped by output phase (u mod sh, v mod sw), which XLA
    fuses into one pass. ``get_tap(i, j)`` returns that tap's [b, ho, wo,
    c] contribution lazily (so callers never materialize a kh*kw-wide
    stack). Shared by the conv backward-data tap-GEMM (:func:`_igrad_taps`)
    and the max-pool backward (:func:`_pool_igrad_taps`)."""
    b, ho, wo, ci = t_shape
    kh, kw = window
    sh, sw = strides
    ph, pw = padding
    hh, ww = in_hw
    q_h = -(-hh // sh)            # rows per H-phase (ceil)
    q_w = -(-ww // sw)
    phase_rows = []
    for r in range(sh):
        phase_cols = []
        for rw in range(sw):
            acc = jnp.zeros((b, q_h, q_w, ci), dtype)
            for i in range(kh):
                if (r + ph - i) % sh:
                    continue
                th = (r + ph - i) // sh
                q0 = max(0, -th)
                q1 = min(q_h, ho - th)
                if q1 <= q0:
                    continue
                for j in range(kw):
                    if (rw + pw - j) % sw:
                        continue
                    tw = (rw + pw - j) // sw
                    p0 = max(0, -tw)
                    p1 = min(q_w, wo - tw)
                    if p1 <= p0:
                        continue
                    sl = get_tap(i, j)[:, q0 + th:q1 + th,
                                       p0 + tw:p1 + tw, :]
                    acc = acc + jnp.pad(
                        sl, ((0, 0), (q0, q_h - q1), (p0, q_w - p1), (0, 0)))
            phase_cols.append(acc)
        phase_rows.append(jnp.stack(phase_cols, axis=3))  # [b,q_h,q_w,sw,ci]
    g = jnp.stack(phase_rows, axis=2)                     # [b,q_h,sh,q_w,sw,ci]
    g = g.reshape(b, q_h * sh, q_w * sw, ci)
    return g[:, :hh, :ww, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv2d_taps_bwd(x, kernel, strides, padding):
    """``conv2d_nhwc`` (bias-less) with the backward-data pass rewritten as
    the tap-GEMM of :func:`_igrad_taps`. Bitwise-identical forward; the
    input gradient is mathematically identical (reordered accumulation).
    Use for small-Cin convs whose XLA backward is lane-starved — e.g. the
    classifier stems the SPAA attack differentiates through every
    iteration (``strides``/``padding`` must be static tuples)."""
    return conv2d_nhwc(x, kernel, None, strides, padding)


def _conv2d_taps_fwd(x, kernel, strides, padding):
    return (conv2d_nhwc(x, kernel, None, strides, padding),
            (x, kernel, x.shape[1:3]))


def _conv2d_taps_bwd(strides, padding, res, cot):
    x, kernel, in_hw = res
    g_x = _igrad_taps(cot, kernel, strides, padding, in_hw)
    # weight grad via the standard conv transpose rule (DCE'd by XLA when
    # the kernel is a frozen jit argument, as in the attack programs)
    _, vjp = jax.vjp(
        lambda k: conv2d_nhwc(x, k, None, strides, padding), kernel)
    return g_x, vjp(cot)[0]


conv2d_taps_bwd.defvjp(_conv2d_taps_fwd, _conv2d_taps_bwd)


def _pool_igrad_taps(x, cot, window, strides):
    """Input cotangent of a VALID max-pool as elementwise argmax routing
    plus the static overlap-add of :func:`_overlap_add_taps`.

    XLA lowers reduce_window-max's backward as SelectAndScatter — a
    serial window scan the TPU runs far off the vector units' pace. The
    routing rule is "first maximum in row-major window order" (verified
    against jax.grad incl. ties, tests/test_taps_bwd.py): reproduce it
    with a strict-> running argmax over the kh*kw strided tap views, then
    add each tap's `where(argmax==k, cot, 0)` into its input positions —
    all elementwise ops, pads and adds. The routing itself is exact;
    gradients are bitwise-identical when windows don't overlap (2x2 s2),
    and ulp-level (reordered accumulation of the <=4 overlapping windows'
    contributions) for 3x3 s2."""
    kh, kw = window
    sh, sw = strides
    b, hh, ww, c = x.shape
    ho, wo = cot.shape[1:3]

    def tap_view(i, j):
        return jax.lax.slice(x, (0, i, j, 0),
                             (b, i + (ho - 1) * sh + 1,
                              j + (wo - 1) * sw + 1, c), (1, sh, sw, 1))

    m = tap_view(0, 0)
    idx = jnp.zeros(m.shape, jnp.int32)
    for k in range(1, kh * kw):
        t = tap_view(k // kw, k % kw)
        better = t > m
        m = jnp.where(better, t, m)
        idx = jnp.where(better, k, idx)
    zero = jnp.zeros((), cot.dtype)
    return _overlap_add_taps(
        lambda i, j: jnp.where(idx == i * kw + j, cot, zero),
        (b, ho, wo, c), window, strides, (0, 0), (hh, ww), cot.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def max_pool_taps_bwd(x, window, strides):
    """``nn.max_pool(x, window, strides, padding="VALID")`` with the
    backward pass rewritten per :func:`_pool_igrad_taps` (identical
    forward primitive; exact routing, no SelectAndScatter).
    ``window``/``strides`` must be static tuples."""
    return nn.max_pool(x, window, strides, padding="VALID")


def _max_pool_taps_fwd(x, window, strides):
    return nn.max_pool(x, window, strides, padding="VALID"), x


def _max_pool_taps_bwd(window, strides, x, cot):
    return (_pool_igrad_taps(x, cot, window, strides),)


max_pool_taps_bwd.defvjp(_max_pool_taps_fwd, _max_pool_taps_bwd)


class ConvStemTapsBwd(nn.Module):
    """Drop-in for the classifier stems' ``nn.Conv``: same param
    names/shapes/inits (``kernel`` HWIO he_normal, optional ``bias``
    zeros) so converted torchvision weights load unchanged, but the
    backward-data pass runs through :func:`conv2d_taps_bwd` (see there).
    The bias add lives outside the custom vjp — its gradient is the
    standard autodiff sum, untouched."""
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Sequence[int] = (0, 0)
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            (kh, kw, x.shape[-1], self.features))
        bias = None
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
        # nn.Conv promotes input+params (incl. bias) to a common dtype
        # (dtype=None); conv2d_taps_bwd calls lax.conv directly, which
        # requires it. Matching the promotion keeps this a true drop-in:
        # the production bf16 attack path carries bf16-cast params while
        # normalize_imagenet re-promotes the image to f32
        # (classifiers/__init__.py), so without this the mixed-dtype conv
        # is a TypeError — and with f32 bias + bf16 x/kernel (VGG stem)
        # nn.Conv computes in f32, so the bias must join the promotion.
        dtypes = [x.dtype, kernel.dtype] + ([bias.dtype] if bias is not None else [])
        ct = jnp.result_type(*dtypes)
        y = conv2d_taps_bwd(x.astype(ct), kernel.astype(ct),
                            _pair(self.strides), _pair(self.padding))
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


def pack_block_diag(w_a, b_a, w_b, b_b):
    """Assemble one block-diagonal HWIO kernel computing two independent
    convs (same k/s/p) over channel-concatenated inputs in a single call:
    ``conv(concat([xa, xb]), W)[..., :co_a] == conv(xa, w_a)`` etc.

    The cross blocks are exact zeros, so every extra product is an exact
    zero added into the accumulator — value-preserving up to accumulation
    order (bitwise in f32 zeros-math; measured ≤1-2 ulp in bf16). Packing
    the two small-channel encoder convs into one call roughly doubles MXU
    lane utilization: measured 6.17→3.22 ms (conv1 pair) and 6.66→2.90 ms
    (conv2 pair) fwd+input-grad at ShadingNet shapes, B=132 bf16
    (tools/smallconv_bench.py part2)."""
    kh, kw, ci_a, co_a = w_a.shape
    _, _, ci_b, co_b = w_b.shape
    za = jnp.zeros((kh, kw, ci_a, co_b), w_a.dtype)
    zb = jnp.zeros((kh, kw, ci_b, co_a), w_b.dtype)
    w = jnp.concatenate([jnp.concatenate([w_a, za], axis=3),
                         jnp.concatenate([zb, w_b], axis=3)], axis=2)
    b = None
    if b_a is not None:
        b = jnp.concatenate([b_a, b_b])
    return w, b


def packed_which(flag) -> tuple:
    """Normalize a ``packed_encoder`` knob value to the pair indices to
    pack: True → both pairs, 'enc1'/'enc2' → only that pair (the
    finer-grained A/B VERDICT r3 #6 asks for — conv2/conv2_s is the single
    biggest lane-starved layer, and packing only it avoids the conv1-pair
    layout churn the all-on variant pays), False/None → none."""
    if flag is True:
        return (1, 2)
    if flag in ("enc1", "enc2"):
        return (int(flag[-1]),)
    if flag:
        # an unrecognized truthy value ('enc3', 'both', 1, ...) must not
        # silently select the unpacked path — an A/B harness would then
        # measure the baseline and report it as the packed variant
        raise ValueError(
            f"packed_encoder={flag!r}: expected True, False, None, "
            "'enc1' or 'enc2'")
    return ()


def packed_encoder_forward(net, x, s, which=(1, 2)):
    """The shared CompenNet/ShadingNetSPAA two-branch encoder with the
    (conv1, conv1_s) and/or (conv2, conv2_s) pairs (``which``) folded into
    single block-diagonal convs (``pack_block_diag`` — value-preserving,
    both branches computed in one MXU pass). ``net`` provides conv1/conv2
    (and the ``_s`` twins) as ``Conv2dTorchE`` plus conv3/conv4 pairs and
    skip2/skip3; ``x``/``s`` are the main and surface inputs,
    broadcast-compatible on the batch axis. Returns ``(h, res2, res3)`` —
    the encoder output and the two skip taps, exactly as the unpacked
    path computes them."""
    pairs = ((net.conv1, net.conv1_s), (net.conv2, net.conv2_s))
    for k in which:
        a, b = pairs[k - 1]
        if (_pair(a.strides), _pair(a.padding)) != \
                (_pair(b.strides), _pair(b.padding)):
            raise ValueError("packed encoder requires matching stride/"
                             "padding in each (conv, conv_s) pair")
    bsz = max(x.shape[0], s.shape[0])
    x = jnp.broadcast_to(x, (bsz,) + x.shape[1:])
    s = jnp.broadcast_to(s, (bsz,) + s.shape[1:])
    if 1 in which:
        co1 = net.conv1.features
        w1, b1 = pack_block_diag(net.conv1.kernel, net.conv1.bias,
                                 net.conv1_s.kernel, net.conv1_s.bias)
        y = conv2d_nhwc(jnp.concatenate([x, s], -1), w1, b1,
                        _pair(net.conv1.strides), _pair(net.conv1.padding))
        r1 = nn.relu(y[..., co1:])
        h = nn.relu(y[..., :co1] + r1)
    else:
        r1 = nn.relu(net.conv1_s(s))
        h = nn.relu(net.conv1(x) + r1)
    res2 = net.skip2(h)
    if 2 in which:
        co2 = net.conv2.features
        w2, b2 = pack_block_diag(net.conv2.kernel, net.conv2.bias,
                                 net.conv2_s.kernel, net.conv2_s.bias)
        y = conv2d_nhwc(jnp.concatenate([h, r1], -1), w2, b2,
                        _pair(net.conv2.strides), _pair(net.conv2.padding))
        r2 = nn.relu(y[..., co2:])
        h = nn.relu(y[..., :co2] + r2)
    else:
        r2 = nn.relu(net.conv2_s(r1))
        h = nn.relu(net.conv2(h) + r2)
    res3 = net.skip3(h)
    r3 = nn.relu(net.conv3_s(r2))
    h = nn.relu(net.conv3(h) + r3)
    r4 = nn.relu(net.conv4_s(r3))
    h = nn.relu(net.conv4(h) + r4)
    return h, res2, res3


class Conv2dTorch(nn.Module):
    """NHWC conv matching torch ``nn.Conv2d(cin, cout, k, s, p)``.

    kernel stored HWIO. ``kernel_init`` defaults to kaiming-normal (the
    reference's ``_initialize_weights``); bias uses torch's default uniform.
    """
    features: int
    kernel_size: int | Sequence[int]
    strides: int | Sequence[int] = 1
    padding: int | Sequence[int] = 0
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = kaiming_normal_torch

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (kh, kw, cin, self.features))
        bias = None
        if self.use_bias:
            bias = self.param("bias", _bias_init_for(kh * kw * cin),
                              (self.features,))
        return conv2d_nhwc(x, kernel, bias, _pair(self.strides),
                           _pair(self.padding))


class Conv2dTorchE(nn.Module):
    """``Conv2dTorch`` with explicit ``in_features`` and setup-declared
    params: a parent module can then read ``.kernel``/``.bias`` directly
    (e.g. to assemble a block-diagonal packed kernel, ``pack_block_diag``)
    without calling the conv. Identical math, param names, shapes, and
    init values (same scope path + initializer), so checkpoints and the
    torch weight converter are unaffected."""
    features: int
    in_features: int
    kernel_size: int | Sequence[int]
    strides: int | Sequence[int] = 1
    padding: int | Sequence[int] = 0
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = kaiming_normal_torch
    # Backward-data via conv2d_taps_bwd (small-Cin lane-starvation fix;
    # identical forward, reordered-accumulation igrad, same wgrad rule).
    taps_bwd: bool = False

    def setup(self):
        kh, kw = _pair(self.kernel_size)
        self.kernel = self.param("kernel", self.kernel_init,
                                 (kh, kw, self.in_features, self.features))
        self.bias = (self.param("bias",
                                _bias_init_for(kh * kw * self.in_features),
                                (self.features,))
                     if self.use_bias else None)

    def __call__(self, x):
        if x.shape[-1] != self.in_features:
            raise ValueError(f"expected {self.in_features} input channels, "
                             f"got {x.shape[-1]}")
        if self.taps_bwd:
            y = conv2d_taps_bwd(x, self.kernel, _pair(self.strides),
                                _pair(self.padding))
            return y if self.bias is None else y + self.bias.astype(y.dtype)
        return conv2d_nhwc(x, self.kernel, self.bias, _pair(self.strides),
                           _pair(self.padding))


class ConvTranspose2dTorch(nn.Module):
    """NHWC transposed conv matching torch
    ``nn.ConvTranspose2d(cin, cout, k, s, p, output_padding)``.

    Implemented as a fractionally-strided conv (lhs_dilation = stride) with
    a spatially flipped kernel and per-side padding k-1-p (+output_padding
    on the bottom/right) — the exact torch output: (H-1)s - 2p + k + op.
    """
    features: int
    kernel_size: int | Sequence[int]
    strides: int | Sequence[int] = 1
    padding: int | Sequence[int] = 0
    output_padding: int | Sequence[int] = 0
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = torch_conv_default_kernel_init
    # Subpixel (pixel-shuffle) form of the k == s, p = 0, op = 0 transposed
    # conv: each output pixel then depends on exactly ONE input pixel, so
    # the rewrite is value-preserving (bitwise-equal output measured in
    # bf16). ISOLATED vs IN-CONTEXT verdicts differ — default is OFF:
    # timed alone (K chained applications of just this layer) the subpix
    # GEMM is 3.4-5x faster than the dilated conv at ShadingNet's
    # transConv2 shapes (tools/smallconv_bench.py), but inside the full
    # PCNet fwd+grad programs it makes the WHOLE program 3-16% slower
    # (tools/incontext_ab.py: XLA's layout assignment around the
    # einsum+depth-to-space inserts transposes that cost more than the
    # layer saves). None/False = dilated lhs_dilation form; True = subpix
    # (only valid for the k==s, p=0, op=0 case).
    subpix: bool | None = None

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.strides)
        ph, pw = _pair(self.padding)
        oph, opw = _pair(self.output_padding)
        cin = x.shape[-1]
        # stored like a forward conv kernel HWIO with I=cin (the torch
        # (cin, cout, kh, kw) tensor transposed+flipped at convert time)
        kernel = self.param("kernel", self.kernel_init, (kh, kw, cin, self.features))
        subpix_ok = ((kh, kw) == (sh, sw) and (ph, pw) == (0, 0)
                     and (oph, opw) == (0, 0))
        use_subpix = bool(self.subpix)
        if use_subpix:
            if not subpix_ok:
                raise ValueError(
                    "subpix=True requires kernel_size == strides, padding=0, "
                    "output_padding=0 (the value-preserving case)")
            # out[sy*y+py, sx*x+px, co] = sum_ci x[y, x, ci] * kernel[py, px,
            # ci, co]: one einsum over phase-stacked kernels, interleaved by
            # depth-to-space. Stored kernel is the torch tensor UNflipped in
            # HWIO, so no flip here (the dilated path flips only to express
            # the transpose as a forward conv).
            w = kernel.reshape(kh * kw, cin, self.features)
            y = jnp.einsum("bhwc,pcf->bhwpf", x, w)
            b_, hh, ww = y.shape[:3]
            y = y.reshape(b_, hh, ww, kh, kw, self.features)
            y = y.transpose(0, 1, 3, 2, 4, 5)
            y = y.reshape(b_, hh * kh, ww * kw, self.features)
        else:
            flipped = jnp.flip(kernel, axis=(0, 1))
            dn = jax.lax.conv_dimension_numbers(x.shape, flipped.shape,
                                                ("NHWC", "HWIO", "NHWC"))
            pad = ((kh - 1 - ph, kh - 1 - ph + oph),
                   (kw - 1 - pw, kw - 1 - pw + opw))
            y = jax.lax.conv_general_dilated(
                x, flipped, (1, 1), pad, lhs_dilation=(sh, sw),
                dimension_numbers=dn)
        if self.use_bias:
            bias = self.param("bias", _bias_init_for(kh * kw * self.features),
                              (self.features,))
            y = y + bias
        return y
