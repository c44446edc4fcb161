"""Measure: XLA base-dilated transposed conv vs subpixel (pixel-shuffle)
decomposition, at ShadingNet's two deconv shapes on the current backend.

The stride-2 transposed convs (transConv1 k3s2p1op1 128->64 @60x80,
transConv2 k2s2 64->32 @120x160) are implemented as lhs_dilated convs
(layers.py). A base-dilated conv multiplies against inserted zeros (only
~1/4 of taps are live in 2-D stride 2); the subpixel form computes each of
the 4 output phases with the live kernel slice only, then interleaves.
If XLA doesn't already rewrite the dilated form, subpixel saves ~4x the
MACs on these layers. This script checks numerics AND wall-clock.

SUPERSEDED: this script times each variant with PER-DISPATCH calls, which
the axon tunnel's ~8 ms dispatch latency dominates — its round-2 "subpix
loses" conclusion was an artifact. tools/smallconv_bench.py re-measures
with K chained applications per program: subpix wins 3.4x (attack shape,
bf16, fwd+input-grad) and 5x (train shape, f32, full grads) for transConv2
(k2s2), and loses for transConv1 (k3s2p1op1). BUT tools/incontext_ab.py
then showed the subpix form makes the FULL PCNet fwd+grad programs 3-16%
slower (XLA layout/fusion interactions), so it is an opt-in knob
(ConvTranspose2dTorch(subpix=True), valid only for k==s, p=0, op=0) and
OFF by default.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def force(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def timeit(f, *a, n=10, warmup=2):
    for _ in range(warmup):
        force(f(*a))
    t0 = time.time()
    for _ in range(n):
        r = f(*a)
    force(r)
    return (time.time() - t0) / n


def transposed_dilated(x, kernel, s, p, op):
    kh, kw = kernel.shape[:2]
    flipped = jnp.flip(kernel, axis=(0, 1))
    dn = jax.lax.conv_dimension_numbers(x.shape, flipped.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    pad = ((kh - 1 - p, kh - 1 - p + op), (kw - 1 - p, kw - 1 - p + op))
    return jax.lax.conv_general_dilated(x, flipped, (1, 1), pad,
                                        lhs_dilation=(s, s),
                                        dimension_numbers=dn)


def transposed_subpixel(x, kernel, s, p, op):
    """Phase decomposition of the same operator (exact same products)."""
    kh, kw, cin, cout = kernel.shape
    n, h, w, _ = x.shape
    oh = (h - 1) * s - 2 * p + kh + op
    ow = (w - 1) * s - 2 * p + kw + op
    assert oh % s == 0 and ow % s == 0, "phase sizes must be uniform"
    flipped = jnp.flip(kernel, axis=(0, 1))
    base_h = kh - 1 - p
    base_w = kw - 1 - p
    phases = []
    for r in range(s):
        row = []
        for c in range(s):
            # output index i = s*u + r reads flipped[t] * D[i - base + t];
            # D[m] nonzero iff m % s == 0 (then = x[m // s])
            th = [t for t in range(kh) if (r - base_h + t) % s == 0]
            tw = [t for t in range(kw) if (c - base_w + t) % s == 0]
            # input offsets for u=0
            uh = [(r - base_h + t) // s for t in th]
            uw = [(c - base_w + t) // s for t in tw]
            sub = flipped[jnp.asarray(th)][:, jnp.asarray(tw)]
            # conv over x with this |th| x |tw| kernel; pad so that output
            # u reads x[u + uh[0]] .. x[u + uh[-1]]
            ph_lo = max(-uh[0], 0)
            ph_hi = max((oh // s - 1) + uh[-1] - (h - 1), 0)
            pw_lo = max(-uw[0], 0)
            pw_hi = max((ow // s - 1) + uw[-1] - (w - 1), 0)
            dn = jax.lax.conv_dimension_numbers(x.shape, sub.shape,
                                                ("NHWC", "HWIO", "NHWC"))
            start_h = uh[0] + ph_lo
            start_w = uw[0] + pw_lo
            y = jax.lax.conv_general_dilated(
                x, sub, (1, 1), ((ph_lo, ph_hi), (pw_lo, pw_hi)),
                dimension_numbers=dn)
            y = jax.lax.dynamic_slice_in_dim(y, start_h, oh // s, axis=1)
            y = jax.lax.dynamic_slice_in_dim(y, start_w, ow // s, axis=2)
            row.append(y)
        phases.append(row)
    # interleave: [n, oh/s, ow/s, cout] x s x s -> [n, oh, ow, cout]
    stacked = jnp.stack([jnp.stack(row, axis=0) for row in phases], axis=0)
    # [s_r, s_c, n, oh/s, ow/s, cout] -> [n, oh/s, s_r, ow/s, s_c, cout]
    stacked = jnp.transpose(stacked, (2, 3, 0, 4, 1, 5))
    return stacked.reshape(n, oh, ow, cout)


def main():
    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    cases = [
        ("transConv1 k3s2p1op1 128->64 @60x80x132", (132, 60, 80, 128),
         (3, 3, 128, 64), 2, 1, 1),
        ("transConv2 k2s2 64->32 @120x160x132", (132, 120, 160, 64),
         (2, 2, 64, 32), 2, 0, 0),
    ]
    for dtype in (jnp.float32, jnp.bfloat16):
        print(f"--- dtype {dtype.__name__} ---")
        for name, xs, ks, s, p, op in cases:
            x = jnp.asarray(rng.random(xs, np.float32), dtype)
            k = jnp.asarray(rng.random(ks, np.float32) - 0.5, dtype)
            f_d = jax.jit(lambda x, k, _s=s, _p=p, _op=op:
                          transposed_dilated(x, k, _s, _p, _op))
            f_s = jax.jit(lambda x, k, _s=s, _p=p, _op=op:
                          transposed_subpixel(x, k, _s, _p, _op))
            yd = np.asarray(f_d(x, k), np.float32)
            ys = np.asarray(f_s(x, k), np.float32)
            err = np.abs(yd - ys).max() / max(np.abs(yd).max(), 1e-6)
            td = timeit(f_d, x, k)
            ts = timeit(f_s, x, k)
            print(f"{name}: dilated {td*1e3:7.2f} ms | subpixel "
                  f"{ts*1e3:7.2f} ms | rel-err {err:.2e}")
            # backward wrt input (the attack pullback direction)
            g_d = jax.jit(lambda x, k: jax.grad(
                lambda q: jnp.sum(transposed_dilated(q, k, s, p, op)
                                  .astype(jnp.float32)))(x))
            g_s = jax.jit(lambda x, k: jax.grad(
                lambda q: jnp.sum(transposed_subpixel(q, k, s, p, op)
                                  .astype(jnp.float32)))(x))
            tdb = timeit(g_d, x, k)
            tsb = timeit(g_s, x, k)
            print(f"{name}: bwd(x) dilated {tdb*1e3:7.2f} ms | subpixel "
                  f"{tsb*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
