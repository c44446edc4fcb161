"""Alternative XLA formulations for the small-channel convs.

tools/layer_profile.py shows ShadingNet's small-channel layers (conv1,
conv1_s, conv2, conv6, skip1 chain, tconv2) run at 0.2-25 TF/s — far from
both the MXU and the HBM streaming floor — while the wide layers already
sit near peak. Before reaching for Pallas, this measures whether plain-XLA
rewrites close the gap:

  - outpad : zero-pad C_out to a lane-friendlier width, slice after
             (adds exact-zero output channels — values bitwise preserved)
  - inpad  : zero-pad C_in on both input and kernel (adds exact-zero
             products into the f32 accumulator)
  - s2d    : space-to-depth the stride-2 convs into stride-1 convs with
             4x the input channels and a 2x2 kernel (same products,
             different accumulation order -> ulp-level in bf16)
  - subpix : 4-phase pixel-shuffle form of the k2s2 transposed conv
             (re-test of tools/transconv_bench.py with CHAINED timing;
             the round-2 negative result used per-dispatch timing, which
             the ~8 ms tunnel dispatch latency dominates)

Each variant is timed as K chained applications in ONE program and checked
numerically against the baseline. Run on TPU: python tools/smallconv_bench.py
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def force(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0])


K = 20


def conv(x, w, stride=1, pad=1, lhs_dilation=None, pad2=None):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    padding = pad2 if pad2 is not None else ((pad, pad), (pad, pad))
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        lhs_dilation=lhs_dilation, dimension_numbers=dn)


def chain_time(fn, x, n=3):
    """K applications in one program; carry perturbs the input."""
    dt = x.dtype

    def run(q):
        def body(i, c):
            y = fn(q + c)
            return jnp.max(jnp.abs(y)).astype(dt) * jnp.asarray(1e-8, dt)
        return jax.lax.fori_loop(0, K, body, jnp.zeros((), dt))

    j = jax.jit(run)
    force(j(x))
    t0 = time.time()
    for _ in range(n):
        r = j(x)
    force(r)
    return (time.time() - t0) / n / K


def chain_time_grad(fn, x, n=3):
    dt = x.dtype

    def run(q):
        def body(i, c):
            g = jax.grad(lambda z: 0.5 * jnp.sum(
                jnp.square(fn(z).astype(jnp.float32))))(q + c)
            return jnp.max(jnp.abs(g)).astype(dt) * jnp.asarray(1e-8, dt)
        return jax.lax.fori_loop(0, K, body, jnp.zeros((), dt))

    j = jax.jit(run)
    force(j(x))
    t0 = time.time()
    for _ in range(n):
        r = j(x)
    force(r)
    return (time.time() - t0) / n / K


def report(name, fn, x, base_out=None):
    y = np.asarray(jax.jit(fn)(x), np.float32)
    err = 0.0 if base_out is None else float(np.max(np.abs(y - base_out)))
    tf = chain_time(fn, x)
    tb = chain_time_grad(fn, x)
    print(f"  {name:28s} fwd {1e3*tf:6.2f} ms   fwd+igrad {1e3*tb:6.2f} ms   maxerr {err:.2e}",
          flush=True)
    return y


def s2d(x):
    """[B,H,W,C] -> [B,H/2,W/2,4C] with phase-major channel blocks."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def s2d_kernel(w):
    """3x3 stride-2 pad-1 kernel -> 2x2 stride-1 kernel over s2d input.

    out(y,x) = sum_{a,b} W[a,b] in(2y+a-1, 2x+b-1); s2d runs on the
    1-padded input (inP(i) = in(i-1)), so with in2 the s2d tensor
    (phase-major blocks (py,px)), a = 2ky+py (ky in {0,1}), same for b —
    a=3 taps don't exist and stay zero.
    """
    cin, cout = w.shape[2], w.shape[3]
    w2 = np.zeros((2, 2, 4 * cin, cout), np.float32)
    for ky in range(2):
        for kx in range(2):
            for py in range(2):
                for px in range(2):
                    a, b = 2 * ky + py, 2 * kx + px
                    if 0 <= a < 3 and 0 <= b < 3:
                        blk = (py * 2 + px) * cin
                        w2[ky, kx, blk:blk + cin, :] = w[a, b]
    return w2


def main():
    dt = jnp.bfloat16
    B, H, W = 132, 240, 320
    h2, w2 = H // 2, W // 2
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} B={B} K={K} dtype=bfloat16")
    force(jnp.zeros(1))

    # ---------------- conv6: 32->3 3x3 @240 ----------------
    print("conv6  32->3 3x3 @240x320")
    x = jnp.asarray(rng.random((B, H, W, 32), np.float32), dt)
    w6 = rng.normal(0, 0.05, (3, 3, 32, 3)).astype(np.float32)
    base = report("base", lambda q: conv(q, jnp.asarray(w6, dt)), x)
    for co in (8, 16, 128):
        wp = np.zeros((3, 3, 32, co), np.float32)
        wp[..., :3] = w6
        report(f"outpad{co}+slice",
               lambda q, wp=wp: conv(q, jnp.asarray(wp, dt))[..., :3], x, base)

    # ---------------- conv1: 3->32 s2 @240 ----------------
    print("conv1  3->32 3x3 s2 @240x320")
    x = jnp.asarray(rng.random((B, H, W, 3), np.float32), dt)
    w1 = rng.normal(0, 0.1, (3, 3, 3, 32)).astype(np.float32)
    base = report("base", lambda q: conv(q, jnp.asarray(w1, dt), stride=2), x)
    for ci in (4, 8, 16):
        wp = np.zeros((3, 3, ci, 32), np.float32)
        wp[:, :, :3] = w1
        report(f"inpad{ci}",
               lambda q, wp=wp, ci=ci: conv(
                   jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, ci - 3))),
                   jnp.asarray(wp, dt), stride=2), x, base)
    w1s = s2d_kernel(w1)
    report("s2d (2x2 k, 12ch)",
           lambda q: conv(s2d(jnp.pad(q, ((0, 0), (1, 1), (1, 1), (0, 0)))),
                          jnp.asarray(w1s, dt), stride=1, pad2=((0, 1), (0, 1)))[:, :h2, :w2],
           x, base)

    # ---------------- conv2: 32->64 s2 @120 ----------------
    print("conv2  32->64 3x3 s2 @120x160")
    x = jnp.asarray(rng.random((B, h2, w2, 32), np.float32), dt)
    wc2 = rng.normal(0, 0.05, (3, 3, 32, 64)).astype(np.float32)
    base = report("base", lambda q: conv(q, jnp.asarray(wc2, dt), stride=2), x)
    wc2s = s2d_kernel(wc2)
    report("s2d (2x2 k, 128ch)",
           lambda q: conv(s2d(jnp.pad(q, ((0, 0), (1, 1), (1, 1), (0, 0)))),
                          jnp.asarray(wc2s, dt), stride=1, pad2=((0, 1), (0, 1)))[:, :h2 // 2, :w2 // 2],
           x, base)

    # ---------------- skip1b: 3->3 3x3 @240 ----------------
    print("skip1b  3->3 3x3 @240x320")
    x = jnp.asarray(rng.random((B, H, W, 3), np.float32), dt)
    ws = rng.normal(0, 0.2, (3, 3, 3, 3)).astype(np.float32)
    base = report("base", lambda q: conv(q, jnp.asarray(ws, dt)), x)
    wp = np.zeros((3, 3, 8, 8), np.float32)
    wp[:, :, :3, :3] = ws
    report("pad 8->8+slice",
           lambda q: conv(jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, 5))),
                          jnp.asarray(wp, dt))[..., :3], x, base)

    # ---------------- tconv2: 64->32 k2 s2 @120->240 ----------------
    print("tconv2  64->32 k2 s2 @120x160 -> 240x320")
    x = jnp.asarray(rng.random((B, h2, w2, 64), np.float32), dt)
    wt = rng.normal(0, 0.05, (2, 2, 64, 32)).astype(np.float32)

    def tconv_base(q):
        flipped = jnp.flip(jnp.asarray(wt, dt), axis=(0, 1))
        return conv(q, flipped, stride=1, pad2=((1, 1), (1, 1)),
                    lhs_dilation=(2, 2))

    base = report("base (lhs_dilation)", tconv_base, x)

    def tconv_subpix(q):
        # k2 s2 p0: out(2y+py, 2x+px) = W[py, px] . in(y, x) — each phase
        # is a 1x1 conv; interleave via depth-to-space
        w4 = jnp.stack([jnp.asarray(wt[py, px], dt)
                        for py in range(2) for px in range(2)], axis=0)  # [4,64,32]
        y = jnp.einsum("bhwc,pco->bhwpo", q, w4)
        b, hh, ww, _, co = y.shape
        y = y.reshape(b, hh, ww, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(b, hh * 2, ww * 2, co)

    report("subpix (4x 1x1 + d2s)", tconv_subpix, x, base)

    print("done")


def part2():
    """Round 2: pair packing, tconv1 subpix, phase-space conv6."""
    dt = jnp.bfloat16
    B, H, W = 132, 240, 320
    h2, w2 = H // 2, W // 2
    h4, w4 = H // 4, W // 4
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} B={B} K={K} dtype=bfloat16 [part2]")
    force(jnp.zeros(1))

    # ---- pack conv1 (3->32) + conv1_s (6->32): one block-diag 9->64 ----
    print("conv1+conv1_s pair @240 s2")
    x1 = jnp.asarray(rng.random((B, H, W, 3), np.float32), dt)
    xs = jnp.asarray(rng.random((B, H, W, 6), np.float32), dt)
    w1 = rng.normal(0, 0.1, (3, 3, 3, 32)).astype(np.float32)
    ws = rng.normal(0, 0.1, (3, 3, 6, 32)).astype(np.float32)

    def pair_base(q):
        a, b = q[..., :3], q[..., 3:]
        return jnp.concatenate([conv(a, jnp.asarray(w1, dt), stride=2),
                                conv(b, jnp.asarray(ws, dt), stride=2)], -1)

    xin = jnp.concatenate([x1, xs], axis=-1)
    base = report("2 separate convs", pair_base, xin)

    wpk = np.zeros((3, 3, 9, 64), np.float32)
    wpk[:, :, :3, :32] = w1
    wpk[:, :, 3:, 32:] = ws

    report("packed block-diag 9->64",
           lambda q: conv(q, jnp.asarray(wpk, dt), stride=2), xin, base)

    # ---- pack conv2 + conv2_s: block-diag 64->128 s2 @120 ----
    print("conv2+conv2_s pair @120 s2")
    xin = jnp.asarray(rng.random((B, h2, w2, 64), np.float32), dt)
    wa = rng.normal(0, 0.05, (3, 3, 32, 64)).astype(np.float32)
    wb = rng.normal(0, 0.05, (3, 3, 32, 64)).astype(np.float32)

    def pair2_base(q):
        return jnp.concatenate([conv(q[..., :32], jnp.asarray(wa, dt), stride=2),
                                conv(q[..., 32:], jnp.asarray(wb, dt), stride=2)], -1)

    base = report("2 separate convs", pair2_base, xin)
    wpk2 = np.zeros((3, 3, 64, 128), np.float32)
    wpk2[:, :, :32, :64] = wa
    wpk2[:, :, 32:, 64:] = wb

    report("packed block-diag 64->128",
           lambda q: conv(q, jnp.asarray(wpk2, dt), stride=2), xin, base)

    # ---- tconv1: k3 s2 p1 op1 128->64 @60x80 -> 120x160 ----
    print("tconv1  128->64 k3 s2 p1 op1 @60x80 -> 120x160")
    x = jnp.asarray(rng.random((B, h4, w4, 128), np.float32), dt)
    wt = rng.normal(0, 0.05, (3, 3, 128, 64)).astype(np.float32)

    def t1_base(q):
        flipped = jnp.flip(jnp.asarray(wt, dt), axis=(0, 1))
        return conv(q, flipped, stride=1, pad2=((1, 2), (1, 2)),
                    lhs_dilation=(2, 2))

    base = report("base (lhs_dilation)", t1_base, x)

    def t1_subpix(q):
        # out(2m+r): r=0 -> tap k=1 (y=m); r=1 -> taps k∈{2,0} (y∈{m,m+1});
        # per 2-D phase (ry,rx) a tiny valid conv, inputs padded at the end
        w = jnp.asarray(wt, dt)
        rowidx = {0: [1], 1: [2, 0]}              # W row index per y' offset
        qp = jnp.pad(q, ((0, 0), (0, 1), (0, 1), (0, 0)))
        phases = []
        for ry in range(2):
            for rx in range(2):
                iy, ix = rowidx[ry], rowidx[rx]
                kr = w[jnp.asarray(iy)][:, jnp.asarray(ix)]  # [ly,lx,cin,cout]
                ph = conv(qp[:, :h4 + len(iy) - 1, :w4 + len(ix) - 1],
                          kr, stride=1, pad2=((0, 0), (0, 0)))
                phases.append(ph)
        y = jnp.stack(phases, axis=3)  # [B,h,w,4,cout], phase-major (ry,rx)
        b, hh, ww, _, co = y.shape
        y = y.reshape(b, hh, ww, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(b, hh * 2, ww * 2, co)

    report("subpix (4 phase convs)", t1_subpix, x, base)

    # ---- up-path: tconv2+relu+conv6 vs phase-space form ----
    print("up-path: tconv2(64->32 k2 s2) + relu + conv6(32->3) @120->240")
    x = jnp.asarray(rng.random((B, h2, w2, 64), np.float32), dt)
    wt2 = rng.normal(0, 0.05, (2, 2, 64, 32)).astype(np.float32)
    w6 = rng.normal(0, 0.05, (3, 3, 32, 3)).astype(np.float32)

    def up_base(q):
        flipped = jnp.flip(jnp.asarray(wt2, dt), axis=(0, 1))
        t = conv(q, flipped, stride=1, pad2=((1, 1), (1, 1)), lhs_dilation=(2, 2))
        t = jax.nn.relu(t)
        return conv(t, jnp.asarray(w6, dt))

    base = report("base (dilated + conv)", up_base, x)

    # phase tensor: [B,h2,w2,4*32] with phase-major blocks (py,px)
    w4p = np.concatenate([wt2[py, px] for py in range(2) for px in range(2)],
                         axis=1)  # [64, 4*32]
    w6p = s2d_kernel(w6)          # [2,2,4*32,3] consumes the phase tensor

    del w6p
    # cost proxy: the composed op is one k2 conv 128(phase)->12(4 output
    # phases x 3) + d2s; a random kernel times the same program shape (the
    # exact per-phase kernel derivation happens at implementation time)
    wall = rng.normal(0, 0.05, (2, 2, 128, 12)).astype(np.float32)

    def up_phase_full(q):
        t = jnp.einsum("bhwc,cp->bhwp", q, jnp.asarray(w4p, dt))
        t = jax.nn.relu(t)
        tp = jnp.pad(t, ((0, 0), (0, 1), (0, 1), (0, 0)))
        y = conv(tp, jnp.asarray(wall, dt), stride=1, pad2=((0, 0), (0, 0)))
        b, hh, ww, _ = y.shape
        y = y.reshape(b, hh, ww, 2, 2, 3).transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(b, hh * 2, ww * 2, 3)

    report("phase-space (shape-only)", up_phase_full, x)




def part3():
    """Round 3: TRAIN-shaped timings (B=24, f32, full grads incl. weights)
    for the variants adopted after part1/part2 — the part1/2 numbers were
    attack-shaped (B=132, bf16, input-grad only); training differs in all
    three dimensions, so validate the rewrites there before keeping them
    in the train path."""
    dt = jnp.float32
    B, H, W = 24, 240, 320
    h2, w2 = H // 2, W // 2
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} B={B} K={K} dtype=f32 [part3]")
    force(jnp.zeros(1))

    def chain_time_allgrad(fn, params, x, n=3):
        def run(q, ps):
            def body(i, c):
                def loss(ps2):
                    return 0.5 * jnp.sum(jnp.square(fn(ps2, q + c)))
                l, g = jax.value_and_grad(loss)(ps)
                gm = sum(jnp.max(jnp.abs(t)) for t in jax.tree.leaves(g))
                return gm.astype(dt) * jnp.asarray(1e-8, dt)
            return jax.lax.fori_loop(0, K, body, jnp.zeros((), dt))
        j = jax.jit(run)
        force(j(x, params))
        t0 = time.time()
        for _ in range(n):
            r = j(x, params)
        force(r)
        return (time.time() - t0) / n / K

    # ---- tconv2 64->32 k2 s2 @120->240: base vs subpix, full grads ----
    print("tconv2 64->32 k2 s2 @120->160 (train shape)")
    x = jnp.asarray(rng.random((B, h2, w2, 64), np.float32), dt)
    wt = jnp.asarray(rng.normal(0, 0.05, (2, 2, 64, 32)), dt)

    def t2_base(ps, q):
        flipped = jnp.flip(ps["w"], axis=(0, 1))
        return conv(q, flipped, stride=1, pad2=((1, 1), (1, 1)),
                    lhs_dilation=(2, 2))

    def t2_subpix(ps, q):
        w4 = ps["w"].reshape(4, 64, 32)
        y = jnp.einsum("bhwc,pcf->bhwpf", q, w4)
        b, hh, ww, _, co = y.shape
        y = y.reshape(b, hh, ww, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(b, hh * 2, ww * 2, co)

    for name, fn in [("base (lhs_dilation)", t2_base), ("subpix", t2_subpix)]:
        t = chain_time_allgrad(fn, {"w": wt}, x)
        print(f"  {name:28s} fwd+allgrad {1e3*t:6.2f} ms", flush=True)

    # ---- conv1 pair @240 s2, full grads ----
    print("conv1+conv1_s pair @240 s2 (train shape)")
    xin = jnp.asarray(rng.random((B, H, W, 9), np.float32), dt)
    w1 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 32)), dt)
    ws = jnp.asarray(rng.normal(0, 0.1, (3, 3, 6, 32)), dt)

    def pair_sep(ps, q):
        return jnp.concatenate([conv(q[..., :3], ps["a"], stride=2),
                                conv(q[..., 3:], ps["b"], stride=2)], -1)

    def pair_packed(ps, q):
        za = jnp.zeros((3, 3, 3, 32), dt)
        zb = jnp.zeros((3, 3, 6, 32), dt)
        w = jnp.concatenate([jnp.concatenate([ps["a"], za], 3),
                             jnp.concatenate([zb, ps["b"]], 3)], 2)
        return conv(q, w, stride=2)

    for name, fn in [("2 separate convs", pair_sep),
                     ("packed block-diag", pair_packed)]:
        t = chain_time_allgrad(fn, {"a": w1, "b": ws}, xin)
        print(f"  {name:28s} fwd+allgrad {1e3*t:6.2f} ms", flush=True)

    # ---- conv2 pair @120 s2, full grads ----
    print("conv2+conv2_s pair @120 s2 (train shape)")
    xin = jnp.asarray(rng.random((B, h2, w2, 64), np.float32), dt)
    wa = jnp.asarray(rng.normal(0, 0.05, (3, 3, 32, 64)), dt)
    wb = jnp.asarray(rng.normal(0, 0.05, (3, 3, 32, 64)), dt)

    def pair2_sep(ps, q):
        return jnp.concatenate([conv(q[..., :32], ps["a"], stride=2),
                                conv(q[..., 32:], ps["b"], stride=2)], -1)

    def pair2_packed(ps, q):
        za = jnp.zeros((3, 3, 32, 64), dt)
        w = jnp.concatenate([jnp.concatenate([ps["a"], za], 3),
                             jnp.concatenate([za, ps["b"]], 3)], 2)
        return conv(q, w, stride=2)

    for name, fn in [("2 separate convs", pair2_sep),
                     ("packed block-diag", pair2_packed)]:
        t = chain_time_allgrad(fn, {"a": wa, "b": wb}, xin)
        print(f"  {name:28s} fwd+allgrad {1e3*t:6.2f} ms", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "2":
        part2()
    elif len(sys.argv) > 1 and sys.argv[1] == "3":
        part3()
    else:
        main()
