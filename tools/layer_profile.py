"""Per-layer timing of ShadingNetSPAA at attack shapes (bf16, B=132).

The whole-program ablation (tools/attack_ablation.py) shows PCNet
fwd+pullback is ~62% of the SPAA iteration at a uniform ~22% MXU rate.
This profiler breaks that down per layer (fwd and fwd + input-grad) so
optimization effort lands on the real hotspots instead of the FLOP
distribution.

Each measurement is ONE jitted program chaining K applications through a
``fori_loop`` whose carry feeds the next input (axon iron rule: per-call
dispatch latency is ~8 ms and swamps any single layer; see CLAUDE.md
rule 6). Run on the TPU: ``python tools/layer_profile.py [B] [K]``.
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def force(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def main():
    from spaa_tpu.models.layers import Conv2dTorch, ConvTranspose2dTorch
    from spaa_tpu.utils.jaxtools import host_init

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 132
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    dt = jnp.bfloat16
    H, W = 240, 320
    h2, w2 = H // 2, W // 2
    h4, w4 = H // 4, W // 4
    print(f"backend={jax.default_backend()} B={B} K={K} dtype={dt.__name__}")

    rng = np.random.default_rng(0)
    # warm the tunnel before timing anything (CLAUDE.md iron rule 6)
    force(jnp.zeros(1))

    def cflop(h, w, k, cin, cout, bs):
        return 2.0 * bs * h * w * k * k * cin * cout

    specs = [
        ("conv1    3->32 s2 @240", Conv2dTorch(32, 3, 2, 1), (B, H, W, 3), cflop(h2, w2, 3, 3, 32, B)),
        ("conv1_s  6->32 s2 @240", Conv2dTorch(32, 3, 2, 1), (B, H, W, 6), cflop(h2, w2, 3, 6, 32, B)),
        ("conv2   32->64 s2 @120", Conv2dTorch(64, 3, 2, 1), (B, h2, w2, 32), cflop(h4, w4, 3, 32, 64, B)),
        ("conv3   64->128   @60 ", Conv2dTorch(128, 3, 1, 1), (B, h4, w4, 64), cflop(h4, w4, 3, 64, 128, B)),
        ("conv4  128->256   @60 ", Conv2dTorch(256, 3, 1, 1), (B, h4, w4, 128), cflop(h4, w4, 3, 128, 256, B)),
        ("conv5  256->128   @60 ", Conv2dTorch(128, 3, 1, 1), (B, h4, w4, 256), cflop(h4, w4, 3, 256, 128, B)),
        ("tconv1 128->64 s2 @60 ", ConvTranspose2dTorch(64, 3, 2, 1, 1), (B, h4, w4, 128), cflop(h4, w4, 3, 128, 64, B) * 4),
        ("tconv2  64->32 s2 @120", ConvTranspose2dTorch(32, 2, 2, 0), (B, h2, w2, 64), cflop(h2, w2, 2, 64, 32, B) * 4),
        ("conv6   32->3     @240", Conv2dTorch(3, 3, 1, 1), (B, H, W, 32), cflop(H, W, 3, 32, 3, B)),
        ("skip1a   3->3 1x1 @240", Conv2dTorch(3, 1, 1, 0), (B, H, W, 3), cflop(H, W, 1, 3, 3, B)),
        ("skip1b   3->3 3x3 @240", Conv2dTorch(3, 3, 1, 1), (B, H, W, 3), cflop(H, W, 3, 3, 3, B)),
        ("skip1b B=1        @240", Conv2dTorch(3, 3, 1, 1), (1, H, W, 3), cflop(H, W, 3, 3, 3, 1)),
        ("skip2   32->64 1x1@120", Conv2dTorch(64, 1, 1, 0), (B, h2, w2, 32), cflop(h2, w2, 1, 32, 64, B)),
        ("skip3   64->128   @60 ", Conv2dTorch(128, 3, 1, 1), (B, h4, w4, 64), cflop(h4, w4, 3, 64, 128, B)),
    ]

    # K chained applications in ONE program: the carry perturbs the input
    # so XLA cannot CSE/hoist the conv out of the loop.
    def make_fwd(mod):
        def run(params, x):
            def body(i, c):
                y = mod.apply({"params": params}, x + c)
                return jnp.max(jnp.abs(y)).astype(dt) * jnp.asarray(1e-8, dt)
            return jax.lax.fori_loop(0, K, body, jnp.zeros((), dt))
        return jax.jit(run)

    def make_bwd(mod):
        # 0.5*sum(y^2): the cotangent is y itself, so the backward depends
        # on the (carry-perturbed) input and cannot be hoisted out of the
        # loop the way sum(y)'s constant input-gradient can.
        def run(params, x):
            def body(i, c):
                g = jax.grad(lambda z: 0.5 * jnp.sum(
                    jnp.square(mod.apply({"params": params}, z)
                               .astype(jnp.float32))))(x + c)
                return jnp.max(jnp.abs(g)).astype(dt) * jnp.asarray(1e-8, dt)
            return jax.lax.fori_loop(0, K, body, jnp.zeros((), dt))
        return jax.jit(run)

    def timeit(f, *a, n=3):
        force(f(*a))  # compile + first run
        t0 = time.time()
        for _ in range(n):
            r = f(*a)
        force(r)
        return (time.time() - t0) / n / K

    tot_f = tot_b = 0.0
    for name, mod, ishape, fl in specs:
        x = jnp.asarray(rng.random(ishape, np.float32), dt)
        params = host_init(lambda m=mod, s=ishape: m.init(
            jax.random.PRNGKey(0), jnp.zeros(s, jnp.float32))["params"])
        params = jax.tree.map(lambda a: a.astype(dt), params)
        tf = timeit(make_fwd(mod), params, x)
        tb = timeit(make_bwd(mod), params, x)
        if ishape[0] == B:
            tot_f += tf
            tot_b += tb
        print(f"{name}  fwd {1e3*tf:7.2f} ms ({fl/tf/1e12:6.1f} TF/s)   "
              f"fwd+igrad {1e3*tb:7.2f} ms ({3*fl/tb/1e12:6.1f} TF/s)", flush=True)

    print(f"sum(B={B} layers)        fwd {1e3*tot_f:7.2f} ms              fwd+igrad {1e3*tot_b:7.2f} ms")


if __name__ == "__main__":
    main()
