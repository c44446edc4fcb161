"""In-context A/B of the small-conv rewrites inside the FULL PCNet programs.

tools/smallconv_bench.py measured each rewrite in isolation (subpix
transConv2 3.4-5x faster, packed encoder pairs ~1.4-2x) — but bench.py then
showed the full attack sweep and train step getting SLOWER with them
enabled. Layer-isolated timing misses fusion/layout interactions: what XLA
does to the surrounding program when an einsum+depth-to-space replaces a
conv, or when two convs become one packed conv, can cost more than the
layer saves. This script times the rewrites where they actually run:

  attack : PCNet.apply fwd + input-grad, cached warp grid + surface feats,
           B=132 bf16 (the SPAA hot-loop program shape)
  train  : loss+grads through PCNet (l1+ssim), B=24 f32, scene [1,...]
           (the train_model_scan step program shape)

K chained applications per program (axon dispatch latency amortized).
Run on TPU: python tools/incontext_ab.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from spaa_tpu.models import PCNet
from spaa_tpu.utils.jaxtools import host_init

K = 10
CAM_HW = (240, 320)
PRJ_HW = (256, 256)

# the measured combo grid (module-level so tests/test_tools_smoke.py can
# pin every knob value against the live PCNet API)
COMBOS = [
    ("packed=T subpix=T", dict(packed_encoder=True, subpix_tconv=True)),
    ("packed=F subpix=F", dict(packed_encoder=False, subpix_tconv=False)),
    ("packed=T subpix=F", dict(packed_encoder=True, subpix_tconv=False)),
    ("packed=F subpix=T", dict(packed_encoder=False, subpix_tconv=True)),
    # single-pair packing (VERDICT r3 #6): conv2/conv2_s is the biggest
    # lane-starved layer — does packing ONLY it (skipping the conv1-pair
    # layout churn) beat the all-off baseline?
    ("packed=enc2 subpix=F", dict(packed_encoder="enc2", subpix_tconv=False)),
    ("packed=enc1 subpix=F", dict(packed_encoder="enc1", subpix_tconv=False)),
]


def force(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def time_program(j, *args, n=3):
    force(j(*args))
    t0 = time.time()
    for _ in range(n):
        r = j(*args)
    force(r)
    return (time.time() - t0) / n / K


def main():
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} K={K}", flush=True)
    force(jnp.zeros(1))

    mask = jnp.ones((*CAM_HW, 1), jnp.float32)
    scene = jnp.asarray(rng.random((1, *CAM_HW, 3), np.float32))
    x132 = jnp.asarray(rng.random((132, *PRJ_HW, 3), np.float32), jnp.bfloat16)
    x24 = jnp.asarray(rng.random((24, *PRJ_HW, 3), np.float32))
    y24 = jnp.asarray(rng.random((24, *CAM_HW, 3), np.float32))

    base = PCNet(out_size=CAM_HW)
    params = host_init(lambda: base.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *PRJ_HW, 3)),
        jnp.zeros((1, *CAM_HW, 3)), mask)["params"])

    # Measured 2026-08-17 (TPU v5e via axon, chained programs):
    #   attack:  T/T 84.04  F/F 68.75  T/F 73.03  F/T 80.09  ms/application
    #   train :  T/T 57.06  F/F 52.52  T/F 55.59  F/T 53.97  ms/step
    # -> both rewrites are whole-program REGRESSIONS despite their 2-5x
    #    isolated-layer wins; defaults are therefore OFF.
    # Re-measured 2026-08-19 with the single-pair variants (VERDICT r3 #6;
    # first four combos reproduced within 0.3%):
    #   attack:  off 68.69  enc2 70.10 (+2.1%)  enc1 71.16 (+3.6%)
    #   train :  off 52.23  enc2 51.65 (-1.1%)  enc1 55.90
    # -> even the conv2-pair-only packing loses in-context on the attack
    #    program; the 1.1% train win is inside run noise and not worth a
    #    divergent default. CLOSED NEGATIVE: all packing defaults stay OFF.
    combos = COMBOS

    # ---------------- attack shape ----------------
    print("attack: PCNet fwd+igrad, cached, B=132 bf16 (ms/application)")
    for name, kw in combos:
        model = PCNet(out_size=CAM_HW, **kw)
        cache = jax.jit(
            lambda p, s: model.apply({"params": p}, method=model.simplify_cache,
                                     s=s))(params, scene)
        scene_b = scene.astype(jnp.bfloat16)
        p16 = jax.tree.map(lambda t: t.astype(jnp.bfloat16), params)
        m16 = mask.astype(jnp.bfloat16)

        def run(p, q, sc, c):
            def body(i, carry):
                def f(z):
                    out = model.apply({"params": p}, z + carry, sc, m16,
                                      cache=c)
                    return jnp.sum(out.astype(jnp.float32) ** 2), out
                (_, out), g = jax.value_and_grad(f, has_aux=True)(q)
                return (jnp.max(jnp.abs(g)) * 1e-8).astype(q.dtype)
            return jax.lax.fori_loop(0, K, body, jnp.zeros((), q.dtype))

        j = jax.jit(run)
        t = time_program(j, p16, x132, scene_b, cache)
        print(f"  {name}  {1e3 * t:7.2f} ms", flush=True)

    # ---------------- train shape ----------------
    print("train: loss+param grads (l1+ssim), B=24 f32 (ms/step)")
    from spaa_tpu.train.train import compute_loss
    for name, kw in combos:
        model = PCNet(out_size=CAM_HW, **kw)

        def run(p, q, y):
            def body(i, carry):
                def loss(p2):
                    infer = model.apply({"params": p2}, q + carry, scene, mask)
                    return compute_loss(infer, y, "l1+ssim",
                                        ssim_weight=jnp.float32(1.0))[0]
                g = jax.grad(loss)(p)
                gm = sum(jnp.max(jnp.abs(t)) for t in jax.tree.leaves(g))
                return (gm * 1e-8).astype(q.dtype)
            return jax.lax.fori_loop(0, K, body, jnp.zeros((), q.dtype))

        j = jax.jit(run)
        t = time_program(j, params, x24, y24)
        print(f"  {name}  {1e3 * t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
