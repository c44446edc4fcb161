"""Ablation timing of the production SPAA 132-batch program (one
classifier) — where does the per-iteration time actually go?

Variants (same batch/shape/iters, resnet18):
  full          : production program (PCNet bf16+Pallas, classifier, colors)
  no_camde      : CIEDE2000 chain off (camde_range empty)
  tiny_clf      : classifier replaced by a 1-matmul head (isolates CNN cost)
  no_pcnet_bwd  : PCNet replaced by a cheap fixed resize (isolates PCNet)

Run on the TPU: `python tools/attack_ablation.py`.
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


def main():
    from bench import CAM_HW, CP_SZ, PRJ_HW, _build  # reuse the bench setup
    from spaa_tpu.attack.spaa import SpaaConfig, spaa_attack_batched
    from spaa_tpu.models.classifiers import load_params, make_logits_fn

    print(f"backend={jax.default_backend()}")
    log = lambda m: print(m, file=sys.stderr, flush=True)

    # steal the built pcnet_apply/state from bench's production path
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        runs, pcnet_apply, pcnet_state, warp_source = _build(log)
    del runs
    print(f"warp_source={warp_source}")

    rng = np.random.default_rng(0)
    B = 132
    iters = 50
    cam_scene = jnp.asarray(rng.random((1, *CAM_HW, 3), np.float32))
    prj_init = jnp.full((B, *PRJ_HW, 3), 0.5)
    tgt = jnp.tile(jnp.arange(11, dtype=jnp.int32) * 37 % 1000, 12)
    targeted = jnp.tile(jnp.asarray([True] * 10 + [False]), 12)
    w = jnp.repeat(jnp.asarray([[0.0, 1.0, 0.0]] * 4 + [[0.0, 0.0, 1.0]] * 4
                               + [[0.0, 1.0, 1.0]] * 4), 11, axis=0)
    dt = jnp.repeat(jnp.asarray([5.0, 7.0, 9.0, 11.0] * 3), 11)

    cdtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    cparams = load_params("resnet18", None, verbose=False)[0]
    cparams = jax.tree.map(
        lambda x: x.astype(cdtype) if x.dtype == jnp.float32 else x, cparams)
    lf = make_logits_fn("resnet18")

    def logits_fn(p, im):
        return lf(p, im.astype(cdtype), CP_SZ).astype(jnp.float32)

    # tiny head params travel as jit ARGUMENTS (a closure constant this
    # size would be embedded in the program and blow the remote-compile
    # request limit)
    tiny_params = (
        jnp.asarray(rng.normal(0, 0.01, (CAM_HW[0] * CAM_HW[1] * 3, 64)),
                    cdtype),
        jnp.asarray(rng.normal(0, 0.1, (64, 1000)), cdtype))

    def tiny_logits(p, im):
        w1, w2 = p
        return (im.reshape(im.shape[0], -1).astype(cdtype)
                @ w1 @ w2).astype(jnp.float32)

    def cheap_pcnet(st, prj):
        del st
        return jax.image.resize(prj, (prj.shape[0], *CAM_HW, 3), "linear")

    variants = {
        "full": (pcnet_apply, logits_fn, cparams, (44, B)),
        "no_camde": (pcnet_apply, logits_fn, cparams, (B, B)),
        "tiny_clf": (pcnet_apply, tiny_logits, tiny_params, (44, B)),
        "cheap_pcnet": (cheap_pcnet, logits_fn, cparams, (44, B)),
    }
    only = set(sys.argv[1:])
    if only:
        variants = {k: v for k, v in variants.items()
                    if k in only or k == "full"}
    results = {}
    for name, (pc, lfn, cp, rng_camde) in variants.items():
        cfg = SpaaConfig(iters=iters, camde_range=rng_camde)
        fn = jax.jit(lambda st, c, p0, _pc=pc, _lf=lfn, _cfg=cfg:
                     spaa_attack_batched(_pc, _lf, st, c, cam_scene, p0,
                                         tgt, targeted, w, dt, _cfg))
        t0 = time.time()
        force(fn(pcnet_state, cp, prj_init))
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            force(fn(pcnet_state, cp, prj_init))
            best = min(best, time.time() - t0)
        results[name] = best
        print(f"{name:>12}: {best:6.2f} s / {iters} iters "
              f"({best / iters * 1e3:6.1f} ms/iter) [compile {compile_s:.0f}s]")

    full = results["full"]
    if "no_camde" in results:
        print(f"camde share  : {full - results['no_camde']:.2f} s")
    if "tiny_clf" in results:
        print(f"clf share    : {full - results['tiny_clf']:.2f} s")
    if "cheap_pcnet" in results:
        print(f"pcnet share  : {full - results['cheap_pcnet']:.2f} s")


if __name__ == "__main__":
    main()
