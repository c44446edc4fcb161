"""In-context A/B of the classifier-stem tap-GEMM backward (taps_stem).

tests/test_taps_bwd.py proves conv2d_taps_bwd is forward-bitwise and
igrad-mathematically identical to the XLA path; /tmp-level microbenches
showed the isolated stem backward is lane-starved (GEMM N = Cin = 3).
But this repo's small-conv history (tools/incontext_ab.py) says isolated
wins can be in-context losses — XLA layout/fusion around a rewrite can
cost more than the rewrite saves. So: time the PRODUCTION SPAA sweep
program (the exact bench.py shape, trained ckpt + real scene/mask when
/tmp/simbench is present) per classifier with taps_stem on vs off.

Run on TPU:  python tools/taps_ab.py [iters] [quick]
(`quick` = off/all variants only — the keep-or-revert decision in ~1/3
the compiles; run the full 6-variant grid when the tunnel is stable.)
Decision rule: keep taps defaults only if no classifier's sweep program
regresses and at least one improves.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# variants: each rewrite judged independently in the full program, then
# everything on. (label, classifier model_kw, pcnet_taps as build_sweep
# takes it). Module-level so the CI smoke (tests/test_tools_smoke.py) can
# walk the same grid the TPU A/B times — the grid drifting from the live
# model API is the rot mode that killed measurement tools before.
OFF = {"taps_stem": False, "taps_pool": False}
ON = {"taps_stem": True, "taps_pool": True}
VARIANTS = (("off ", OFF, False),
            ("stem", {"taps_stem": True, "taps_pool": False}, False),
            ("pool", {"taps_stem": False, "taps_pool": True}, False),
            ("pcn ", OFF, True),
            ("pc2 ", OFF, "enc2"),
            ("all ", ON, True))
VARIANTS_QUICK = (VARIANTS[0], VARIANTS[-1])


def main():
    import jax
    from trace_attack import build_sweep

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    def force(out):
        return np.asarray(jax.tree.leaves(out)[0].ravel()[0])

    print(f"backend={jax.default_backend()} iters={iters}", flush=True)
    force(jax.numpy.zeros(1))          # axon session warm-up

    variants = VARIANTS_QUICK if "quick" in sys.argv[2:] else VARIANTS
    for clf in ("resnet18", "vgg16", "inception_v3"):
        row = {}
        for label, kw, ptaps in variants:
            fn, args = build_sweep(clf, iters, model_kw=kw,
                                   pcnet_taps=ptaps)
            force(fn(*args))           # compile
            t0 = time.time()
            reps = 3
            for _ in range(reps):
                out = fn(*args)
            force(out)
            row[label] = (time.time() - t0) / reps
            del fn, args, out
        base = row["off "]
        print(f"{clf:14s}: " + "  ".join(
            f"{lab.strip()} {row[lab]:.3f}s"
            + (f" (x{base / row[lab]:.3f})" if lab != "off " else "")
            for lab, _, _ in variants), flush=True)


if __name__ == "__main__":
    main()
