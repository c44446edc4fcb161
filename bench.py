"""Headline benchmark: SPAA attack wall-clock per (stealth_loss, d_thr)
config on one TPU chip.

Reference anchor (BASELINE.md): 42.5 s per config across all 3 classifiers
(1 untargeted + 10 batched targeted attacks, 50 iterations each) on the
authors' CUDA GPU — reference ``projector_based_attack.py:83``.

This bench runs the production batched-sweep path at the benchmark shapes
(camera 320x240, projector 256x256, ImageNet classifiers at 224/299
input): for each of resnet18 / vgg16 / inception_v3, ONE jitted
50-iteration SPAA program over the whole 12-config sweep as a 132-image
batch (per-sample stealth weights / d_thr / target flags — exactly what
``orchestrate._run_spaa_sweep`` dispatches), through a frozen PCNet with
the Pallas fixed-grid warp and bf16 MXU compute. Reported per config.
Compilation is excluded (the persistent compile cache amortizes it across
runs).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N}
vs_baseline is the speedup vs the 42.5 s reference anchor (>1 is faster).
"""

from __future__ import annotations

import contextlib
import io
import json
import sys
import time

BASELINE_S = 42.5   # ref projector_based_attack.py:83, per (loss, d_thr)
N_CONFIGS = 12      # the SPAA sweep: 3 stealth losses x 4 d_thr
CLASSIFIERS = ("resnet18", "vgg16", "inception_v3")
CAM_HW = (240, 320)   # benchmark cam_im_sz [320, 240] (data/README.md)
PRJ_HW = (256, 256)   # benchmark prj_im_sz [256, 256]
CP_SZ = (240, 240)    # classifier_crop_sz
BATCH = 11 * N_CONFIGS  # production path: the whole sweep as ONE batch


def _build(log):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spaa_tpu.attack.spaa import SpaaConfig, spaa_attack_batched
    from spaa_tpu.attack.orchestrate import make_pcnet_fn
    from spaa_tpu.models import PCNet
    from spaa_tpu.models.classifiers import load_params, make_logits_fn
    from spaa_tpu.train.pipeline import TrainedModel
    from spaa_tpu.utils.jaxtools import host_init

    rng = np.random.default_rng(0)
    pcnet = PCNet(out_size=CAM_HW)
    cam_scene = rng.random((1, *CAM_HW, 3), np.float32)
    mask = np.ones((*CAM_HW, 1), np.float32)

    t0 = time.time()
    params = host_init(lambda: pcnet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *PRJ_HW, 3)),
        jnp.asarray(cam_scene), jnp.asarray(mask))["params"])
    # emulate a converged WarpingNet (trained warps are smooth): benchmark
    # affine scale ~0.85 and a quiet refinement net — FLOPs are identical,
    # and the Pallas warp tables get realistic spill counts
    params["warping_net"]["affine_mat"] = jnp.asarray(
        [[[0.85, 0.02, 0.01], [-0.02, 0.85, -0.01]]], jnp.float32)
    params["warping_net"]["grid_refine_net"] = jax.tree.map(
        lambda x: x * 0.01, params["warping_net"]["grid_refine_net"])
    log(f"[bench] pcnet host-init {time.time() - t0:.1f}s")

    setup_info = {"prj_im_sz": [PRJ_HW[1], PRJ_HW[0]],
                  "cam_im_sz": [CAM_HW[1], CAM_HW[0]],
                  "classifier_crop_sz": list(CP_SZ)}
    trained = TrainedModel(pcnet, params, jnp.asarray(mask), cam_scene,
                           setup_info, None, "PCNet")
    # flagship TPU path: Pallas fixed-grid warp + bf16 shading compute
    t0 = time.time()
    pcnet_apply, pcnet_state = make_pcnet_fn(trained)
    log(f"[bench] pcnet_fn (simplify + warp tables) {time.time() - t0:.1f}s")

    cdtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    runs = []
    for name in CLASSIFIERS:
        t0 = time.time()
        cparams = load_params(name, None, verbose=False)
        if cdtype != jnp.float32:
            cparams = jax.tree.map(
                lambda x: x.astype(cdtype) if x.dtype == jnp.float32 else x,
                cparams)
        log(f"[bench] {name}: params ready {time.time() - t0:.1f}s")
        lf = make_logits_fn(name)

        def logits_fn(params, im, _lf=lf):
            return _lf(params, im.astype(cdtype),
                       CP_SZ).astype(jnp.float32)

        # the real sweep layout (orchestrate._run_spaa_sweep): per config
        # 10 targeted + 1 untargeted; stealth weights and d_thr per sample
        target_idx = jnp.tile(jnp.arange(11, dtype=jnp.int32) * 37 % 1000,
                              N_CONFIGS)
        targeted = jnp.tile(jnp.asarray([True] * 10 + [False]), N_CONFIGS)
        wcfg = jnp.asarray([[0.0, 1.0, 0.0], [0.0, 0.0, 1.0],
                            [0.0, 1.0, 1.0]])       # caml2/camdE/camdE_caml2
        weights = jnp.repeat(jnp.tile(wcfg, (4, 1)), 11, axis=0)
        d_thr = jnp.repeat(jnp.asarray([5.0, 7.0, 9.0, 11.0] * 3), 11)
        prj_init = jnp.full((BATCH, *PRJ_HW, 3), 0.5)

        fn = jax.jit(lambda st, cp, p0, ti, tg, w, dt, _f=logits_fn:
                     spaa_attack_batched(pcnet_apply, _f, st, cp,
                                         jnp.asarray(cam_scene), p0,
                                         ti, tg, w, dt, SpaaConfig()))
        args = (pcnet_state, cparams, prj_init, target_idx, targeted,
                weights, d_thr)
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])  # real barrier (axon)
        log(f"[bench] {name}: compile+first-run {time.time() - t0:.1f}s")
        runs.append((fn, args))
    return runs


def main() -> None:
    import jax
    import numpy as np

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    def force(outs):
        # On the axon-tunneled TPU backend block_until_ready returns before
        # execution finishes; a device->host materialization is the only
        # reliable completion barrier. Pull one element per output.
        vals = [np.asarray(leaf.ravel()[0])
                for o in outs for leaf in jax.tree.leaves(o)]
        assert all(np.isfinite(v) for v in vals), "non-finite attack output"

    log(f"[bench] backend={jax.default_backend()} devices={jax.devices()}")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        runs = _build(log)

    # timed: the FULL 12-config sweep across all 3 classifiers (the
    # production batched path); reported per (loss, d_thr) config to match
    # the reference's 42.5s anchor. Best of 3 repeats.
    best = float("inf")
    for rep in range(3):
        t0 = time.time()
        for fn, args in runs:
            out = fn(*args)
            force([out])
            del out  # release HBM before the next classifier's sweep
        dt = time.time() - t0
        log(f"[bench] rep {rep}: {dt:.3f}s sweep "
            f"({dt / N_CONFIGS:.3f}s/config)")
        best = min(best, dt)

    per_config = best / N_CONFIGS
    print(json.dumps({
        "metric": "spaa_attack_config_wallclock",
        "value": round(per_config, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / per_config, 2),
    }))


if __name__ == "__main__":
    main()
