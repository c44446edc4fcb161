"""Single-chip A/B: setup-parallel PCNet training vs the sequential loop.

The reference trains its 13 benchmark setups strictly sequentially
(reproduce_paper_results.py:63-65 -> train_eval_pcnet per setup).
parallel/multi_setup.py stacks S independent trainings into ONE program
(vmapped production step). On a pod slice that divides wall-clock by
n_devices with zero collectives; this script measures what it does on ONE
chip, where the win (if any) comes from utilization: the train step's
convs run at ~22% MXU (small channel counts at 240x320, batch 24), so a
vmapped S-stack raises the effective batch XLA can tile.

Methodology = bench.py::_bench_train_step (50-iter lax.scan segment,
batch 24, 240x320, l1+ssim curriculum, 3-group optimizer): warm-up put,
compile outside the timed window, materializing barrier. Reports
ms/iter-per-setup and the implied 13-setup 2000-iter phase time.

Run on TPU: python tools/multi_setup_bench.py [S ...]  (default 1 2 4)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

CAM_HW = (240, 320)
PRJ_HW = (256, 256)
# SEG=200: train_pcnet_multi_setup pulls losses/l2s to host after the
# scan — a few axon round-trips per call; 200 iters amortizes them to
# <2 ms/iter so the reading is device rate, not tunnel RTT
N_TRAIN, BS, SEG = 96, 24, 200


def force(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def main():
    s_list = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    rng = np.random.default_rng(1)
    print(f"backend={jax.default_backend()} seg={SEG} batch={BS}",
          flush=True)
    force(jnp.zeros(1))  # absorb axon session establishment

    from spaa_tpu.models import PCNet
    from spaa_tpu.parallel import train_pcnet_multi_setup
    from spaa_tpu.train.train import (get_model_train_cfg,
                                      make_pcnet_optimizer)
    from spaa_tpu.utils.jaxtools import host_init

    model = PCNet(out_size=CAM_HW)
    mask = np.ones((*CAM_HW, 1), np.float32)
    cfg = get_model_train_cfg(["PCNet"], single=True)
    tx = make_pcnet_optimizer(cfg)
    params = host_init(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *PRJ_HW, 3)),
        jnp.zeros((1, *CAM_HW, 3)), jnp.asarray(mask))["params"])

    idx = rng.integers(0, N_TRAIN, (SEG, BS)).astype(np.int32)
    base_ms = None
    for S in s_list:
        # pre-ship to device OUTSIDE the timed window (the axon wire is
        # ~25-40 MB/s; jnp.asarray inside train_pcnet_multi_setup is then
        # a no-op)
        scenes = jnp.asarray(rng.random((S, 1, *CAM_HW, 3), np.float32))
        masks = jnp.asarray(np.broadcast_to(mask, (S, *mask.shape)))
        prj = jnp.asarray(
            (rng.random((S, N_TRAIN, *PRJ_HW, 3)) * 255).astype(np.uint8))
        cam = jnp.asarray(
            (rng.random((S, N_TRAIN, *CAM_HW, 3)) * 255).astype(np.uint8))
        force(cam)
        plist = [params] * S

        def run():
            return train_pcnet_multi_setup(
                model.apply, plist, tx, scenes, masks, prj, cam, idx,
                use_scan=True)

        try:
            out = run()          # compile + first run
            force(out[0][0])
            t0 = time.time()
            out = run()
            force(out[0][0])
            dt = time.time() - t0
        except Exception as e:   # noqa: BLE001 — report OOM and continue
            print(f"S={S}: FAILED ({type(e).__name__}: {str(e)[:120]})",
                  flush=True)
            continue
        ms_it = dt / SEG * 1e3
        ms_it_setup = ms_it / S
        if base_ms is None:
            base_ms = ms_it_setup
        phase_13 = 13 * 2000 * ms_it_setup / 1e3
        print(f"S={S}: {ms_it:7.2f} ms/iter ({ms_it_setup:6.2f} per setup, "
              f"{base_ms / ms_it_setup:4.2f}x vs S=1) -> 13-setup 2000-iter "
              f"phase ~{phase_13:5.0f} s", flush=True)


if __name__ == "__main__":
    main()
