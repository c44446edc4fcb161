"""Regenerate the trained PCNet checkpoint bench.py prefers.

bench.py::_find_sim_artifacts looks for ``<root>/checkpoint/
*_PCNet_l1+ssim_*.flax`` plus ``<root>/sim_benchmark/setups/sim_setup``
under $SPAA_BENCH_DATA_ROOT or /tmp/simbench; a fresh /tmp loses both and
the attack bench silently falls back to the emulated converged warp
(``warp_source: "emulated"``). This script rebuilds exactly the artifacts
the ``--sim`` benchmark run would leave behind, but runs ONLY the setup
generation + PCNet production training (ref ``train_network.py:476-594``
scope) — no attacks, no summarize.

Run on TPU:  python tools/make_bench_ckpt.py [root=/tmp/simbench]
(~3-5 min: sim data gen on host + 2000-iter train; the axon session
warm-up of a fresh process is absorbed before training starts.)
"""
import os
import sys
from os.path import isdir, join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/simbench"
    data_root = join(root, "sim_benchmark")

    from spaa_tpu.train.pipeline import train_eval_pcnet
    from spaa_tpu.train.train import get_model_train_cfg
    from spaa_tpu.utils.seed import reset_rng_seeds
    from spaa_tpu.utils.sim_procams import DEFAULT_SIM_SETUP_INFO, SimProCams

    reset_rng_seeds(0)
    sim = SimProCams(dict(DEFAULT_SIM_SETUP_INFO), seed=7)  # == --sim setup 0
    if not isdir(join(data_root, "setups", "sim_setup")):
        print(f"Generating synthetic setup sim_setup under {data_root}")
        sim.make_setup(data_root, "sim_setup", num_train=500, num_test=200)

    cfg = get_model_train_cfg(["PCNet"], data_root, ["sim_setup"],
                              load_pretrained=True)  # reuse if present
    _, table, _ = train_eval_pcnet(cfg)
    print(table)
    ckpt_dir = join(root, "checkpoint")
    ckpts = ([f for f in os.listdir(ckpt_dir)
              if "_PCNet_" in f and f.endswith(".flax")]
             if isdir(ckpt_dir) else [])
    assert ckpts, "no PCNet checkpoint written"
    print(f"checkpoint ready: {join(root, 'checkpoint', sorted(ckpts)[-1])}")


if __name__ == "__main__":
    main()
