"""Reproduce the SPAA benchmark (reference ``reproduce_paper_results.py``).

Runs the full pipeline on every setup: train/load PCNet & CompenNet++,
run the three attackers (SPAA, PerC-AL+CompenNet++, One-pixel_DE*), and
summarize to per-setup stats tables + the cross-setup pivot table
(paper Table 1 layout).

* One-pixel_DE requires a project-and-capture loop; without hardware it
  runs against the synthetic simulator when ``--sim`` is given, and is
  skipped otherwise (reference behavior needs real ProCams, reference
  ``reproduce_paper_results.py:66-69``).

Usage:
  python reproduce_paper_results.py --data-root <benchmark data root>
  python reproduce_paper_results.py --sim          # hardware/dataset-free
                                                   # synthetic smoke run
"""

from __future__ import annotations

import argparse
import os
from os.path import join

# the 13 benchmark object setups (reference reproduce_paper_results.py:47-61)
BENCHMARK_SETUPS = [
    "basketball", "book_jacket", "backpack", "banana", "book",
    "bucket", "coffee_mug", "lotion", "paper_towel", "pillow",
    "remote_control", "soccer_ball", "teddy",
]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-root", default="data",
                    help="benchmark dataset root (with setups/<name>/...)")
    ap.add_argument("--setups", nargs="*", default=None,
                    help="subset of setups (default: all found)")
    ap.add_argument("--sim", action="store_true",
                    help="generate a synthetic setup and run hardware-free")
    ap.add_argument("--num-sim-setups", type=int, default=1,
                    help="with --sim: number of synthetic object setups "
                         "(distinct scenes/seeds, like the reference's 13 "
                         "benchmark objects)")
    ap.add_argument("--load-pretrained", action="store_true",
                    help="load cached checkpoints instead of retraining")
    ap.add_argument("--recreate-stats-and-imgs", action="store_true")
    ap.add_argument("--keep-existing-imgs", action="store_true",
                    help="recompute stats but skip montages that already "
                         "exist (montage writes dominate recreate time)")
    ap.add_argument("--multi-setup-train", action="store_true",
                    help="train the setups' PCNets several-at-a-time as "
                         "one SPMD program (parallel/multi_setup.py) "
                         "before the per-setup pipeline, which then loads "
                         "the cached checkpoints (the reference trains "
                         "its 13 setups strictly sequentially)")
    ap.add_argument("--multi-setup-chunk", type=int, default=None,
                    help="setups per multi-setup training program "
                         "(default: one per visible device)")
    ap.add_argument("--multi-setup-attack", action="store_true",
                    help="run the SPAA sweeps mesh-size setups at a time "
                         "as one shard_map program per wave "
                         "(parallel.run_spaa_attack_multi_setup; same "
                         "outputs as the sequential driver)")
    args = ap.parse_args()

    from spaa_tpu.attack import (get_attacker_cfg, run_projector_based_attack,
                                 summarize_all_attackers)
    from spaa_tpu.utils.log import print_sys_info
    from spaa_tpu.utils.seed import reset_rng_seeds

    print_sys_info()
    reset_rng_seeds(0)

    data_root = args.data_root
    procams = None
    sim_procams = {}
    if args.sim:
        from spaa_tpu.utils.sim_procams import (DEFAULT_SIM_SETUP_INFO,
                                                SimProCams)
        data_root = join(args.data_root, "sim_benchmark")
        setup_list = []
        for k in range(int(args.num_sim_setups)):
            name = "sim_setup" if k == 0 else f"sim_setup_{k + 1}"
            # each synthetic "object" is its own ProCams world (scene
            # albedo/geometry from the per-setup seed) — the hardware
            # stand-in must match at capture AND replay time
            sim_procams[name] = SimProCams(dict(DEFAULT_SIM_SETUP_INFO),
                                           seed=7 + 13 * k)
            if not os.path.isdir(join(data_root, "setups", name)):
                print(f"Generating synthetic setup {name} under {data_root}")
                sim_procams[name].make_setup(data_root, name, num_train=500,
                                             num_test=200)
            setup_list.append(name)
        procams = sim_procams[setup_list[0]]
    else:
        setups_dir = join(data_root, "setups")
        found = sorted(os.listdir(setups_dir)) if os.path.isdir(setups_dir) \
            else []
        setup_list = args.setups or [s for s in BENCHMARK_SETUPS
                                     if s in found] or found
        if not setup_list:
            raise SystemExit(
                f"No setups under {setups_dir}. Download/unpack the SPAA "
                "benchmark dataset there, or run with --sim for a synthetic "
                "smoke benchmark.")

    if args.multi_setup_train and len(setup_list) > 1:
        from spaa_tpu.parallel import (pretrain_compennets_pp_multi_setup,
                                       pretrain_pcnets_multi_setup)
        from spaa_tpu.train.train import get_model_train_cfg
        mc = get_model_train_cfg(None, data_root, setup_list)
        mc.model_list = ["PCNet"]
        pretrain_pcnets_multi_setup(mc, chunk=args.multi_setup_chunk)
        mc = get_model_train_cfg(None, data_root, setup_list)
        mc.model_list = ["CompenNet++"]
        pretrain_compennets_pp_multi_setup(mc, chunk=args.multi_setup_chunk)
        # the per-setup pipelines now find every checkpoint
        args.load_pretrained = True

    attackers = ["SPAA", "PerC-AL+CompenNet++"]
    if args.sim:
        attackers.append("One-pixel_DE")  # simulator provides the capture loop

    def _procams_for(s):
        return sim_procams.get(s, procams)

    for attacker_name in attackers:
        cfg = get_attacker_cfg(attacker_name, data_root, setup_list,
                               load_pretrained=args.load_pretrained)
        if attacker_name == "One-pixel_DE":
            for s in setup_list:   # one setup at a time (hardware loop)
                c1 = get_attacker_cfg(attacker_name, data_root, [s])
                run_projector_based_attack(c1, procams=_procams_for(s))
        else:
            # SPAA/PerC-AL attack through the frozen simulator model only;
            # procams matters at replay, where each sim setup is its own
            # deterministic "world"
            if args.multi_setup_attack and len(setup_list) > 1:
                from spaa_tpu.parallel import (run_percal_attack_multi_setup,
                                               run_spaa_attack_multi_setup)
                if attacker_name == "SPAA":
                    run_spaa_attack_multi_setup(cfg)
                else:
                    run_percal_attack_multi_setup(cfg)
            else:
                run_projector_based_attack(cfg, procams=procams)
            if procams is not None:
                from spaa_tpu.attack import project_capture_real_attack
                for s in setup_list:
                    c1 = get_attacker_cfg(attacker_name, data_root, [s])
                    project_capture_real_attack(c1, _procams_for(s))

    df = summarize_all_attackers(attackers, data_root, setup_list,
                                 recreate_stats_and_imgs=True,
                                 recreate_imgs=not args.keep_existing_imgs)
    print(df)
    print("\nAll done! Stats under", join(data_root, "setups"))


if __name__ == "__main__":
    main()
