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
import contextlib
import json
import os
import time
from os.path import join

# the 13 benchmark object setups (reference reproduce_paper_results.py:47-61)
BENCHMARK_SETUPS = [
    "basketball", "book_jacket", "backpack", "banana", "book",
    "bucket", "coffee_mug", "lotion", "paper_towel", "pillow",
    "remote_control", "soccer_ball", "teddy",
]


class PhaseLog:
    """Wall-clock per benchmark phase, dumped as one JSON record — the
    measured (not projected) evidence for the 13-setup dress rehearsal
    (the reference's unit of reproduction is 13 object setups,
    ref ``reproduce_paper_results.py:47-61``)."""

    def __init__(self, path=None):
        self.path = path
        self.phases = []
        self.t_start = time.time()

    @contextlib.contextmanager
    def phase(self, name):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.phases.append({"phase": name, "s": round(dt, 1)})
            print(f"[phase] {name}: {dt:.1f}s", flush=True)

    def write(self, extra=None):
        if not self.path:
            return
        rec = {"total_s": round(time.time() - self.t_start, 1),
               "phases": self.phases, **(extra or {})}
        with open(self.path, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"[phase] record written to {self.path}", flush=True)


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
    ap.add_argument("--summarize-only", action="store_true",
                    help="skip training and attacks; re-summarize existing "
                         "attack outputs (combine with --keep-existing-imgs "
                         "for a stats-only table recreate — the reference "
                         "offers this via recreate_stats_and_imgs in "
                         "summarize_all_attackers, ref "
                         "reproduce_paper_results.py:71)")
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
    ap.add_argument("--phase-json", default=None,
                    help="write per-phase wall-clock + the cross-setup "
                         "pivot to this JSON file")
    ap.add_argument("--attackers", nargs="*", default=None,
                    choices=["SPAA", "PerC-AL+CompenNet++", "One-pixel_DE"],
                    help="subset of attackers (default: all applicable; "
                         "the reference always runs all three)")
    args = ap.parse_args()
    plog = PhaseLog(args.phase_json)

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
                with plog.phase(f"simgen/{name}"):
                    sim_procams[name].make_setup(data_root, name,
                                                 num_train=500, num_test=200)
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
        with plog.phase("multi_setup_train/PCNet"):
            pretrain_pcnets_multi_setup(mc, chunk=args.multi_setup_chunk)
        mc = get_model_train_cfg(None, data_root, setup_list)
        mc.model_list = ["CompenNet++"]
        with plog.phase("multi_setup_train/CompenNet++"):
            pretrain_compennets_pp_multi_setup(mc,
                                               chunk=args.multi_setup_chunk)
        # the per-setup pipelines now find every checkpoint
        args.load_pretrained = True

    attackers = ["SPAA", "PerC-AL+CompenNet++"]
    if args.sim:
        attackers.append("One-pixel_DE")  # simulator provides the capture loop
    if args.attackers:
        attackers = [a for a in attackers if a in args.attackers]

    def _procams_for(s):
        return sim_procams.get(s, procams)

    for attacker_name in [] if args.summarize_only else attackers:
        cfg = get_attacker_cfg(attacker_name, data_root, setup_list,
                               load_pretrained=args.load_pretrained)
        if attacker_name == "One-pixel_DE":
            for s in setup_list:   # one setup at a time (hardware loop)
                c1 = get_attacker_cfg(attacker_name, data_root, [s])
                with plog.phase(f"attack/One-pixel_DE/{s}"):
                    run_projector_based_attack(c1, procams=_procams_for(s))
        else:
            # SPAA/PerC-AL attack through the frozen simulator model only;
            # procams matters at replay, where each sim setup is its own
            # deterministic "world"
            if args.multi_setup_attack and len(setup_list) > 1:
                from spaa_tpu.parallel import (run_percal_attack_multi_setup,
                                               run_spaa_attack_multi_setup)
                with plog.phase(f"attack_wave/{attacker_name}"):
                    if attacker_name == "SPAA":
                        run_spaa_attack_multi_setup(cfg)
                    else:
                        run_percal_attack_multi_setup(cfg)
            else:
                with plog.phase(f"attack/{attacker_name}"):
                    run_projector_based_attack(cfg, procams=procams)
            if procams is not None:
                from spaa_tpu.attack import project_capture_real_attack
                with plog.phase(f"replay/{attacker_name}"):
                    for s in setup_list:
                        c1 = get_attacker_cfg(attacker_name, data_root, [s])
                        project_capture_real_attack(c1, _procams_for(s))

    with plog.phase("summarize_all"):
        df = summarize_all_attackers(
            attackers, data_root, setup_list, recreate_stats_and_imgs=True,
            recreate_imgs=not args.keep_existing_imgs)
    print(df)
    table, pivot = df
    plog.write({"n_setups": len(setup_list), "setups": setup_list,
                "attackers": attackers,
                "multi_setup_train": bool(args.multi_setup_train),
                "multi_setup_attack": bool(args.multi_setup_attack),
                "summarize_only": bool(args.summarize_only),
                "stats_all_rows": int(len(table)),
                "pivot": json.loads(
                    pivot.reset_index().to_json(orient="records"))})
    print("\nAll done! Stats under", join(data_root, "setups"))


if __name__ == "__main__":
    main()
