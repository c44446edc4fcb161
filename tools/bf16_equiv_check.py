#!/usr/bin/env python
"""bf16-vs-f32 SPAA sweep equivalence check on a trained sim setup.

The TPU attack path defaults to bfloat16 MXU compute (a documented
deviation from the reference's f32 — PARITY.md); this script re-validates
that the *decision-level* outputs are unchanged: it runs the full
12-config SPAA sweep twice (attack_dtype bfloat16, then float32) against
the same trained PCNet + the deterministic simulator, summarizes both, and
compares every success-rate column row-for-row.

Needs a trained sim setup (run ``reproduce_paper_results.py --sim
--data-root <root>`` first); reuses its cached checkpoint.

Usage: python tools/bf16_equiv_check.py --data-root /tmp/simbench
"""

from __future__ import annotations

import argparse
import os
import sys
from os.path import join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUCCESS_COLS = ["T.top-1_infer", "T.top-5_infer", "T.top-1_real",
                "T.top-5_real", "U.top-1_infer", "U.top-1_real"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="/tmp/simbench")
    ap.add_argument("--setup", default="sim_setup")
    args = ap.parse_args()

    from spaa_tpu.attack import (get_attacker_cfg,
                                 project_capture_real_attack,
                                 run_projector_based_attack,
                                 summarize_single_attacker)
    from spaa_tpu.utils.sim_procams import DEFAULT_SIM_SETUP_INFO, SimProCams
    from spaa_tpu.utils.seed import reset_rng_seeds

    data_root = join(args.data_root, "sim_benchmark")
    if not os.path.isdir(join(data_root, "setups", args.setup)):
        print(f"no trained sim setup under {data_root}; run "
              "reproduce_paper_results.py --sim first")
        return 2

    procams = SimProCams(dict(DEFAULT_SIM_SETUP_INFO))  # deterministic
    tables = {}
    for dtype in ("bfloat16", "float32"):
        reset_rng_seeds(0)
        cfg = get_attacker_cfg("SPAA", data_root, [args.setup],
                               load_pretrained=True)
        cfg.attack_dtype = dtype
        run_projector_based_attack(cfg)
        project_capture_real_attack(cfg, procams)
        df = summarize_single_attacker(
            attacker_name="SPAA", data_root=data_root,
            setup_list=[args.setup],
            stealth_losses=list(cfg.stealth_losses),
            d_threshes=list(cfg.d_threshes),
            classifier_names=list(cfg.classifier_names))
        tables[dtype] = df.reset_index(drop=True)

    a, b = tables["bfloat16"], tables["float32"]
    keys = ["Stealth_loss", "d_thr", "Classifier"]
    a = a.sort_values(keys).reset_index(drop=True)
    b = b.sort_values(keys).reset_index(drop=True)
    diffs = []
    for col in SUCCESS_COLS:
        delta = (a[col] - b[col]).abs()
        if (delta > 0).any():
            diffs.append((col, float(delta.max()),
                          int((delta > 0).sum())))
    print("\n=== bf16 vs f32 success-table comparison "
          f"({len(a)} rows x {len(SUCCESS_COLS)} success cols) ===")
    if not diffs:
        print("IDENTICAL: every success-rate cell matches.")
        return 0
    for col, mx, n in diffs:
        print(f"DIFFERS: {col}: {n} rows differ, max |delta| = {mx:.4f}")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
