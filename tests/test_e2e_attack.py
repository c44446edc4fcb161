"""End-to-end integration: synthetic setup → PCNet train → SPAA sweep →
simulated 'real' capture → per-setup summary table — the full benchmark
pipeline (reference ``reproduce_paper_results.py``) without hardware or
the 3.25 GB dataset. This is the integration slice the reference never had
(SURVEY.md §4)."""

import glob
import os
from os.path import join

import numpy as np
import pytest

from spaa_tpu.attack import (get_attacker_cfg, project_capture_real_attack,
                             run_projector_based_attack,
                             summarize_single_attacker)
from spaa_tpu.utils.sim_procams import DEFAULT_SIM_SETUP_INFO, SimProCams


@pytest.fixture(scope="module")
def attacked_setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e"))
    info = dict(DEFAULT_SIM_SETUP_INFO)
    info.update(prj_im_sz=[64, 64], cam_im_sz=[64, 48],
                classifier_crop_sz=[48, 48])
    sim = SimProCams(info)
    sim.make_setup(root, "e2e", num_train=16, num_test=4)

    cfg = get_attacker_cfg("SPAA", root, ["e2e"])
    cfg.max_iters = 30           # tiny PCNet training
    cfg.attack_iters = 6         # tiny SPAA budget
    cfg.classifier_names = ["resnet18"]
    cfg.stealth_losses = ["caml2"]
    cfg.d_threshes = [5]
    cfg = run_projector_based_attack(cfg)
    return root, sim, cfg


def test_attack_outputs_reference_layout(attacked_setup):
    root, sim, cfg = attacked_setup
    advs = glob.glob(join(root, "setups/e2e/prj/adv/**/*.png"),
                     recursive=True)
    cams = glob.glob(join(root, "setups/e2e/cam/infer/adv/**/*.png"),
                     recursive=True)
    # 10 targeted + 1 untargeted per config
    assert len(advs) == 11, advs
    assert len(cams) == 11
    # reference directory naming: <attacker_cfg>/<loss>/<d_thr>/<classifier>
    assert any("SPAA_PCNet_l1+ssim" in a and "/caml2/5/resnet18/" in a
               for a in advs)


def test_real_capture_and_summary(attacked_setup):
    root, sim, cfg = attacked_setup
    project_capture_real_attack(cfg, sim)
    raws = glob.glob(join(root, "setups/e2e/cam/raw/adv/**/*.png"),
                     recursive=True)
    assert len(raws) == 11

    df = summarize_single_attacker(
        attacker_name="SPAA", data_root=root, setup_list=["e2e"],
        classifier_names=["resnet18"], stealth_losses=["caml2"],
        d_threshes=[5])
    assert len(df) == 1
    row = df.iloc[0]
    assert row["Setup"] == "e2e"
    assert 0.0 <= row["T.top-1_infer"] <= 1.0
    # stealthiness metric blocks present and sane (PSNR may be inf when an
    # attack never succeeded and best == init → identical images)
    assert np.isfinite(row["U.real_dE"])
    assert np.isfinite(row["All.prj_SSIM"])
    assert row["T.infer_PSNR"] > 0
    # stats files written like the reference
    assert os.path.exists(join(root, "setups/e2e/ret",
                               "SPAA_PCNet_l1+ssim_500_24_2000",
                               "stats.txt")) or glob.glob(
        join(root, "setups/e2e/ret/**/stats*"), recursive=True)


def test_summarize_all_attackers_pivot(attacked_setup):
    """Cross-setup gather + pivot table (paper Table 1 layout,
    ref projector_based_attack.py:577-614). Runs after the per-setup
    stats exist (previous test)."""
    from spaa_tpu.attack import summarize_all_attackers
    root, sim, cfg = attacked_setup
    if not glob.glob(join(root, "setups/e2e/ret/**/stats.txt",),
                     recursive=True):
        pytest.skip("per-setup stats not generated")
    table, pivot = summarize_all_attackers(["SPAA"], root, ["e2e"])
    assert len(table) >= 1
    assert "T.top-1_real" in pivot.columns
    names = list(pivot.index.names)
    assert names == ["Attacker", "d_thr", "Stealth_loss", "Classifier"]
    assert os.path.exists(join(root, "setups/stats_all.txt"))
