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


def test_percal_compennet_pp_e2e(attacked_setup):
    """PerC-AL+CompenNet++ end-to-end at tiny shapes: CompenNet init +
    CompenNet++ training, the fused targeted+untargeted PerC-AL batch,
    simulated real capture, and the per-setup stats row
    (ref projector_based_attack.py:342-359 + :417-574)."""
    root, sim, _ = attacked_setup
    cfg = get_attacker_cfg("PerC-AL+CompenNet++", root, ["e2e"])
    cfg.max_iters = 30           # CompenNet++ training budget
    cfg.init_max_iters = 20      # CompenNet init pretrain budget
    cfg.attack_iters = 6         # PerC-AL budget
    cfg.classifier_names = ["resnet18"]
    cfg = run_projector_based_attack(cfg)

    advs = glob.glob(join(root, "setups/e2e/prj/adv/PerC-AL+CompenNet++*",
                          "**/*.png"), recursive=True)
    assert len(advs) == 11, advs
    assert any("/camdE/11/resnet18/" in a for a in advs)

    project_capture_real_attack(cfg, sim)
    df = summarize_single_attacker(
        attacker_name="PerC-AL+CompenNet++", data_root=root,
        setup_list=["e2e"], classifier_names=["resnet18"])
    assert len(df) == 1
    row = df.iloc[0]
    assert row["Stealth_loss"] == "camdE" and row["d_thr"] == 11
    assert np.isfinite(row["All.real_dE"])


def test_one_pixel_de_e2e(attacked_setup):
    """One-pixel_DE end-to-end at tiny DE budget through the simulator
    project-and-capture loop, then its stats row with the '-'/'-' grid
    semantics (ref projector_based_attack.py:444-446)."""
    root, sim, _ = attacked_setup
    cfg = get_attacker_cfg("One-pixel_DE", root, ["e2e"])
    cfg.classifier_names = ["resnet18"]
    cfg.op_pixel_size = 21
    cfg.op_maxiter = 1
    cfg.op_popsize_untargeted = 8
    cfg.op_popsize_targeted = 6
    run_projector_based_attack(cfg, procams=sim)

    advs = glob.glob(join(root, "setups/e2e/prj/adv/One-pixel_DE/**/*.png"),
                     recursive=True)
    assert len(advs) == 11, advs
    assert any("/-/-/resnet18/" in a for a in advs)
    # model-free attacker captures raw camera frames directly
    raws = glob.glob(join(root,
                          "setups/e2e/cam/raw/adv/One-pixel_DE/**/*.png"),
                     recursive=True)
    assert len(raws) == 11

    df = summarize_single_attacker(
        attacker_name="One-pixel_DE", data_root=root, setup_list=["e2e"],
        classifier_names=["resnet18"])
    assert len(df) == 1
    row = df.iloc[0]
    assert row["Stealth_loss"] == "-" and row["d_thr"] == "-"
    assert 0.0 <= row["T.top-1_real"] <= 1.0


def test_summarize_all_attackers_pivot(attacked_setup):
    """Cross-setup gather + pivot table over ALL THREE attackers (paper
    Table 1 layout, ref projector_based_attack.py:577-614). Runs after
    the per-setup stats exist (previous tests)."""
    from spaa_tpu.attack import summarize_all_attackers
    root, sim, cfg = attacked_setup
    if not glob.glob(join(root, "setups/e2e/ret/**/stats.txt",),
                     recursive=True):
        pytest.skip("per-setup stats not generated")
    attackers = ["SPAA"]
    for name, pat in [("PerC-AL+CompenNet++", "PerC-AL+CompenNet++*"),
                      ("One-pixel_DE", "One-pixel_DE")]:
        if glob.glob(join(root, "setups/e2e/ret", pat, "stats.txt")):
            attackers.append(name)
    table, pivot = summarize_all_attackers(attackers, root, ["e2e"])
    assert len(table) >= len(attackers)
    assert "T.top-1_real" in pivot.columns
    names = list(pivot.index.names)
    assert names == ["Attacker", "d_thr", "Stealth_loss", "Classifier"]
    assert os.path.exists(join(root, "setups/stats_all.txt"))
    if len(attackers) == 3:  # one pivot row per attacker config
        assert len(pivot) >= 3
