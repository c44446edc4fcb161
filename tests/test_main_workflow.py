"""The documented operator workflow end-to-end: ``main.py`` steps 1-10 on
the simulator at tiny debug budgets (VERDICT r2 #3 'Done' criterion — the
3-attacker pivot out of the step-by-step workflow, ref ``main.py:18-225``)."""

import importlib.util
import os
import sys
from os.path import dirname, join

import pandas as pd
import pytest

REPO = dirname(dirname(os.path.abspath(__file__)))


def _load_main():
    spec = importlib.util.spec_from_file_location("spaa_main",
                                                  join(REPO, "main.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_main_workflow_steps_1_to_3_smoke(tmp_path, monkeypatch):
    """Default-suite smoke of the operator workflow's plumbing: setup
    creation, sync test + synthetic capture, and the clean-scene
    classifier-agreement gate (ref ``main.py:19-135``) — without the
    train/attack/summarize phases the nightly 1-10 e2e covers."""
    root = str(tmp_path / "data")
    mod = _load_main()
    argv = ["main.py", "--data-root", root, "--setup-name", "wf",
            "--steps", "1-3",
            "--sim-size", "64", "64", "64", "48",
            "--num-train", "8",
            "--classifiers", "resnet18"]
    monkeypatch.setattr(sys, "argv", argv)
    mod.main()

    setup = join(root, "setups/wf")
    from spaa_tpu.utils.config import OmegaConf
    info = OmegaConf.load(join(setup, "setup_info.yml"))
    assert list(info["prj_im_sz"]) == [64, 64]
    assert os.path.isdir(join(root, "setups/sync_test/cam/raw/numbers"))
    # step 2's synthetic capture follows the reference dir contract
    for sub in ["cam/raw/ref", "cam/raw/train", "cam/raw/test", "cam/raw/cb"]:
        assert os.listdir(join(setup, sub)), sub


@pytest.mark.slow
@pytest.mark.nightly
def test_main_workflow_steps_1_to_10(tmp_path, monkeypatch):
    root = str(tmp_path / "data")
    mod = _load_main()
    argv = ["main.py", "--data-root", root, "--setup-name", "wf",
            "--steps", "1-10",
            "--sim-size", "64", "64", "64", "48",
            "--num-train", "16",
            "--train-iters", "30", "--attack-iters", "6",
            "--classifiers", "resnet18",
            "--stealth-losses", "caml2", "--d-threshes", "5",
            "--op-budget", "21", "1", "6", "6"]
    monkeypatch.setattr(sys, "argv", argv)
    mod.main()

    # per-setup stats for each attacker + the cross-attacker artifacts
    setups = join(root, "setups")
    stats_all = join(setups, "stats_all.txt")
    assert os.path.exists(stats_all)
    table = pd.read_csv(stats_all, sep="\t")
    attackers = set(table["Attacker"])
    assert len(attackers) == 3, attackers      # SPAA + PerC-AL + One-pixel
    assert set(table["Setup"]) == {"wf"}
    for fn in ["stats_all.xlsx", "pivot_table_all.xlsx"]:
        assert os.path.exists(join(setups, fn)), fn
    # sync-test artifact from step 2 (numbers patterns through the sim)
    assert os.path.isdir(join(root, "setups/sync_test/cam/raw/numbers"))
    # the workflow's own setup_info reflects the debug sim size
    from spaa_tpu.utils.config import OmegaConf
    info = OmegaConf.load(join(setups, "wf/setup_info.yml"))
    assert list(info["prj_im_sz"]) == [64, 64]
