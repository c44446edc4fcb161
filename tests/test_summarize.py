"""Regression tests for summarize_single_attacker's per-setup stats tables
(ref ``projector_based_attack.py:448-451``: the table is reset per setup;
round-2 accumulated rows across setups, double-counting them when
summarize_all_attackers concatenates the per-setup stats files) and the
incomplete-cell skip path, plus the engine-free xlsx output contract."""

import os
from os.path import join

import numpy as np
import pandas as pd
import pytest

from spaa_tpu.attack.orchestrate import to_attacker_cfg_str
from spaa_tpu.attack.summarize import summarize_single_attacker
from spaa_tpu.utils.io import save_imgs
from spaa_tpu.utils.xlsx import read_xlsx


PRJ = 16          # tiny projector size: montages stay cheap
CAM_H, CAM_W = 24, 32
CROP = 16


def _write_setup(data_root, setup_name, cells, rng, n_imgs=11):
    """Create a synthetic result tree for SPAA without running any attack:
    setup_info.yml, the reference capture, and per-cell prj/adv +
    cam/infer/adv + cam/raw/adv image dirs."""
    setup_path = join(data_root, "setups", setup_name)
    os.makedirs(join(setup_path, "cam/raw/ref"), exist_ok=True)
    with open(join(setup_path, "setup_info.yml"), "w") as f:
        f.write(
            "prj_im_sz: [%d, %d]\ncam_im_sz: [%d, %d]\n"
            "classifier_crop_sz: [%d, %d]\nprj_brightness: 0.5\n"
            % (PRJ, PRJ, CAM_W, CAM_H, CROP, CROP))
    scene = rng.random((3, CAM_H, CAM_W, 3)).astype(np.float32)
    save_imgs(scene, join(setup_path, "cam/raw/ref"))

    attacker_cfg_str = to_attacker_cfg_str("SPAA")[0]
    for stealth_loss, d_thr, clf, n in cells:
        folder = join(attacker_cfg_str, stealth_loss, str(d_thr), clf)
        m = n if n is not None else n_imgs
        save_imgs(rng.random((m, PRJ, PRJ, 3)).astype(np.float32),
                  join(setup_path, "prj/adv", folder))
        save_imgs(rng.random((m, CAM_H, CAM_W, 3)).astype(np.float32),
                  join(setup_path, "cam/infer/adv", folder))
        save_imgs(rng.random((m, CAM_H, CAM_W, 3)).astype(np.float32),
                  join(setup_path, "cam/raw/adv", folder))
    return setup_path


@pytest.fixture(scope="module")
def two_setup_results(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("summarize"))
    rng = np.random.default_rng(7)
    # s1: one complete cell; s2: one complete + one INCOMPLETE cell
    # (5 of 11 images — exercises the skip path, ref :484-496 spirit)
    _write_setup(root, "s1", [("caml2", 5, "resnet18", None)], rng)
    _write_setup(root, "s2", [("caml2", 5, "resnet18", None),
                              ("caml2", 7, "resnet18", 5)], rng)
    return root


def test_per_setup_stats_have_only_own_rows(two_setup_results):
    """Called with a multi-setup list, setup k's stats.txt must contain
    exactly setup k's rows (round-2 bug: rows of setups 1..k-1 leaked in
    and were double-counted by summarize_all_attackers)."""
    root = two_setup_results
    df = summarize_single_attacker(
        "SPAA", root, ["s1", "s2"], classifier_names=["resnet18"],
        stealth_losses=["caml2"], d_threshes=[5])
    # returned table: concatenation of both setups (documented deviation)
    assert list(df["Setup"]) == ["s1", "s2"]

    attacker_cfg_str = to_attacker_cfg_str("SPAA")[0]
    for s in ["s1", "s2"]:
        stats = pd.read_csv(join(root, "setups", s, "ret", attacker_cfg_str,
                                 "stats.txt"), sep="\t")
        assert list(stats["Setup"]) == [s], \
            f"stats.txt of {s} must contain exactly its own rows"


def test_incomplete_cell_is_skipped(two_setup_results):
    """A result folder with fewer than 11 images is skipped with a notice
    (no 'truth value of an array is ambiguous' from dict-containment)."""
    root = two_setup_results
    df = summarize_single_attacker(
        "SPAA", root, ["s2"], classifier_names=["resnet18"],
        stealth_losses=["caml2"], d_threshes=[5, 7])
    assert len(df) == 1                      # d_thr=7 cell dropped
    assert df.iloc[0]["d_thr"] == 5


def test_stats_xlsx_written_and_readable(two_setup_results):
    """The xlsx half of the output contract (ref :573) must materialize in
    this image (no pandas Excel engine) and round-trip a cell value."""
    root = two_setup_results
    summarize_single_attacker(
        "SPAA", root, ["s1"], classifier_names=["resnet18"],
        stealth_losses=["caml2"], d_threshes=[5])
    attacker_cfg_str = to_attacker_cfg_str("SPAA")[0]
    xlsx = join(root, "setups/s1/ret", attacker_cfg_str, "stats.xlsx")
    txt = join(root, "setups/s1/ret", attacker_cfg_str, "stats.txt")
    assert os.path.exists(xlsx)
    rows = read_xlsx(xlsx)
    stats = pd.read_csv(txt, sep="\t")
    assert rows[0][:5] == ["Setup", "Attacker", "Stealth_loss", "d_thr",
                           "Classifier"]
    assert rows[1][0] == "s1"
    # a float column round-trips at the %.4f precision of the txt file
    col = rows[0].index("All.real_L2")
    assert rows[1][col] == pytest.approx(stats["All.real_L2"][0], abs=1e-4)


def test_recreate_imgs_false_skips_existing_montages(two_setup_results):
    """Stats-only mode: montages that already exist are not rewritten (and
    the panels device pass is skipped), while stats.txt is recomputed."""
    import glob
    import time
    root = two_setup_results
    kw = dict(classifier_names=["resnet18"], stealth_losses=["caml2"],
              d_threshes=[5])
    summarize_single_attacker("SPAA", root, ["s1"], **kw)   # montages exist
    pngs = sorted(glob.glob(join(root, "setups/s1/ret/**/img_*.png"),
                            recursive=True))
    assert len(pngs) == 11
    before = {p: os.path.getmtime(p) for p in pngs}
    stats = join(root, "setups/s1/ret",
                 to_attacker_cfg_str("SPAA")[0], "stats.txt")
    stats_before = os.path.getmtime(stats)
    time.sleep(0.05)
    df = summarize_single_attacker("SPAA", root, ["s1"],
                                   recreate_imgs=False, **kw)
    assert len(df) == 1
    assert os.path.getmtime(stats) > stats_before, "stats recomputed"
    after = {p: os.path.getmtime(p) for p in pngs}
    assert before == after, "montages must not be rewritten"


def test_summarize_all_attackers_writes_xlsx(two_setup_results):
    from spaa_tpu.attack.summarize import summarize_all_attackers
    root = two_setup_results
    table, pivot = summarize_all_attackers(["SPAA"], root, ["s1", "s2"])
    # both setups' rows, each exactly once (the round-2 bug would
    # double-count s1's row via s2's stats file)
    assert sorted(table["Setup"]) == ["s1", "s2"]
    for fn in ["stats_all.xlsx", "pivot_table_all.xlsx"]:
        path = join(root, "setups", fn)
        assert os.path.exists(path), fn
        assert read_xlsx(path), fn
    pivot_rows = read_xlsx(join(root, "setups/pivot_table_all.xlsx"))
    # MultiIndex levels written as leading columns
    assert pivot_rows[0][:4] == ["Attacker", "d_thr", "Stealth_loss",
                                 "Classifier"]
    assert pivot_rows[1][0] == to_attacker_cfg_str("SPAA")[0]


def test_host_resize_matches_device_and_feeds_montage():
    """Summarize's montage panels resize on the HOST (resize_area_np —
    the stacks originate there, so the device round-trip was pure wire
    cost). Contract: the numpy twin matches the device resize_area to f32
    accumulation order (≤2e-7 here), and attack_results renders the full
    5-panel montage from host panels, uint8 path included."""
    import jax.numpy as jnp

    from spaa_tpu.attack.summarize import attack_results
    from spaa_tpu.ops.image import center_crop, resize_area
    from spaa_tpu.utils.imgproc_host import resize_area_np

    rng = np.random.default_rng(3)
    n, cp, prj_hw = 5, (CROP, CROP), (PRJ, PRJ)
    scene = rng.random((1, CAM_H, CAM_W, 3)).astype(np.float32)
    ci = (rng.random((n, CAM_H, CAM_W, 3)) * 255).astype(np.uint8)
    cr = (rng.random((n, CAM_H, CAM_W, 3)) * 255).astype(np.uint8)

    ci_f = center_crop(ci, cp).astype(np.float32) / 255.0
    host = resize_area_np(ci_f, prj_hw)
    dev = np.asarray(resize_area(jnp.asarray(ci_f), prj_hw))
    assert host.shape == dev.shape == (n, *prj_hw, 3)
    np.testing.assert_allclose(host, dev, atol=2e-7)
    # downscale + non-4D forms
    np.testing.assert_allclose(
        resize_area_np(ci_f[0], (8, 8)),
        np.asarray(resize_area(jnp.asarray(ci_f[0]), (8, 8))), atol=2e-7)
    # identity when sizes already match
    np.testing.assert_array_equal(resize_area_np(ci_f, cp), ci_f)

    # full montage from host panels (summarize's render() path)
    scene_rz = resize_area_np(center_crop(scene, cp), prj_hw)[0]
    real_rz = resize_area_np(center_crop(cr, cp).astype(np.float32) / 255.0,
                             prj_hw)
    prj_adv = (rng.random((n, PRJ, PRJ, 3)) * 255).astype(np.uint8)
    im_gray = np.full((1, PRJ, PRJ, 3), 0.5, np.float32)
    p = np.full((n, 10), 0.1)
    idx = np.tile(np.arange(10), (n, 1))
    ret = {"scene": (None, p[:1], idx[:1]),
           "infer": (None, p, idx), "real": (None, p, idx)}
    labels = {i: f"c{i}" for i in range(10)}
    l2 = np.ones(n)
    panels = (scene_rz, host, real_rz, l2, l2, l2)
    m_u8 = attack_results(ret, 1, labels, im_gray, prj_adv, scene,
                          None, None, [PRJ, PRJ], cp, panels=panels,
                          as_uint8=True)
    assert m_u8.dtype == np.uint8 and m_u8.ndim == 3
    # 5 panels with 5-px padding
    assert m_u8.shape[1] == 5 * PRJ + 6 * 5
