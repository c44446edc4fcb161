"""Utility-layer contracts: config round-trip, checkpoint save/load,
config-string naming (a de-facto API — directory names in the benchmark
dataset are derived from it), log files, host image processing."""

import os
from os.path import join

import numpy as np
import pytest

import jax.numpy as jnp


def test_dictconfig_attribute_and_yaml_roundtrip(tmp_path):
    from spaa_tpu.utils.config import DictConfig, OmegaConf
    cfg = DictConfig(dict(a=1, nested=dict(b=[1, 2], c="x")))
    cfg.d = 4.5
    assert cfg.a == 1 and cfg.nested.b == [1, 2] and cfg["d"] == 4.5
    path = str(tmp_path / "cfg.yml")
    OmegaConf.save(cfg, path)
    back = OmegaConf.load(path)
    assert back.nested.c == "x" and back.d == 4.5
    cp = cfg.copy()
    del cp["a"]
    assert "a" in cfg and "a" not in cp


def test_opt_to_string_matches_reference_scheme():
    """Checkpoint/directory naming must match the reference layout
    (ref utils.py:673-675: setup_model_loss_num_batch_iters_lr_...)."""
    from spaa_tpu.train import get_model_train_cfg
    from spaa_tpu.utils.log import opt_to_string
    cfg = get_model_train_cfg(["PCNet"], "d", ["setup_x"], single=True)
    cfg.setup_name = "setup_x"
    s = opt_to_string(cfg)
    assert s.startswith("setup_x_PCNet_l1+ssim_500_24_2000"), s


def test_checkpoint_roundtrip(tmp_path):
    from spaa_tpu.utils.log import load_checkpoint, save_checkpoint
    params = {"layer": {"kernel": jnp.ones((3, 4)), "bias": jnp.zeros(4)}}
    path = save_checkpoint(str(tmp_path), params, "test_model")
    assert os.path.exists(path)
    template = {"layer": {"kernel": jnp.zeros((3, 4)),
                          "bias": jnp.full((4,), 7.0)}}
    back = load_checkpoint(path, template)
    np.testing.assert_array_equal(np.asarray(back["layer"]["kernel"]),
                                  np.ones((3, 4)))
    np.testing.assert_array_equal(np.asarray(back["layer"]["bias"]),
                                  np.zeros(4))


def test_log_files_roundtrip(tmp_path):
    import pandas as pd
    from spaa_tpu.utils.log import init_log_file, read_log, write_log_file
    ret, txt, xls = init_log_file(str(tmp_path))
    ret.loc[0] = ["s", "PCNet", "l1+ssim", 500, 24, 2000,
                  30.0, 0.01, 0.99, 1.0, 0.5, 0.2]
    write_log_file(ret, txt, xls)
    back = read_log(txt)
    assert back.iloc[0]["Model"] == "PCNet"
    assert abs(float(back.iloc[0]["PSNR"]) - 30.0) < 1e-6


def test_checkerboard_and_gray_pattern():
    from spaa_tpu.utils.imgproc_host import checkerboard, create_gray_pattern
    # MATLAB-style checkerboard(n, p, q): n-px squares, 2p x 2q tiles
    cb = checkerboard(16, 2, 3)
    assert cb.shape == (16 * 4, 16 * 6)
    # left half black/white tiles; shifting by one square flips the value
    assert cb[0, 0] != cb[0, 16]
    assert cb[0, 0] != cb[16, 0]
    gray = create_gray_pattern(128, 96)
    assert gray.shape[0] > 2 and gray.shape[1:] == (96, 128, 3)
    assert gray.dtype == np.uint8


def test_threshold_im_masks_projection_footprint():
    from spaa_tpu.utils.imgproc_host import threshold_im
    im = np.zeros((60, 80, 3), np.float32)
    im[15:45, 20:60] = 0.8          # bright projection region
    mask, roi, corners = threshold_im(im)
    assert mask.dtype == bool and roi.dtype == bool
    frac = mask.mean()
    assert 0.1 < frac < 0.6
    c = np.asarray(corners)
    assert c.min() >= -1.01 and c.max() <= 1.01


def test_sim_procams_capture_consistency(tmp_path):
    """The simulator's capture() must match its own generated dataset
    (same warp + shading), so hardware-free attacks are physically
    consistent."""
    from spaa_tpu.utils.io import imread
    from spaa_tpu.utils.sim_procams import DEFAULT_SIM_SETUP_INFO, SimProCams
    info = dict(DEFAULT_SIM_SETUP_INFO)
    info.update(prj_im_sz=[32, 32], cam_im_sz=[32, 24],
                classifier_crop_sz=[24, 24])
    sim = SimProCams(info)
    root = str(tmp_path)
    sim.make_setup(root, "s", num_train=3, num_test=2)
    prj = imread(join(root, "setups/s/prj/raw/ref/img_0002.png"))
    cam_saved = imread(join(root, "setups/s/cam/raw/ref/img_0002.png"))
    cam_live = sim.capture(prj)
    # png quantization only
    assert np.abs(cam_saved - cam_live).max() < 2.5 / 255.0


def test_number_patterns_and_sync_test(tmp_path):
    """Numbers sync-test patterns (ref main.py:52-61): generated, ordered,
    distinguishable; sync_test projects+captures them through a ProCams."""
    from spaa_tpu.utils.imgproc_host import create_number_pattern
    from spaa_tpu.utils.procams import sync_test
    from spaa_tpu.utils.sim_procams import DEFAULT_SIM_SETUP_INFO, SimProCams

    pats = create_number_pattern(64, 48, count=5)
    assert pats.shape == (5, 48, 64, 3)
    assert pats.min() >= 0.0 and pats.max() <= 1.0
    # each pattern differs from every other (digits are distinguishable)
    for i in range(5):
        for j in range(i + 1, 5):
            assert np.abs(pats[i] - pats[j]).max() > 0.1

    info = dict(DEFAULT_SIM_SETUP_INFO)
    info.update(prj_im_sz=[64, 64], cam_im_sz=[64, 48])
    sim = SimProCams(info)
    root = str(tmp_path)
    cap = sync_test(sim, root, count=3)
    import glob
    assert len(glob.glob(join(root, "prj_share/numbers/*.png"))) == 3
    assert len(glob.glob(join(cap, "*.png"))) == 3


def test_make_grid_transposed_layout():
    from spaa_tpu.utils.imgproc_host import make_grid, make_grid_transposed
    ims = np.arange(6, dtype=np.float32).reshape(6, 1, 1, 1) \
        * np.ones((6, 2, 3, 1), np.float32)
    g = make_grid_transposed(ims, nrow=2, padding=0)
    # column-major: image k at (row k%2, col k//2)
    assert g.shape == (4, 9, 1)
    assert g[0, 0, 0] == 0 and g[2, 0, 0] == 1
    assert g[0, 3, 0] == 2 and g[2, 3, 0] == 3
    # row-major counterpart differs
    g2 = make_grid(ims, nrow=3, padding=0)
    assert g2[0, 3, 0] == 1


def test_vis_pcnet_process_montage(tmp_path):
    """vis_pcnet_process (ref utils.py:239-256): builds the 8-panel
    intermediate-results montage headlessly."""
    import jax
    import jax.numpy as jnp
    from spaa_tpu.models import PCNet
    from spaa_tpu.utils.vis import vis_pcnet_process

    rng = np.random.default_rng(0)
    cam_hw, prj_hw = (24, 32), (16, 16)
    model = PCNet(out_size=cam_hw)
    mask = np.ones((*cam_hw, 1), np.float32)
    scene = rng.random((1, *cam_hw, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, *prj_hw, 3)), jnp.asarray(scene),
                        jnp.asarray(mask))["params"]
    prj = rng.random((1, *prj_hw, 3)).astype(np.float32)
    train = rng.random((1, *cam_hw, 3)).astype(np.float32)
    montage = vis_pcnet_process(model, params, prj, scene, train, mask)
    # 8 panels in a 2-row transposed grid at camera size + 5px padding
    assert montage.shape == (2 * 24 + 3 * 5, 4 * 32 + 5 * 5, 3)
    assert np.isfinite(montage).all()


def test_center_crop_np_clamps_oversized_requests():
    """A preview crop larger than the camera frame must clamp to the
    frame (negative offsets produced garbage corner slivers)."""
    from spaa_tpu.utils.procams import _center_crop_np
    im = np.arange(480 * 640 * 3, dtype=np.uint8).reshape(480, 640, 3)
    out = _center_crop_np(im, (800, 600))        # (w, h) larger than frame
    assert out.shape == (480, 640, 3)
    np.testing.assert_array_equal(out, im)
    out2 = _center_crop_np(im, (320, 240))
    assert out2.shape == (240, 320, 3)
    np.testing.assert_array_equal(out2, im[120:360, 160:480])


def test_profiling_trace_and_meter(tmp_path):
    """jax.profiler trace context writes a trace dir; IterMeter counts."""
    import time as _time

    import jax.numpy as jnp

    from spaa_tpu.utils.profiling import IterMeter, trace
    d = str(tmp_path / "trace")
    with trace(d):
        _ = jnp.arange(8).sum().block_until_ready()
    assert os.path.isdir(d) and os.listdir(d), "trace dir must be written"
    m = IterMeter()
    m.update(3)
    _time.sleep(0.01)
    m.update(2)
    assert m.elapsed > 0 and m.iters_per_sec > 0
    assert "it/s" in str(m)


def test_attack_results_standalone_montage():
    """attack_results without precomputed panels (public API fallback):
    builds the 5-panel annotated montage from raw arrays, uint8 or float."""
    from spaa_tpu.attack.summarize import attack_results
    rng = np.random.default_rng(2)
    n, cam_hw, prj = 3, (24, 32), (16, 16)
    cam_scene = rng.random((1, *cam_hw, 3)).astype(np.float32)
    cam_infer = (rng.random((n, *cam_hw, 3)) * 255).astype(np.uint8)
    cam_real = (rng.random((n, *cam_hw, 3)) * 255).astype(np.uint8)
    prj_adv = (rng.random((n, *prj, 3)) * 255).astype(np.uint8)
    im_gray = np.full((1, *prj, 3), 0.5, np.float32)
    p = np.full((n, 10), 0.1)
    idx = np.tile(np.arange(10), (n, 1))
    ret = {"scene": (None, p[:1], idx[:1]),
           "infer": (None, p, idx), "real": (None, p, idx)}
    labels = {i: f"c{i}" for i in range(10)}
    m = attack_results(ret, 1, labels, im_gray, prj_adv, cam_scene,
                       cam_infer, cam_real, [prj[1], prj[0]], (20, 20))
    assert m.ndim == 3 and m.shape[2] == 3
    assert np.isfinite(m).all() and m.min() >= 0 and m.max() <= 1


def test_seed_determinism_across_reseeds():
    """reset_rng_seeds (ref utils.py:70-76) makes numpy/python/JAX draws
    reproducible: reseeding with the same seed replays identical streams;
    a different seed diverges."""
    import random

    import jax

    from spaa_tpu.utils.seed import reset_rng_seeds, set_reproducibility

    key_a = reset_rng_seeds(7)
    np_a = np.random.random(5)
    py_a = [random.random() for _ in range(5)]
    jx_a = np.asarray(jax.random.uniform(key_a, (5,)))

    key_b = reset_rng_seeds(7)
    np.testing.assert_array_equal(np_a, np.random.random(5))
    assert py_a == [random.random() for _ in range(5)]
    np.testing.assert_array_equal(
        jx_a, np.asarray(jax.random.uniform(key_b, (5,))))

    key_c = reset_rng_seeds(8)
    assert not np.array_equal(np_a, np.random.random(5))
    assert not np.array_equal(
        jx_a, np.asarray(jax.random.uniform(key_c, (5,))))

    set_reproducibility(True)   # API-parity no-op must not raise
