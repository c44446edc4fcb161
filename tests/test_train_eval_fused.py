"""Fused (single-dispatch) evaluator vs the chunked loop path, the
pipelined async-validation training loop, and small utility shims."""

import numpy as np
import pytest

import jax.numpy as jnp
import optax

from spaa_tpu.train.train import (huber, make_evaluator,
                                  sample_batch_indices, train_model_scan)
from spaa_tpu.utils.config import DictConfig


def _setup_eval(n=40, fused=None):
    rng = np.random.default_rng(3)
    w = rng.random((12, 6)).astype(np.float32)

    def apply_fn(p, x, sc):
        del sc
        return jnp.tanh(x.reshape(x.shape[0], -1) @ p["w"]).reshape(
            x.shape[0], 1, 2, 3)

    params = {"w": jnp.asarray(w)}
    v_in = rng.integers(0, 256, (n, 2, 2, 3), np.uint8)
    v_gt = rng.integers(0, 256, (n, 1, 2, 3), np.uint8)
    scene = rng.random((1, 1, 2, 3), np.float32)
    return params, make_evaluator(apply_fn, v_in, v_gt, scene, fused=fused)


def test_fused_evaluator_matches_loop_path():
    """Forcing the fused (lax.map, one-dispatch) path on CPU must give the
    same metrics as the chunked loop path (equal chunks → equal weights)."""
    params, ev_fused = _setup_eval(fused=True)
    _, ev_loop = _setup_eval(fused=False)
    pf, rf, sf, _ = ev_fused(params)
    pl, rl, sl, _ = ev_loop(params)
    assert pf == pytest.approx(pl, abs=1e-4)
    assert rf == pytest.approx(rl, abs=1e-6)
    assert sf == pytest.approx(sl, abs=1e-5)
    # async handle exists only on the fused evaluator
    assert hasattr(ev_fused, "async_metrics")
    assert not hasattr(ev_loop, "async_metrics")
    a = np.asarray(ev_fused.async_metrics(params))
    assert a.shape == (3,) and a[0] == pytest.approx(pf, abs=1e-5)


def test_train_loop_with_async_validation_matches_sync():
    """The pipelined loop with an async (fused) evaluator must produce the
    same final params as with the sync evaluator — validation never feeds
    back into the trajectory."""
    rng = np.random.default_rng(0)
    x = rng.random((24, 1, 2, 3)).astype(np.float32)
    y = np.tanh(x * 0.5).astype(np.float32)[:, :, :, :3].reshape(24, 1, 2, 3)
    params = {"w": jnp.zeros((6, 6), jnp.float32)}

    def loss_fn(p, xb, yb, itr):
        del itr
        pred = (xb.reshape(xb.shape[0], -1) @ p["w"]).reshape(yb.shape)
        l2 = jnp.mean((pred - yb) ** 2)
        return l2, l2

    def apply_fn(p, xb, sc):
        del sc
        return (xb.reshape(xb.shape[0], -1) @ p["w"]).reshape(
            xb.shape[0], 1, 2, 3)

    scene = rng.random((1, 1, 2, 3), np.float32)
    ev_async = make_evaluator(apply_fn, x, y, scene, chunk_sz=8,
                              fused=True)
    ev_sync = make_evaluator(apply_fn, x, y, scene, chunk_sz=8,
                             fused=False)
    assert hasattr(ev_async, "async_metrics")

    tx = optax.adam(1e-2)
    idx = sample_batch_indices(24, 8, 30, __import__("random").Random(1))
    cfg = DictConfig(dict(max_iters=30, valid_rate=10))
    arrays = dict(inputs=x, targets=y)
    p1, psnr1, *_ = train_model_scan(loss_fn, params, tx, arrays, idx, cfg,
                                     valid_fn=ev_async)
    p2, psnr2, *_ = train_model_scan(loss_fn, params, tx, arrays, idx, cfg,
                                     valid_fn=ev_sync)
    np.testing.assert_allclose(np.asarray(p1["w"]), np.asarray(p2["w"]),
                               rtol=0, atol=0)
    assert psnr1 == pytest.approx(psnr2, abs=1e-4)


def test_uint8_wire_trajectory_equivalent():
    """uint8 wire tensors (k cast to f32 and /255 on device) produce the
    same training trajectory as the float k/255 tensors up to compiler
    reassociation of the /255 (measured ulp-level, ~4e-8 after 20 Adam
    iters) — the input VALUES are bit-identical; only fusion differs."""
    rng = np.random.default_rng(9)
    x_u8 = rng.integers(0, 256, (16, 2, 2, 3), np.uint8)
    y_u8 = rng.integers(0, 256, (16, 1, 2, 3), np.uint8)
    x_f = x_u8.astype(np.float32) / 255.0
    y_f = y_u8.astype(np.float32) / 255.0
    params = {"w": jnp.zeros((12, 6), jnp.float32)}

    def loss_fn(p, xb, yb, itr):
        del itr
        pred = (xb.reshape(xb.shape[0], -1) @ p["w"]).reshape(yb.shape)
        l2 = jnp.mean((pred - yb) ** 2)
        return l2, l2

    tx = optax.adam(1e-2)
    idx = sample_batch_indices(16, 8, 20, __import__("random").Random(2))
    cfg = DictConfig(dict(max_iters=20, valid_rate=10))
    p_u8, *_ = train_model_scan(loss_fn, params, tx,
                                dict(inputs=x_u8, targets=y_u8), idx, cfg)
    p_f, *_ = train_model_scan(loss_fn, params, tx,
                               dict(inputs=x_f, targets=y_f), idx, cfg)
    np.testing.assert_allclose(np.asarray(p_u8["w"]), np.asarray(p_f["w"]),
                               rtol=0, atol=1e-6)


def test_utility_shims(tmp_path):
    from spaa_tpu.models.classifiers import idx_to_label
    from spaa_tpu.utils.log import export_setup_info, log_to_table
    from spaa_tpu.utils.config import DictConfig as DC, OmegaConf

    labels = {0: "tench", 7: "cock", 9: "ostrich"}
    assert idx_to_label(labels, [0, 2]) == ["tench", "ostrich"]

    cfg = DC(dict(prj_im_sz=[256, 256], prj_brightness=0.5))
    export_setup_info(str(tmp_path), cfg)
    back = OmegaConf.load(str(tmp_path / "setup_info.yml"))
    assert list(back["prj_im_sz"]) == [256, 256]

    with open(tmp_path / "old.log", "w") as f:
        f.write("A B C\n1 2 3\n4 5 6\n")
    df = log_to_table(str(tmp_path / "old.log"))
    assert list(df.columns) == ["A", "B", "C"] and df["B"][1] == 5

    a = jnp.asarray(np.full((2, 4, 4, 3), 0.5, np.float32))
    b = jnp.asarray(np.full((2, 4, 4, 3), 0.6, np.float32))
    assert float(huber(a, a)) == pytest.approx(0.0, abs=1e-6)
    assert float(huber(a, b)) > 0

    from spaa_tpu.utils.imgproc_host import montage
    ims = np.random.default_rng(0).random((5, 8, 6, 3)).astype(np.float32)
    g = montage(ims)                       # 5 → 3x2 grid (rows=ceil(sqrt))
    assert g.shape == (3 * 13 + 5, 2 * 11 + 5, 3)
    # reference (H, W, C, N) layout accepted
    g2 = montage(ims.transpose(1, 2, 3, 0))
    np.testing.assert_array_equal(g, g2)
