"""Mid-train resume (optimizer state + iteration) and the real-weights
file plumbing drill.

Resume: SURVEY §5's named improvement over the reference's params-only
save-at-end (ref ``utils.py:717-721``) — a killed run must continue from
its last segment snapshot and reproduce the uninterrupted trajectory.

Weights drill: a torch-layout ``.pth`` dropped on disk must drive
``load_params``' pth→npz→cache branch end-to-end (ref ``classifier.py:24-36``
pinned checkpoints), flipping ``Classifier.loaded_pretrained``.
"""

import os
from os.path import join

import numpy as np
import pytest

import jax.numpy as jnp
import optax

from spaa_tpu.train.train import sample_batch_indices, train_model_scan
from spaa_tpu.utils.config import DictConfig


def _toy_problem():
    rng = np.random.default_rng(0)
    x = rng.random((32, 8)).astype(np.float32)
    w_true = rng.random((8, 4)).astype(np.float32)
    y = x @ w_true
    params = {"w": jnp.zeros((8, 4), jnp.float32)}

    def loss_fn(p, xb, yb, itr):
        del itr
        l2 = jnp.mean((xb @ p["w"] - yb) ** 2)
        return l2, l2

    return params, loss_fn, dict(inputs=x, targets=y)


def test_mid_train_resume_matches_uninterrupted(tmp_path):
    params, loss_fn, arrays = _toy_problem()
    tx = optax.adam(1e-2)
    idx = sample_batch_indices(32, 8, 40, __import__("random").Random(5))
    cfg = DictConfig(dict(max_iters=40, valid_rate=10))

    p_full, *_ = train_model_scan(loss_fn, params, tx, arrays, idx, cfg)

    # interrupted run: kill (exception) during the validation callback at
    # iter 20 — the segment snapshot was already written
    rp = str(tmp_path / "toy.resume.npz")
    calls = []

    def killer(p):
        calls.append(1)
        if len(calls) == 2:
            raise KeyboardInterrupt("simulated kill")
        return 0.0, 0.0, 0.0, None

    with pytest.raises(KeyboardInterrupt):
        train_model_scan(loss_fn, params, tx, arrays, idx, cfg,
                         valid_fn=killer, resume_path=rp)
    assert os.path.exists(rp), "segment snapshot must survive the kill"

    # 'new process': fresh zero params, same precomputed index plan —
    # resume loads (params, Adam moments, iter=20) and runs 20..40
    p_fresh, _, arrays2 = _toy_problem()
    p_resumed, *_ = train_model_scan(loss_fn, p_fresh, tx, arrays2, idx,
                                     cfg, resume_path=rp)
    np.testing.assert_allclose(np.asarray(p_resumed["w"]),
                               np.asarray(p_full["w"]), rtol=0, atol=1e-6)
    assert not os.path.exists(rp), "completed run must remove the snapshot"


def test_resume_roundtrips_optimizer_state(tmp_path):
    """save/load_train_state preserve the full pytree (params + nested
    optax state + iteration) through the flat-npz encoding."""
    from spaa_tpu.utils import log as L
    params, loss_fn, arrays = _toy_problem()
    tx = optax.chain(optax.add_decayed_weights(1e-4), optax.adam(1e-3))
    opt_state = tx.init(params)
    path = str(tmp_path / "state.npz")
    L.save_train_state(path, params, opt_state, 123, fingerprint=0xBEEF)
    p2, s2, it, fp = L.load_train_state(path, params, opt_state)
    assert it == 123 and fp == 0xBEEF
    ref_leaves = [np.asarray(x) for x in
                  __import__("jax").tree.leaves((params, opt_state))]
    got_leaves = [np.asarray(x) for x in
                  __import__("jax").tree.leaves((p2, s2))]
    assert len(ref_leaves) == len(got_leaves)
    for a, b in zip(ref_leaves, got_leaves):
        np.testing.assert_array_equal(a, b)


# --------------------------------------------------------- weights drill
torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def resnet_pth_dir(tmp_path_factory):
    """A torchvision-layout resnet18 .pth under the pinned URL's basename
    (where tools/convert_weights.py tells the operator to drop it)."""
    from tests.torch_oracles import TorchResNet18
    from spaa_tpu.models.classifiers import PRETRAINED_URLS
    d = str(tmp_path_factory.mktemp("checkpoint"))
    torch.manual_seed(3)
    net = TorchResNet18()
    net.eval()
    torch.save(net.state_dict(),
               join(d, os.path.basename(PRETRAINED_URLS["resnet18"])))
    return d, net


def test_pth_file_drives_load_params_and_caches_npz(resnet_pth_dir):
    from spaa_tpu.models.classifiers import (Classifier, clear_params_cache,
                                             params_source)
    d, net = resnet_pth_dir
    clear_params_cache()
    clf = Classifier("resnet18", weights_dir=d)
    assert clf.loaded_pretrained and clf.params_source == "pth"
    assert os.path.exists(join(d, "resnet18.npz")), \
        "conversion must cache the converted params as npz"

    # converted weights actually drive the forward: logits must match the
    # torch oracle on the same input (f32 tolerance)
    rng = np.random.default_rng(1)
    im = rng.random((1, 64, 64, 3)).astype(np.float32)
    raw, _, _ = clf(jnp.asarray(im), crop_sz=(64, 64))
    from spaa_tpu.models.classifiers import normalize_imagenet
    from spaa_tpu.ops.image import resize_area
    pre = np.asarray(normalize_imagenet(
        resize_area(jnp.asarray(im), (224, 224))))
    with torch.no_grad():
        ref = net(torch.from_numpy(pre.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(raw), ref, rtol=2e-3, atol=2e-4)

    # second load resolves from the npz cache (no torch involved)
    clear_params_cache()
    assert params_source("resnet18", d) == "npz"
    # models without dropped files stay on deterministic random init
    assert params_source("vgg16", d) == "random"
    clear_params_cache()


def test_convert_weights_verify_drill(resnet_pth_dir, capsys, monkeypatch):
    """The one-command real-weights drill (VERDICT r4 #8):
    ``tools/convert_weights.py --verify`` must convert the dropped .pth,
    run the scene-agreement check of ref ``main.py:135``, and emit ONE
    bench-style JSON line with weight provenance — driven here end-to-end
    on the fake torchvision-layout .pth."""
    import importlib
    import json
    import sys as _sys

    from spaa_tpu.models.classifiers import clear_params_cache
    d, _ = resnet_pth_dir
    clear_params_cache()
    tool = importlib.import_module("tools.convert_weights")
    monkeypatch.setattr(_sys, "argv",
                        ["convert_weights.py", "--weights-dir", d,
                         "--models", "resnet18", "--verify"])
    rc = tool.main()
    assert rc == 0
    out = capsys.readouterr().out
    line = next(l for l in out.splitlines()
                if l.startswith('{"metric": "real_weights_drill"'))
    rec = json.loads(line)
    assert rec["value"] == 1                      # one model converted
    assert rec["extra"]["weights_source"]["resnet18"] in ("pth", "npz")
    assert rec["extra"]["scene"] == "synthetic_probe"
    assert "resnet18" in rec["extra"]["top1"]
    assert os.path.exists(join(d, "resnet18.npz"))
    clear_params_cache()


def test_agreement_guard_uses_pretrained_flag(resnet_pth_dir):
    """Classifier.loaded_pretrained drives the scene-agreement policy:
    assert with real weights (ref main.py:135), warn with random init."""
    from spaa_tpu.models.classifiers import Classifier, clear_params_cache
    d, _ = resnet_pth_dir
    clear_params_cache()
    assert Classifier("resnet18", weights_dir=d).loaded_pretrained
    assert not Classifier("vgg16", weights_dir=d).loaded_pretrained
    clear_params_cache()
