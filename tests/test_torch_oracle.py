"""End-to-end classifier numeric parity vs torch oracles.

Random state_dicts in torchvision layout (tests/torch_oracles.py) are run
through ``convert_state_dict`` and the Flax logits must match the torch
oracle's logits. Both sides compute in float64 from the *same* float32
weights, so any layout/stride/pool-semantics mistake shows up far above the
assertion tolerance while fp noise stays far below it.

This proves the conversion path the real pinned checkpoints will take
(ref ``classifier.py:24-36``) without needing network egress.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from jax import enable_x64

from spaa_tpu.models.classifiers import _MODELS, make_logits_fn
from spaa_tpu.models.classifiers.convert import convert_state_dict
from torch_oracles import ORACLES, randomize_weights

import torch.nn.functional as F


def _to_f64(tree):
    return jax.tree.map(lambda a: jnp.asarray(np.asarray(a, np.float64)), tree)


def _build(name, seed):
    oracle = randomize_weights(ORACLES[name](), seed=seed).double().eval()
    params = convert_state_dict(name, oracle.state_dict())
    return oracle, params


@pytest.mark.parametrize("name", ["resnet18", "vgg16", "inception_v3"])
def test_network_logits_match_torch_oracle(name):
    oracle, params = _build(name, seed=hash(name) % 1000)
    cls, input_sz = _MODELS[name]
    rng = np.random.default_rng(7)
    # post-normalize domain input (the raw network, no pipeline)
    x = rng.uniform(-2.0, 2.0, (1, *input_sz, 3)).astype(np.float32)

    with torch.no_grad():
        ref = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)).double()).numpy()

    with enable_x64():
        model = cls()
        out = jax.jit(model.apply)({"params": _to_f64(params)},
                                   jnp.asarray(x, jnp.float64))
        out = np.asarray(out)

    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def _torch_classify(oracle, x_nchw, cp_sz, input_sz):
    """Reference classify pipeline (classifier.py:55-60) in torch:
    center-crop -> 'area' resize -> ImageNet normalize -> forward."""
    h, w = x_nchw.shape[2:]
    th, tw = cp_sz
    i = int(round((h - th) / 2.0))
    j = int(round((w - tw) / 2.0))
    x = x_nchw[:, :, i:i + th, j:j + tw]
    x = F.interpolate(x, input_sz, mode="area")
    mean = torch.tensor([0.485, 0.456, 0.406], dtype=torch.float32)
    std = torch.tensor([0.229, 0.224, 0.225], dtype=torch.float32)
    x = (x - mean.view(1, 3, 1, 1).double()) / std.view(1, 3, 1, 1).double()
    return oracle(x)


@pytest.mark.parametrize("name", ["resnet18", "inception_v3"])
def test_classify_pipeline_logits_match_torch_oracle(name):
    """Full pipeline parity at the reference's camera-image geometry:
    240x320 image, crop (240,240), area-resize to the model input size.
    inception_v3 additionally covers transform_input through the pipeline."""
    oracle, params = _build(name, seed=42)
    input_sz = _MODELS[name][1]
    rng = np.random.default_rng(3)
    im = rng.random((2, 240, 320, 3)).astype(np.float32)

    with torch.no_grad():
        ref = _torch_classify(
            oracle, torch.from_numpy(im.transpose(0, 3, 1, 2)).double(),
            (240, 240), input_sz).numpy()

    with enable_x64():
        logits_fn = make_logits_fn(name)
        out = np.asarray(jax.jit(logits_fn, static_argnums=2)(
            _to_f64(params), jnp.asarray(im, jnp.float64), (240, 240)))

    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)
