"""Weight-conversion correctness vs torch (cpu): the layout transforms and
eval-BatchNorm math that the torchvision checkpoint converter relies on.
torchvision itself is not installed; these tests validate the building
blocks with plain torch modules carrying the same state_dict layout."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from flax import linen as nn

from spaa_tpu.models.classifiers.convert import _bn, _conv, _lin
from spaa_tpu.models.classifiers.resnet import EvalBatchNorm


def test_conv_layout_matches_torch(rng):
    t_conv = torch.nn.Conv2d(5, 7, 3, stride=2, padding=1, bias=True)
    x = rng.random((2, 5, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = t_conv(torch.from_numpy(x)).numpy()

    kernel = _conv(t_conv.weight.detach().numpy())        # OIHW -> HWIO
    bias = t_conv.bias.detach().numpy()
    mod = nn.Conv(7, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])
    out = mod.apply({"params": {"kernel": jnp.asarray(kernel),
                                "bias": jnp.asarray(bias)}},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_linear_layout_matches_torch(rng):
    t_fc = torch.nn.Linear(24, 10)
    x = rng.random((3, 24)).astype(np.float32)
    with torch.no_grad():
        ref = t_fc(torch.from_numpy(x)).numpy()
    out = nn.Dense(10).apply(
        {"params": {"kernel": jnp.asarray(_lin(t_fc.weight.detach().numpy())),
                    "bias": jnp.asarray(t_fc.bias.detach().numpy())}},
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("eps", [1e-5, 1e-3])
def test_eval_batchnorm_matches_torch(rng, eps):
    t_bn = torch.nn.BatchNorm2d(6, eps=eps)
    # non-trivial running stats + affine
    with torch.no_grad():
        t_bn.weight.copy_(torch.from_numpy(
            rng.random(6).astype(np.float32) + 0.5))
        t_bn.bias.copy_(torch.from_numpy(
            rng.random(6).astype(np.float32) - 0.5))
        t_bn.running_mean.copy_(torch.from_numpy(
            rng.random(6).astype(np.float32)))
        t_bn.running_var.copy_(torch.from_numpy(
            rng.random(6).astype(np.float32) + 0.2))
    t_bn.eval()
    x = rng.random((2, 6, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = t_bn(torch.from_numpy(x)).numpy()

    sd = {"b.weight": t_bn.weight.detach().numpy(),
          "b.bias": t_bn.bias.detach().numpy(),
          "b.running_mean": t_bn.running_mean.numpy(),
          "b.running_var": t_bn.running_var.numpy()}
    params = {k: jnp.asarray(v) for k, v in _bn(sd, "b").items()}
    out = EvalBatchNorm(eps=eps).apply({"params": params},
                                       jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_npz_roundtrip(tmp_path, rng):
    from spaa_tpu.models.classifiers import load_params_npz, save_params_npz
    tree = {"a": {"b": rng.random((3, 4)).astype(np.float32)},
            "c": rng.random((5,)).astype(np.float32)}
    path = str(tmp_path / "p.npz")
    save_params_npz(tree, path)
    back = load_params_npz(path)
    np.testing.assert_array_equal(back["a"]["b"], tree["a"]["b"])
    np.testing.assert_array_equal(back["c"], tree["c"])
