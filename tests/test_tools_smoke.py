"""CI pin for the measurement-harness variant grids (VERDICT r4 #6).

tools/taps_ab.py and tools/incontext_ab.py time default-OFF rewrites
(taps_stem/taps_pool/taps_enc2, packed_encoder True/'enc1'/'enc2',
subpix_tconv) inside the production TPU programs. Their timing loops can
only run on hardware, but their variant GRIDS are plain data — and a grid
that drifts from the live model API (renamed knob, changed semantics)
makes the next TPU A/B silently measure the wrong thing. This smoke walks
every grid entry through the actual constructors on tiny shapes and
asserts each variant still matches the baseline forward (all knobs are
value-preserving rewrites by contract).

Deep numeric coverage of the knobs themselves lives elsewhere:
tests/test_taps_bwd.py (taps fwd/bwd parity incl. full-size zoo modules),
tests/test_models.py (packed_encoder/subpix equality + rejection).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tools import incontext_ab, taps_ab


CAM_HW, PRJ_HW = (24, 32), (16, 16)


@pytest.fixture(scope="module")
def tiny_pcnet_world():
    from spaa_tpu.models import PCNet

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((2, *PRJ_HW, 3), np.float32))
    s = jnp.asarray(rng.random((1, *CAM_HW, 3), np.float32))
    mask = jnp.ones((*CAM_HW, 1), jnp.float32)
    base = PCNet(out_size=CAM_HW)
    params = base.init(jax.random.PRNGKey(0), x[:1], s, mask)["params"]
    y0 = np.asarray(base.apply({"params": params}, x, s, mask))
    return x, s, mask, params, y0


def _pcnet_variant_close(kw, world):
    from spaa_tpu.models import PCNet

    x, s, mask, params, y0 = world
    model = PCNet(out_size=CAM_HW, **kw)
    # same param tree: every knob is an apply-time rewrite (ckpt compat)
    p2 = model.init(jax.random.PRNGKey(0), x[:1], s, mask)["params"]
    assert jax.tree.structure(p2) == jax.tree.structure(params), kw
    y = np.asarray(model.apply({"params": params}, x, s, mask))
    np.testing.assert_allclose(y, y0, rtol=1e-5, atol=1e-5,
                               err_msg=f"variant {kw} diverged")


def test_incontext_ab_combos_construct_and_match(tiny_pcnet_world):
    assert len(incontext_ab.COMBOS) >= 6
    for name, kw in incontext_ab.COMBOS:
        _pcnet_variant_close(kw, tiny_pcnet_world)


def test_taps_ab_variant_grid_pcnet_side(tiny_pcnet_world):
    assert taps_ab.VARIANTS_QUICK == (taps_ab.VARIANTS[0],
                                      taps_ab.VARIANTS[-1])
    seen_ptaps = set()
    for label, kw, ptaps in taps_ab.VARIANTS:
        seen_ptaps.add(ptaps)
        # the exact pcnet_taps -> PCNet kwargs mapping build_sweep applies
        # (tools/trace_attack.py:78-81)
        enc2 = ptaps == "enc2"
        _pcnet_variant_close(dict(taps_stem=bool(True if enc2 else ptaps),
                                  taps_enc2=enc2), tiny_pcnet_world)
    assert {False, True, "enc2"} <= seen_ptaps


def test_taps_ab_variant_grid_classifier_side():
    """Every classifier model_kw in the grid still constructs the real zoo
    modules, and the cheapest member (resnet18) stays forward-equal across
    the grid on a tiny input (taps rewrites never change the forward)."""
    from spaa_tpu.models.classifiers import _MODELS

    kws = [kw for _, kw, _ in taps_ab.VARIANTS]
    assert {"taps_stem", "taps_pool"} == set().union(*[set(k) for k in kws])
    for name in ("resnet18", "vgg16", "inception_v3"):
        cls, _ = _MODELS[name]
        for kw in kws:
            cls(**kw)   # kwarg drift raises here

    cls, _ = _MODELS["resnet18"]
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.random((1, 64, 64, 3), np.float32))
    ref = None
    for kw in kws:
        m = cls(**kw)
        p = m.init(jax.random.PRNGKey(0), x)["params"]
        y = np.asarray(m.apply({"params": p}, x))
        if ref is None:
            ref = y
        else:
            np.testing.assert_array_equal(y, ref, err_msg=f"{kw}")
