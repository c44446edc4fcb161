"""PCNet ablation variants (ref paper Table 3 / ``models.py:305-345``
flags): the reference's model_list accepts PCNet_no_mask / _no_rough /
w/o_refine names — each must build, forward, and backprop."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spaa_tpu.train.pipeline import _build_pcnet

CAM_HW, PRJ_HW = (24, 32), (16, 16)
CORNERS = [(-0.7, -0.6), (0.8, -0.55), (0.75, 0.7), (-0.65, 0.72)]


@pytest.mark.parametrize("variant,expect_name", [
    ("PCNet", "PCNet"),
    ("PCNet_no_mask", "PCNet_no_mask"),
    ("PCNet_no_rough", "PCNet_no_rough"),
    ("PCNet_w/o_refine", "PCNet"),          # refine toggle not in the name
    ("PCNet_no_mask_no_rough", "PCNet_no_mask_no_rough"),
])
def test_variant_builds_forward_and_grads(variant, expect_name):
    key = jax.random.PRNGKey(0)
    model, params = _build_pcnet(variant, CAM_HW, CORNERS, key)
    assert model.model_name == expect_name
    assert model.use_mask == ("no_mask" not in variant)
    assert model.use_rough == ("no_rough" not in variant)
    assert model.with_refine == ("w/o_refine" not in variant)

    rng = np.random.default_rng(1)
    prj = jnp.asarray(rng.random((2, *PRJ_HW, 3), np.float32))
    # one fixed scene broadcast over the batch — the simplify cache bakes
    # surface features for THE scene (production semantics)
    scene = jnp.broadcast_to(
        jnp.asarray(rng.random((1, *CAM_HW, 3), np.float32)),
        (2, *CAM_HW, 3))
    mask = jnp.ones((*CAM_HW, 1), jnp.float32)
    out = model.apply({"params": params}, prj, scene, mask)
    assert out.shape == (2, *CAM_HW, 3)
    assert np.isfinite(np.asarray(out)).all()

    def loss(p):
        return jnp.mean(model.apply({"params": p}, prj, scene, mask) ** 2)

    grads = jax.grad(loss)(params)
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0

    # simplify cache works for every variant (no_rough caches the surface
    # branch; rough variants keep it in the hot path)
    cache = model.apply({"params": params}, scene[:1], None,
                        method=type(model).simplify_cache)
    out2 = model.apply({"params": params}, prj, scene, mask, cache=cache)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=2e-5)
