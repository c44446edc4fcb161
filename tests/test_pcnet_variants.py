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


@pytest.mark.parametrize("variant", ["PCNet", "PCNet_no_rough"])
def test_make_pcnet_fn_bf16_with_cached_surface(variant):
    """Regression: make_pcnet_fn(compute_dtype='bfloat16') must cast the
    baked surface features (f32 in the simplify cache) to the compute
    dtype — PCNet_no_rough's cache carries SurfaceFeatures and previously
    raised a conv dtype mismatch in the bf16 attack path. The fine grid
    stays f32 (coordinate precision; grid_sample returns the image dtype).
    """
    from spaa_tpu.attack.orchestrate import make_pcnet_fn
    from spaa_tpu.train.pipeline import TrainedModel, _build_pcnet

    key = jax.random.PRNGKey(0)
    model, params = _build_pcnet(variant, CAM_HW, CORNERS, key)
    rng = np.random.default_rng(2)
    scene = rng.random((1, *CAM_HW, 3), np.float32)
    mask = np.ones((*CAM_HW, 1), np.float32)
    trained = TrainedModel(model=model, params=params, mask=mask,
                           cam_scene=scene, setup_info={"prj_im_sz":
                                                        [PRJ_HW[1], PRJ_HW[0]]},
                           cfg=None, name=variant)

    prj = jnp.asarray(rng.random((3, *PRJ_HW, 3), np.float32))
    apply32, st32 = make_pcnet_fn(trained, use_pallas_warp=False,
                                  compute_dtype="float32")
    out32 = np.asarray(apply32(st32, prj))
    apply16, st16 = make_pcnet_fn(trained, use_pallas_warp=False,
                                  compute_dtype="bfloat16")
    if variant == "PCNet_no_rough":
        assert st16["cache"].surface_feats is not None
    out16 = np.asarray(apply16(st16, prj))
    assert out16.dtype == np.float32           # f32 in/out contract
    assert np.isfinite(out16).all()
    # bf16 has ~3 decimal digits; the nets are shallow so stay close
    np.testing.assert_allclose(out16, out32, atol=0.05)
