"""conv2d_taps_bwd: tap-GEMM backward-data vs XLA's conv transpose.

The forward must be bitwise-identical to conv2d_nhwc; the input gradient
mathematically identical (accumulation reordered), and the weight gradient
untouched. Covers the classifier-stem shapes the SPAA attack
differentiates through (resnet18 7x7/2 p3, inception 3x3/2 p0 on an odd
299 input) plus stride-1 and asymmetric-shape cases.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spaa_tpu.models.layers import conv2d_nhwc, conv2d_taps_bwd


CASES = [
    # (in_hw, cin, cout, k, s, p)  — stems + generic shapes
    ((224, 224), 3, 8, 7, 2, 3),   # resnet18 stem (cout shrunk)
    ((299, 299), 3, 8, 3, 2, 0),   # inception stem: odd size, no pad
    ((20, 28), 3, 16, 3, 1, 1),    # stride 1
    ((17, 13), 5, 4, 5, 3, 2),     # odd everything, s > kh coverage
    ((10, 10), 2, 3, 2, 2, 0),     # k == s
    ((9, 11), 3, 4, 4, 2, 1),      # even k, odd input
]


@pytest.mark.parametrize("in_hw,cin,cout,k,s,p", CASES)
def test_taps_bwd_matches_xla(in_hw, cin, cout, k, s, p):
    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.standard_normal((2, *in_hw, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.1,
                    jnp.float32)

    y_ref, vjp_ref = jax.vjp(
        lambda a, b: conv2d_nhwc(a, b, None, (s, s), (p, p)), x, w)
    y_tap, vjp_tap = jax.vjp(
        lambda a, b: conv2d_taps_bwd(a, b, (s, s), (p, p)), x, w)

    # forward is the same primitive — bitwise
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_tap))

    cot = jnp.asarray(rng.standard_normal(y_ref.shape), jnp.float32)
    gx_ref, gw_ref = vjp_ref(cot)
    gx_tap, gw_tap = vjp_tap(cot)
    # input grad: identical sums, reordered accumulation
    np.testing.assert_allclose(np.asarray(gx_tap), np.asarray(gx_ref),
                               rtol=1e-5, atol=1e-5)
    # weight grad: same rule on both paths
    np.testing.assert_allclose(np.asarray(gw_tap), np.asarray(gw_ref),
                               rtol=1e-5, atol=1e-5)


def test_taps_bwd_bf16_close():
    """The TPU attack path runs classifiers in bf16: the tap-GEMM still
    dots in f32 (preferred_element_type) and only the <=16 overlap-adds
    happen in bf16, so the igrad must stay within a few bf16 ulps of the
    XLA backward (which accumulates everything in f32 before rounding)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, 56, 56, 3)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((7, 7, 3, 16)) * 0.1, jnp.bfloat16)

    y_ref, vjp_ref = jax.vjp(
        lambda a: conv2d_nhwc(a, w, None, (2, 2), (3, 3)), x)
    y_tap, vjp_tap = jax.vjp(
        lambda a: conv2d_taps_bwd(a, w, (2, 2), (3, 3)), x)
    np.testing.assert_array_equal(
        np.asarray(y_ref, np.float32), np.asarray(y_tap, np.float32))

    cot = jnp.asarray(rng.standard_normal(y_ref.shape) * 0.1, jnp.bfloat16)
    gx_ref = np.asarray(vjp_ref(cot)[0], np.float32)
    gx_tap = np.asarray(vjp_tap(cot)[0], np.float32)
    scale = np.abs(gx_ref).max()
    np.testing.assert_allclose(gx_tap, gx_ref, atol=0.05 * scale, rtol=0.1)


def test_taps_bwd_second_order_not_needed_but_jits():
    """The attack jits the igrad inside fori_loop — make sure the custom
    vjp traces under jit and grad-of-scalar composition."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 16, 16, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 4)) * 0.1, jnp.float32)

    @jax.jit
    def loss_grad(x, w):
        return jax.grad(
            lambda a: jnp.sum(conv2d_taps_bwd(a, w, (2, 2), (1, 1)) ** 2))(x)

    g = loss_grad(x, w)
    g_ref = jax.grad(
        lambda a: jnp.sum(conv2d_nhwc(a, w, None, (2, 2), (1, 1)) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)


def test_stem_module_param_compat():
    """ConvStemTapsBwd must expose the exact same param tree as the
    nn.Conv it replaces, so converted torchvision weights load as before."""
    from flax import linen as nn
    from spaa_tpu.models.layers import ConvStemTapsBwd

    x = jnp.zeros((1, 32, 32, 3))
    ref = nn.Conv(8, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                  use_bias=False, kernel_init=nn.initializers.he_normal(),
                  name="conv1")
    new = ConvStemTapsBwd(8, (7, 7), (2, 2), (3, 3), name="conv1")
    p_ref = ref.init(jax.random.PRNGKey(0), x)["params"]
    p_new = new.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree.structure(p_ref) == jax.tree.structure(p_new)
    assert (jax.tree.map(lambda a: a.shape, p_ref)
            == jax.tree.map(lambda a: a.shape, p_new))
    # identical init draw given the same key/shape/initializer
    np.testing.assert_array_equal(*(np.asarray(t)
                                    for t in (p_ref["kernel"],
                                              p_new["kernel"])))
    y_ref = ref.apply({"params": p_ref},
                      jnp.ones((1, 32, 32, 3)))
    y_new = new.apply({"params": p_new}, jnp.ones((1, 32, 32, 3)))
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_new),
                               rtol=1e-6, atol=1e-6)


def test_stem_module_bias_compat():
    """use_bias=True must match nn.Conv(use_bias=True): same param tree
    (kernel+bias), same forward, and the bias gradient is the plain
    cotangent sum (the bias add sits outside the custom vjp)."""
    from flax import linen as nn
    from spaa_tpu.models.layers import ConvStemTapsBwd

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((2, 20, 20, 3)), jnp.float32)
    ref = nn.Conv(6, (3, 3), (1, 1), padding=[(1, 1), (1, 1)],
                  kernel_init=nn.initializers.he_normal(), name="conv0")
    new = ConvStemTapsBwd(6, (3, 3), (1, 1), (1, 1), use_bias=True,
                          name="conv0")
    p_ref = ref.init(jax.random.PRNGKey(1), x)["params"]
    p_new = new.init(jax.random.PRNGKey(1), x)["params"]
    assert jax.tree.structure(p_ref) == jax.tree.structure(p_new)
    np.testing.assert_array_equal(np.asarray(p_ref["kernel"]),
                                  np.asarray(p_new["kernel"]))

    def loss(mod, p):
        return jnp.sum(mod.apply({"params": p}, x) ** 2)

    l_ref, g_ref = jax.value_and_grad(lambda p: loss(ref, p))(p_ref)
    l_new, g_new = jax.value_and_grad(lambda p: loss(new, p))(p_new)
    np.testing.assert_allclose(float(l_ref), float(l_new), rtol=1e-6)
    for k in ("kernel", "bias"):
        np.testing.assert_allclose(np.asarray(g_ref[k]),
                                   np.asarray(g_new[k]),
                                   rtol=1e-5, atol=1e-5)


def test_max_pool_taps_bwd_exact():
    """Forward bitwise; gradient routing exact (integer cotangents are
    bitwise even for overlapping 3x3/s2 windows — incl. on tie-heavy
    relu-like inputs and the resnet -inf-pad pattern); float gradients
    bitwise for non-overlapping 2x2/s2, ulp-close for 3x3/s2."""
    from flax import linen as nn
    from spaa_tpu.models.layers import max_pool_taps_bwd

    rng = np.random.default_rng(0)
    cases = [((8, 8), 4, (2, 2)), ((30, 30), 8, (3, 3)),
             ((17, 13), 3, (3, 3)), ((12, 10), 2, (2, 2))]
    for hw, c, k in cases:
        # tie-heavy: quantized relu-like values with many exact zeros
        x = jnp.asarray(np.maximum(
            rng.integers(-3, 4, (2, *hw, c)).astype(np.float32), 0.0))
        y0, v0 = jax.vjp(lambda a: nn.max_pool(a, k, (2, 2),
                                               padding="VALID"), x)
        y1, v1 = jax.vjp(lambda a: max_pool_taps_bwd(a, k, (2, 2)), x)
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
        cot = jnp.asarray(rng.standard_normal(y0.shape).astype(np.float32))
        g0, g1 = np.asarray(v0(cot)[0]), np.asarray(v1(cot)[0])
        if k == (2, 2):
            np.testing.assert_array_equal(g0, g1)
        else:
            np.testing.assert_allclose(g1, g0, rtol=1e-5, atol=1e-6)
        coti = jnp.asarray(rng.integers(-4, 5, y0.shape).astype(np.float32))
        np.testing.assert_array_equal(np.asarray(v0(coti)[0]),
                                      np.asarray(v1(coti)[0]))

    # resnet stem pattern: -inf pad then 3x3/s2 VALID
    x = jnp.asarray(rng.standard_normal((2, 20, 20, 4)).astype(np.float32))

    def pad(a):
        return jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)),
                       constant_values=-jnp.inf)

    y0, v0 = jax.vjp(lambda a: nn.max_pool(pad(a), (3, 3), (2, 2),
                                           padding="VALID"), x)
    y1, v1 = jax.vjp(lambda a: max_pool_taps_bwd(pad(a), (3, 3), (2, 2)), x)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    coti = jnp.asarray(rng.integers(-4, 5, y0.shape).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(v0(coti)[0]),
                                  np.asarray(v1(coti)[0]))


@pytest.mark.parametrize("name", ["resnet18", "vgg16", "inception_v3"])
def test_classifier_taps_stem_toggle_parity(name):
    """All taps rewrites on (the make_logits_fn TPU default) vs all off on
    the real zoo modules: same param tree and values, bitwise forward,
    matching input grad — so the rewrites can never change
    converted-weight loading or logits."""
    from spaa_tpu.models.classifiers import _MODELS

    cls, sz = _MODELS[name]
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((1, *sz, 3), np.float32))
    m1 = cls(taps_stem=True, taps_pool=True)
    m0 = cls(taps_stem=False, taps_pool=False)
    p1 = m1.init(jax.random.PRNGKey(0), x)["params"]
    p0 = m0.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree.structure(p0) == jax.tree.structure(p1)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(m0.apply({"params": p0}, x)),
        np.asarray(m1.apply({"params": p1}, x)))
    g1 = jax.grad(lambda a: jnp.sum(m1.apply({"params": p1}, a) ** 2))(x)
    g0 = jax.grad(lambda a: jnp.sum(m0.apply({"params": p0}, a) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=2e-4, atol=2e-4)


def test_pcnet_taps_stem_toggle_parity():
    """PCNet(taps_stem=True) vs default: identical param tree/values and
    forward, matching prj-input grad — the attack-path opt-in
    (make_pcnet_fn) can never change results."""
    from spaa_tpu.models import PCNet

    rng = np.random.default_rng(5)
    cam_hw, prj_hw = (48, 64), (32, 32)
    x = jnp.asarray(rng.random((2, *prj_hw, 3), np.float32))
    s = jnp.asarray(rng.random((1, *cam_hw, 3), np.float32))
    mask = jnp.ones((*cam_hw, 1), jnp.float32)
    m0, m1 = (PCNet(out_size=cam_hw, taps_stem=t) for t in (False, True))
    p0 = m0.init(jax.random.PRNGKey(0), x[:1], s, mask)["params"]
    p1 = m1.init(jax.random.PRNGKey(0), x[:1], s, mask)["params"]
    assert jax.tree.structure(p0) == jax.tree.structure(p1)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(m0.apply({"params": p0}, x, s, mask)),
        np.asarray(m1.apply({"params": p1}, x, s, mask)))
    g0 = jax.grad(lambda a: jnp.sum(
        m0.apply({"params": p0}, a, s, mask) ** 2))(x)
    g1 = jax.grad(lambda a: jnp.sum(
        m1.apply({"params": p1}, a, s, mask) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=2e-4, atol=2e-4)
    # training parity: kernel grads of the taps convs follow the same rule
    tg0 = jax.grad(lambda p: jnp.sum(
        m0.apply({"params": p}, x, s, mask) ** 2))(p0)
    tg1 = jax.grad(lambda p: jnp.sum(
        m1.apply({"params": p}, x, s, mask) ** 2))(p1)
    for a, b in zip(jax.tree.leaves(tg0), jax.tree.leaves(tg1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)


def test_make_pcnet_fn_taps_clone_parity():
    """The attack-path opt-in (make_pcnet_fn(taps_stem=True) -> model
    .clone) must give the same forward and prj-grad as the XLA path with
    the same TrainedModel — guards the production TPU program on CPU."""
    from spaa_tpu.attack.orchestrate import make_pcnet_fn
    from spaa_tpu.models import PCNet
    from spaa_tpu.train.pipeline import TrainedModel

    rng = np.random.default_rng(11)
    cam_hw, prj_hw = (48, 64), (32, 32)
    pcnet = PCNet(out_size=cam_hw)
    scene = rng.random((1, *cam_hw, 3), np.float32)
    mask = jnp.ones((*cam_hw, 1), jnp.float32)
    params = pcnet.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, *prj_hw, 3)), jnp.asarray(scene),
                        mask)["params"]
    setup_info = {"prj_im_sz": [prj_hw[1], prj_hw[0]],
                  "cam_im_sz": [cam_hw[1], cam_hw[0]],
                  "classifier_crop_sz": [32, 32]}
    trained = TrainedModel(pcnet, params, mask, scene, setup_info,
                           None, "PCNet")
    prj = jnp.asarray(rng.random((2, *prj_hw, 3), np.float32))

    outs, grads = [], []
    for taps in (False, True):
        apply_fn, state = make_pcnet_fn(trained, use_pallas_warp=False,
                                        compute_dtype="float32",
                                        taps_stem=taps)
        outs.append(np.asarray(apply_fn(state, prj)))
        g = jax.grad(lambda p: jnp.sum(apply_fn(state, p) ** 2))(prj)
        grads.append(np.asarray(g))
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_allclose(grads[1], grads[0], rtol=2e-4, atol=2e-4)


def test_taps_machinery_fuzz():
    """Randomized shapes/strides/paddings for both rewrites — guards the
    phase-grouped overlap-add's generality beyond the hand-picked CASES."""
    from flax import linen as nn
    from spaa_tpu.models.layers import max_pool_taps_bwd

    rng = np.random.default_rng(123)
    for _ in range(8):
        kh, kw = int(rng.integers(1, 6)), int(rng.integers(1, 6))
        sh, sw = int(rng.integers(1, 4)), int(rng.integers(1, 4))
        ph, pw = int(rng.integers(0, kh + 1)), int(rng.integers(0, kw + 1))
        hh = int(rng.integers(max(kh - 2 * ph, 1), 24))
        ww = int(rng.integers(max(kw - 2 * pw, 1), 24))
        if hh + 2 * ph < kh or ww + 2 * pw < kw:
            continue
        ci, co = int(rng.integers(1, 6)), int(rng.integers(1, 6))
        x = jnp.asarray(rng.standard_normal((2, hh, ww, ci)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((kh, kw, ci, co)) * 0.3,
                        jnp.float32)
        y0, v0 = jax.vjp(lambda a: conv2d_nhwc(a, w, None, (sh, sw),
                                               (ph, pw)), x)
        y1, v1 = jax.vjp(lambda a: conv2d_taps_bwd(a, w, (sh, sw),
                                                   (ph, pw)), x)
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
        cot = jnp.asarray(rng.standard_normal(y0.shape), jnp.float32)
        np.testing.assert_allclose(np.asarray(v1(cot)[0]),
                                   np.asarray(v0(cot)[0]),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"conv k={kh,kw} s={sh,sw} "
                                           f"p={ph,pw} in={hh,ww}")

    for _ in range(8):
        kh, kw = int(rng.integers(1, 5)), int(rng.integers(1, 5))
        sh, sw = int(rng.integers(1, 4)), int(rng.integers(1, 4))
        hh = int(rng.integers(kh, 24))
        ww = int(rng.integers(kw, 24))
        c = int(rng.integers(1, 6))
        x = jnp.asarray(
            rng.integers(-3, 4, (2, hh, ww, c)).astype(np.float32))
        y0, v0 = jax.vjp(lambda a: nn.max_pool(a, (kh, kw), (sh, sw),
                                               padding="VALID"), x)
        y1, v1 = jax.vjp(lambda a: max_pool_taps_bwd(a, (kh, kw),
                                                     (sh, sw)), x)
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
        coti = jnp.asarray(rng.integers(-4, 5, y0.shape).astype(np.float32))
        np.testing.assert_array_equal(np.asarray(v0(coti)[0]),
                                      np.asarray(v1(coti)[0]),
                                      err_msg=f"pool k={kh,kw} s={sh,sw} "
                                              f"in={hh,ww}")


def test_stem_module_mixed_dtype_promotes_like_nn_conv():
    """Regression: the production bf16 attack path casts classifier params
    to bf16 while normalize_imagenet's f32 constants promote the image back
    to f32 (classifiers/__init__.py) — nn.Conv silently promotes both to
    f32; ConvStemTapsBwd must do the same instead of raising a lax.conv
    mixed-dtype TypeError (caught live by tools/taps_ab.py on TPU)."""
    from flax import linen as nn
    from spaa_tpu.models.layers import ConvStemTapsBwd

    rng = np.random.default_rng(3)
    x32 = jnp.asarray(rng.random((1, 32, 32, 3), np.float32))
    new = ConvStemTapsBwd(8, (7, 7), (2, 2), (3, 3), name="conv1")
    ref = nn.Conv(8, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                  use_bias=False, kernel_init=nn.initializers.he_normal(),
                  name="conv1")
    params = new.init(jax.random.PRNGKey(0), x32)["params"]
    p_bf16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    for xin in (x32, x32.astype(jnp.bfloat16)):
        y_new, gx_new = jax.value_and_grad(
            lambda a: jnp.sum(new.apply({"params": p_bf16}, a) ** 2))(xin)
        y_ref, gx_ref = jax.value_and_grad(
            lambda a: jnp.sum(ref.apply({"params": p_bf16}, a) ** 2))(xin)
        np.testing.assert_allclose(np.asarray(y_new, np.float32),
                                   np.asarray(y_ref, np.float32),
                                   rtol=2e-2, atol=2e-2)
        scale = max(np.abs(np.asarray(gx_ref, np.float32)).max(), 1e-6)
        np.testing.assert_allclose(np.asarray(gx_new, np.float32),
                                   np.asarray(gx_ref, np.float32),
                                   atol=0.05 * scale, rtol=0.1)


def test_logits_fn_bf16_params_production_cast_pattern():
    """End-to-end guard for the exact production mix (_run_spaa_sweep,
    orchestrate.py): bf16-cast zoo params + a bf16-cast image through
    make_logits_fn(taps on) must trace, and the grads must stay close to
    the taps-off path on the same bf16 params."""
    from spaa_tpu.models.classifiers import init_params, make_logits_fn

    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                          init_params("resnet18", seed=0))
    rng = np.random.default_rng(11)
    im = jnp.asarray(rng.random((1, 48, 64, 3), np.float32))
    outs = {}
    for taps in (True, False):
        lf = make_logits_fn("resnet18", taps_stem=taps, taps_pool=taps)

        def loss(a):
            return jnp.sum(
                lf(params, a.astype(jnp.bfloat16), (40, 40)) ** 2
            ).astype(jnp.float32)

        outs[taps] = jax.value_and_grad(loss)(im)
    y1, g1 = (np.asarray(t, np.float32) for t in outs[True])
    y0, g0 = (np.asarray(t, np.float32) for t in outs[False])
    np.testing.assert_allclose(y1, y0, rtol=2e-2, atol=2e-2)
    scale = max(np.abs(g0).max(), 1e-6)
    np.testing.assert_allclose(g1, g0, atol=0.05 * scale, rtol=0.1)
