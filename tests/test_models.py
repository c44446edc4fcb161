"""Model-layer tests: torch-parity of conv/convT wrappers, shapes and
gradient flow of WarpingNet / ShadingNetSPAA / CompenNet(++) / PCNet."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from spaa_tpu.models import (CompenNet, CompenNetPlusplus, PCNet,
                             ShadingNetSPAA, WarpingNet, affine_from_corners)
from spaa_tpu.models.layers import Conv2dTorch, ConvTranspose2dTorch


@pytest.mark.parametrize("k,s,p", [(3, 2, 1), (3, 1, 1), (1, 1, 0), (7, 2, 3)])
def test_conv2d_matches_torch(rng, k, s, p):
    x = rng.random((2, 8, 10, 3), np.float32)
    w = rng.random((k, k, 3, 5), np.float32) - 0.5
    b = rng.random((5,), np.float32)
    mod = Conv2dTorch(5, k, s, p)
    out = mod.apply({"params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}},
                    jnp.asarray(x))
    tw = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)))  # HWIO->OIHW
    ref = F.conv2d(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), tw,
                   torch.from_numpy(b), stride=s, padding=p).numpy()
    np.testing.assert_allclose(np.asarray(out), np.transpose(ref, (0, 2, 3, 1)),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("k,s,p,op", [(2, 2, 0, 0), (3, 2, 1, 1)])
def test_conv_transpose2d_matches_torch(rng, k, s, p, op):
    x = rng.random((2, 5, 6, 4), np.float32)
    # our layout: HWIO with I=cin; torch convT weight is (cin, cout, kh, kw)
    w = rng.random((k, k, 4, 3), np.float32) - 0.5
    b = rng.random((3,), np.float32)
    mod = ConvTranspose2dTorch(3, k, s, p, op)
    out = mod.apply({"params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}},
                    jnp.asarray(x))
    tw = torch.from_numpy(np.transpose(w, (2, 3, 0, 1)))  # HWIO->(cin,cout,kh,kw)
    ref = F.conv_transpose2d(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                             tw, torch.from_numpy(b), stride=s, padding=p,
                             output_padding=op).numpy()
    np.testing.assert_allclose(np.asarray(out), np.transpose(ref, (0, 2, 3, 1)),
                               rtol=1e-4, atol=1e-5)


def test_conv_transpose2d_subpix_matches_dilated(rng):
    """The k==s, p=0 subpix form (opt-in knob; off by default after the
    in-context regression measured in tools/incontext_ab.py) must equal
    the lhs-dilated formulation on the same params — it is value-
    preserving by construction (each output pixel reads exactly one input
    pixel; measured bitwise-equal in bf16 on TPU)."""
    x = jnp.asarray(rng.random((2, 5, 6, 4), np.float32))
    w = jnp.asarray(rng.random((2, 2, 4, 3), np.float32) - 0.5)
    b = jnp.asarray(rng.random((3,), np.float32))
    params = {"params": {"kernel": w, "bias": b}}
    fast = ConvTranspose2dTorch(3, 2, 2, 0, subpix=True)
    slow = ConvTranspose2dTorch(3, 2, 2, 0)          # default: dilated
    y_fast = jax.jit(lambda q: fast.apply(params, q))(x)
    y_slow = jax.jit(lambda q: slow.apply(params, q))(x)
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_slow),
                               rtol=1e-6, atol=1e-6)
    g_fast = jax.jit(jax.grad(lambda q: jnp.sum(fast.apply(params, q) ** 2)))(x)
    g_slow = jax.jit(jax.grad(lambda q: jnp.sum(slow.apply(params, q) ** 2)))(x)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_slow),
                               rtol=1e-5, atol=1e-5)
    # subpix=True on a non-eligible combo must refuse, not silently differ
    with pytest.raises(ValueError):
        ConvTranspose2dTorch(3, 3, 2, 1, 1, subpix=True).init(
            jax.random.PRNGKey(0), x)


def test_warping_net_shapes_and_identity_affine(rng):
    net = WarpingNet(out_size=(16, 20), with_refine=True)
    x = jnp.asarray(rng.random((2, 12, 12, 3), np.float32))
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    out = net.apply({"params": params}, x)
    assert out.shape == (2, 16, 20, 3)

    # simplified grid path gives the same output
    grid = net.apply({"params": params}, method=WarpingNet.simplify)
    assert grid.shape == (1, 16, 20, 2)
    out2 = net.apply({"params": params}, x, fine_grid=grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


def test_affine_from_corners_identity():
    # corners at the full image span -> identity affine
    corners = [[-1, -1], [1, -1], [1, 1], [-1, 1]]
    aff = np.asarray(affine_from_corners(corners))
    np.testing.assert_allclose(aff[0], [[1, 0, 0], [0, 1, 0]], atol=1e-6)


def test_shading_net_shapes(rng):
    net = ShadingNetSPAA(use_rough=True)
    x = jnp.asarray(rng.random((2, 16, 24, 3), np.float32))
    s = jnp.asarray(rng.random((2, 16, 24, 3), np.float32))
    params = net.init(jax.random.PRNGKey(0), x, s, x * s)["params"]
    out = net.apply({"params": params}, x, s, x * s)
    assert out.shape == (2, 16, 24, 3)
    assert float(out.max()) <= 1.0 and float(out.min()) >= 0.0

    # cached surface features match direct compute
    sf = net.apply({"params": params}, s, x * s,
                   method=ShadingNetSPAA.surface_features)
    out2 = net.apply({"params": params}, x, s, x * s, surface_feats=sf)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


def test_compen_net_and_pp(rng):
    net = CompenNet()
    x = jnp.asarray(rng.random((1, 16, 16, 3), np.float32))
    s = jnp.asarray(rng.random((1, 16, 16, 3), np.float32))
    params = net.init(jax.random.PRNGKey(0), x, s)["params"]
    out = net.apply({"params": params}, x, s)
    assert out.shape == (1, 16, 16, 3)

    pp = CompenNetPlusplus(out_size=(16, 16))
    params = pp.init(jax.random.PRNGKey(1), x, s)["params"]
    out = pp.apply({"params": params}, x, s)
    assert out.shape == (1, 16, 16, 3)

    grid, sf = pp.apply({"params": params}, s,
                        method=CompenNetPlusplus.simplify)
    out2 = pp.apply({"params": params}, x, s, fine_grid=grid, surface_feats=sf)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_packed_encoder_matches_unpacked(rng):
    """The block-diagonal packed (conv1,conv1_s)/(conv2,conv2_s) path
    (opt-in knob; off by default after the in-context regression measured
    in tools/incontext_ab.py) must match the two-separate-convs path on
    the same params — forward and parameter gradients (zero cross-blocks
    add exact zeros; only accumulation order can differ)."""
    from spaa_tpu.models import CompenNet, ShadingNetSPAA

    x = jnp.asarray(rng.random((3, 16, 20, 3), np.float32))
    s = jnp.asarray(rng.random((3, 16, 20, 3), np.float32))
    rough = x * s

    for net_p, net_u, args in [
        (ShadingNetSPAA(packed_encoder=True), ShadingNetSPAA(), (x, s, rough)),
        # single-pair variants (layers.packed_which; VERDICT r3 #6 A/B)
        (ShadingNetSPAA(packed_encoder="enc2"), ShadingNetSPAA(),
         (x, s, rough)),
        (ShadingNetSPAA(packed_encoder="enc1"), ShadingNetSPAA(),
         (x, s, rough)),
        (CompenNet(packed_encoder=True), CompenNet(), (x, s)),
    ]:
        params = net_p.init(jax.random.PRNGKey(1), *args)["params"]
        y_p = jax.jit(lambda p, a=args, n=net_p: n.apply({"params": p}, *a))(params)
        y_u = jax.jit(lambda p, a=args, n=net_u: n.apply({"params": p}, *a))(params)
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_u),
                                   rtol=1e-5, atol=1e-6)

        def loss(p, n, a):
            return jnp.sum(n.apply({"params": p}, *a) ** 2)

        g_p = jax.jit(jax.grad(lambda p: loss(p, net_p, args)))(params)
        g_u = jax.jit(jax.grad(lambda p: loss(p, net_u, args)))(params)
        for kp, (gp, gu) in zip(
                jax.tree_util.tree_leaves_with_path(g_p),
                zip(jax.tree.leaves(g_p), jax.tree.leaves(g_u))):
            np.testing.assert_allclose(
                np.asarray(gp), np.asarray(gu), rtol=1e-4, atol=1e-4,
                err_msg=f"param grad mismatch at {kp[0]}")
        # the packed path must not change the param tree (checkpoint compat)
        assert jax.tree_util.tree_structure(g_p) == \
            jax.tree_util.tree_structure(g_u)


def test_packed_encoder_rejects_unknown_values():
    """An unrecognized truthy packed_encoder value must raise, not
    silently fall back to the unpacked path (an A/B harness would then
    measure the baseline and report it as the packed variant)."""
    from spaa_tpu.models.layers import packed_which

    assert packed_which(True) == (1, 2)
    assert packed_which("enc1") == (1,)
    assert packed_which("enc2") == (2,)
    assert packed_which(False) == ()
    assert packed_which(None) == ()
    for bad in ("enc3", "both", 1):
        with pytest.raises(ValueError):
            packed_which(bad)


def test_pcnet_forward_and_grads(rng):
    net = PCNet(out_size=(16, 20))
    prj = jnp.asarray(rng.random((2, 12, 12, 3), np.float32))
    scene = jnp.asarray(rng.random((2, 16, 20, 3), np.float32))
    mask = jnp.asarray((rng.random((16, 20, 1)) > 0.3).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), prj, scene, mask)["params"]
    out = net.apply({"params": params}, prj, scene, mask)
    assert out.shape == (2, 16, 20, 3)

    # gradient wrt projector input must flow (the attack requires it)
    g = jax.grad(lambda p: jnp.sum(
        net.apply({"params": params}, p, scene, mask)))(prj)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0

    # simplified cache path equals full forward
    cache = net.apply({"params": params}, scene[:1], mask,
                      method=PCNet.simplify_cache)
    out2 = net.apply({"params": params}, prj, scene, mask, cache=cache)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_pcnet_unbroadcast_scene_is_exact(rng):
    """A [1,H,W,3] scene must give bitwise the same output as the same
    scene broadcast to the batch (the attack hot loop passes the scene
    unbroadcast so the skipConv1 chain runs on one image)."""
    net = PCNet(out_size=(16, 20))
    prj = jnp.asarray(rng.random((3, 12, 12, 3), np.float32))
    scene1 = jnp.asarray(rng.random((1, 16, 20, 3), np.float32))
    scene_b = jnp.broadcast_to(scene1, (3, 16, 20, 3))
    mask = jnp.asarray((rng.random((16, 20, 1)) > 0.3).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), prj, scene1, mask)["params"]
    out_b = jax.jit(lambda p, x, s: net.apply({"params": p}, x, s, mask))(
        params, prj, scene_b)
    out_1 = jax.jit(lambda p, x, s: net.apply({"params": p}, x, s, mask))(
        params, prj, scene1)
    np.testing.assert_array_equal(np.asarray(out_b), np.asarray(out_1))

    g_b = jax.jit(jax.grad(lambda x: jnp.sum(
        net.apply({"params": params}, x, scene_b, mask))))(prj)
    g_1 = jax.jit(jax.grad(lambda x: jnp.sum(
        net.apply({"params": params}, x, scene1, mask))))(prj)
    np.testing.assert_array_equal(np.asarray(g_b), np.asarray(g_1))


def test_classifier_chunked_classify_matches_unchunked(rng):
    """Large batches run in fixed-size padded chunks (summarize's batched
    re-inference); results must equal the single-program path."""
    from spaa_tpu.models.classifiers import Classifier
    clf = Classifier("resnet18", None)
    im = rng.random((5, 60, 80, 3)).astype(np.float32)
    import jax.numpy as jnp
    _, p_chunked, idx_chunked = clf.classify(jnp.asarray(im), (48, 48),
                                             chunk=2)
    _, p_full, idx_full = clf.classify(jnp.asarray(im), (48, 48), chunk=64)
    np.testing.assert_allclose(p_chunked, p_full, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(idx_chunked[:, 0], idx_full[:, 0])
