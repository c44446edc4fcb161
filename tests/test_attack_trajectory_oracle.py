"""Full attack-trajectory parity vs plain-torch oracles (f64).

The boldest re-design in this repo is the SPAA attack body: the reference
runs TWO full backward passes per iteration (adversarial + color loss,
``projector_based_attack.py:302-315``) with masked in-place updates, while
``spaa_tpu.attack.spaa._spaa_body`` selects the cheap camera-space
cotangent per sample and pulls it back through PCNet ONCE. Until round 4
its equivalence evidence was a JAX reimplementation of the two-backward
semantics — if the reference was misread, both sides would share the
misreading.

This module closes that hole: the literal reference loops (SPAA
``:226-339``, PerC-AL projector ``perc_al/__init__.py:153-245``) are driven
through genuine torch autograd on a plain-torch PCNet
(tests/torch_oracles.py: TorchShadingNetSPAA / TorchSimplifiedPCNet, torch
color pipeline in the reference's mask-multiply formulation) with the SAME
weights the Flax side uses, in float64, and every per-iteration state
(prj_adv, best-tracking arrays, color-loss bounds) must match ≤1e-5.

Scope notes:
  - the warp runs with the baked (simplified) sampling grid on both sides;
    grid CONSTRUCTION parity is covered by tests/test_tps.py +
    tests/test_models.py, and the grid is frozen during attacks anyway;
  - the classifier pipeline resizes to 64x64 instead of 224x224 to keep
    the f64 CI cost small — the production 224/299 'area' pipeline parity
    is covered by tests/test_torch_oracle.py (and resize_area matches
    torch mode='area' exactly in f64 for up- and down-scaling);
  - the JAX side runs the PRODUCTION fused batch (mixed configs/targets in
    one program, per-sample weights, camde_range slice) against separate
    per-config torch runs — certifying the fused rewrite itself.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import enable_x64  # noqa: E402

from spaa_tpu.attack.perc_al import PercALConfig, _percal_step_jit
from spaa_tpu.attack.spaa import SpaaConfig, _spaa_step_jit
from spaa_tpu.models import PCNet
from spaa_tpu.models.classifiers.convert import convert_state_dict
from spaa_tpu.models.classifiers.resnet import ResNet18
from spaa_tpu.ops.color import rgb2lab_diff
from spaa_tpu.ops.image import center_crop, resize_area
from torch_oracles import (TorchResNet18, TorchShadingNetSPAA,
                           TorchSimplifiedPCNet, randomize_weights,
                           shading_state_dict_from_flax, torch_ciede2000,
                           torch_rgb2lab)

CAM_HW = (60, 80)
PRJ_HW = (32, 32)
CP_SZ = (56, 56)
NET_SZ = (64, 64)   # reduced classifier input (see module docstring)
MEAN = np.array([0.485, 0.456, 0.406])
STD = np.array([0.229, 0.224, 0.225])


def _to_f64(tree):
    return jax.tree.map(lambda a: jnp.asarray(np.asarray(a, np.float64)),
                        tree)


def _nchw(x_nhwc):
    return torch.from_numpy(
        np.ascontiguousarray(np.asarray(x_nhwc, np.float64)
                             .transpose(0, 3, 1, 2)))


def _nhwc(x_nchw):
    # .copy(): numpy() shares memory with the tensor — recorded trajectory
    # states must not alias buffers the loop later mutates in place
    return x_nchw.detach().numpy().transpose(0, 2, 3, 1).copy()


def _build_world():
    """One shared setup: f64 PCNet (flax + torch twins on the SAME
    weights), f64 resnet18 (torch oracle + converted flax params), scene,
    binary mask, and the reduced classify pipelines."""
    rng = np.random.default_rng(11)
    cam_scene = rng.uniform(0.05, 0.95, (1, *CAM_HW, 3))
    mask = np.ones((*CAM_HW, 1))
    mask[:4], mask[-4:], mask[:, :6], mask[:, -6:] = 0, 0, 0, 0

    model = PCNet(out_size=CAM_HW)
    # init at plain f32 (x64 off: initializers emit f32 while internal
    # grid constants would be f64), then promote the tree to f64
    with enable_x64(False):
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, *PRJ_HW, 3), jnp.float32),
                            jnp.asarray(cam_scene, jnp.float32),
                            jnp.asarray(mask, jnp.float32))["params"]
    params = _to_f64(params)
    # non-trivial frozen warp (a converged-looking affine)
    params["warping_net"]["affine_mat"] = jnp.asarray(
        [[[0.9, 0.05, 0.02], [-0.03, 0.92, -0.01]]], jnp.float64)

    scene_j = jnp.asarray(cam_scene)
    mask_j = jnp.asarray(mask)
    cache = model.apply({"params": params}, scene_j, mask_j,
                        method=PCNet.simplify_cache)

    def pcnet_apply(st, prj):
        return model.apply({"params": st["params"]}, prj, st["scene"],
                           st["mask"], cache=st["cache"])

    pcnet_state = dict(params=params, scene=scene_j, mask=mask_j,
                       cache=cache)

    # torch twin on the same weights / grid / mask
    shading = TorchShadingNetSPAA().double()
    shading.load_state_dict(shading_state_dict_from_flax(
        params["shading_net"]))
    grid_t = torch.from_numpy(np.asarray(cache.fine_grid, np.float64))
    mask_t = torch.from_numpy(mask.transpose(2, 0, 1)[None])
    pcnet_t = TorchSimplifiedPCNet(shading, grid_t, mask_t).eval()
    for p in pcnet_t.parameters():
        p.requires_grad_(False)

    clf_t = randomize_weights(TorchResNet18(), seed=5).double().eval()
    for p in clf_t.parameters():
        p.requires_grad_(False)
    clf_params = _to_f64(convert_state_dict("resnet18",
                                            clf_t.state_dict()))
    flax_net = ResNet18()

    def logits_fn(cp, im):
        x = resize_area(center_crop(im, CP_SZ), NET_SZ)
        x = (x - jnp.asarray(MEAN)) / jnp.asarray(STD)
        return flax_net.apply({"params": cp}, x)

    def logits_t(im_nchw):
        h, w = im_nchw.shape[2:]
        i = int(round((h - CP_SZ[0]) / 2.0))
        j = int(round((w - CP_SZ[1]) / 2.0))
        x = im_nchw[:, :, i:i + CP_SZ[0], j:j + CP_SZ[1]]
        x = F.interpolate(x, NET_SZ, mode="area")
        m = torch.from_numpy(MEAN).view(1, 3, 1, 1)
        s = torch.from_numpy(STD).view(1, 3, 1, 1)
        return clf_t((x - m) / s)

    return dict(pcnet_apply=pcnet_apply, pcnet_state=pcnet_state,
                pcnet_t=pcnet_t, logits_fn=logits_fn, logits_t=logits_t,
                clf_params=clf_params, cam_scene=cam_scene)


@pytest.fixture(scope="module")
def world():
    with enable_x64():
        yield _build_world()


def test_pcnet_forward_and_pullback_match_torch(world):
    """Cheap diagnosable precondition: the frozen PCNet forward and one
    camera-cotangent pullback agree before any trajectory is compared."""
    with enable_x64():
        rng = np.random.default_rng(3)
        prj = rng.uniform(0.1, 0.9, (2, *PRJ_HW, 3))
        cot = rng.standard_normal((2, *CAM_HW, 3))

        out_j, vjp = jax.vjp(
            lambda p: world["pcnet_apply"](world["pcnet_state"], p),
            jnp.asarray(prj))
        g_j, = vjp(jnp.asarray(cot))

        prj_t = _nchw(prj).requires_grad_(True)
        scene_b = _nchw(world["cam_scene"]).expand(2, -1, -1, -1)
        out_t = world["pcnet_t"](prj_t, scene_b)
        g_t, = torch.autograd.grad(out_t, prj_t, _nchw(cot))

        np.testing.assert_allclose(np.asarray(out_j), _nhwc(out_t),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(g_j), _nhwc(g_t),
                                   rtol=1e-8, atol=1e-9)


def test_color_pipeline_matches_torch_oracle(world):
    """rgb2lab + ciede2000 value AND gradient parity between ops.color
    (jnp.where re-derivation) and the torch mask-multiply oracle."""
    from spaa_tpu.ops.color import ciede2000_diff
    with enable_x64():
        rng = np.random.default_rng(5)
        a = rng.uniform(0, 1, (2, 8, 9, 3))
        a[0, 0, 0] = 0.0            # exact black: zero-chroma masks
        a[0, 1, 1] = [0.5, 0.5, 0.5]   # neutral gray
        b = rng.uniform(0, 1, (2, 8, 9, 3))

        def loss_j(x):
            return jnp.sum(ciede2000_diff(rgb2lab_diff(x),
                                          rgb2lab_diff(jnp.asarray(b))))
        val_j, g_j = jax.value_and_grad(loss_j)(jnp.asarray(a))

        at = _nchw(a).requires_grad_(True)
        val_t = torch_ciede2000(torch_rgb2lab(at),
                                torch_rgb2lab(_nchw(b))).sum()
        g_t, = torch.autograd.grad(val_t, at)
        np.testing.assert_allclose(float(val_j), float(val_t), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(g_j), _nhwc(g_t),
                                   rtol=1e-7, atol=1e-9)


def _torch_spaa_trajectory(world, target_idx, targeted, d_thr, stealth_loss,
                           iters):
    """The literal reference SPAA loop (``projector_based_attack.py:226-339``):
    one config, scalar weights, two full backward passes per iteration
    (retain_graph semantics via autograd.grad), masked in-place updates,
    best tracking. Records the full state after every iteration."""
    pcnet, logits_t = world["pcnet_t"], world["logits_t"]
    num = len(target_idx)
    cam_scene = _nchw(world["cam_scene"])
    cam_scene_batch = cam_scene.expand(num, -1, -1, -1)
    im_gray = 0.5 * torch.ones(num, 3, *PRJ_HW, dtype=torch.float64)
    prj_adv = im_gray.clone().requires_grad_(True)

    adv_lr, col_lr, adv_w, p_thresh = 2.0, 1.0, 1.0, 0.9
    prjl2_w = 0.1 if "prjl2" in stealth_loss else 0.0
    caml2_w = 1.0 if "caml2" in stealth_loss else 0.0
    camdE_w = 1.0 if "camdE" in stealth_loss else 0.0

    prj_best = prj_adv.detach().clone()
    cam_best = cam_scene.repeat(num, 1, 1, 1)
    col_best = 1e6 * torch.ones(num, dtype=torch.float64)
    tgt = torch.tensor(target_idx)
    ar = torch.arange(num)
    traj = []
    for _ in range(iters):
        cam_infer = pcnet(torch.clamp(prj_adv, 0, 1), cam_scene_batch)
        raw = logits_t(cam_infer)
        p = F.softmax(raw, dim=1)
        if targeted:
            adv_loss = adv_w * (-raw[ar, tgt]).mean()
        else:
            adv_loss = adv_w * (raw[ar, tgt]).mean()
        prjl2 = torch.norm(im_gray - prj_adv, dim=1).mean(1).mean(1)
        caml2 = torch.norm(cam_scene_batch - cam_infer, dim=1).mean(1).mean(1)
        camdE = torch_ciede2000(torch_rgb2lab(cam_infer),
                                torch_rgb2lab(cam_scene_batch)).mean(1).mean(1)
        col_batch = prjl2_w * prjl2 + caml2_w * caml2 + camdE_w * camdE
        col_loss = col_batch.mean()

        top_p, top_idx = p.max(dim=1)
        mask_high_conf = top_p > p_thresh
        mask_high_pert = caml2.detach() * 255 > d_thr
        if targeted:
            mask_succ = top_idx == tgt
            mask_best_adv = mask_succ & mask_high_conf & mask_high_pert
        else:
            mask_succ = top_idx != tgt
            mask_best_adv = mask_succ & mask_high_pert

        adv_grad, = torch.autograd.grad(adv_loss, prj_adv, retain_graph=True)
        col_grad, = torch.autograd.grad(col_loss, prj_adv)
        with torch.no_grad():
            na = adv_grad / adv_grad.reshape(num, -1).norm(dim=1).view(
                -1, 1, 1, 1)
            nc = col_grad / col_grad.reshape(num, -1).norm(dim=1).view(
                -1, 1, 1, 1)
            prj_adv.data[~mask_best_adv] -= adv_lr * na[~mask_best_adv]
            prj_adv.data[mask_best_adv] -= col_lr * nc[mask_best_adv]

            mask_best = (col_batch.detach() < col_best) & mask_best_adv
            col_best[mask_best] = col_batch.detach()[mask_best]
            prj_best[mask_succ] = prj_adv.detach()[mask_succ]
            cam_best[mask_succ] = cam_infer.detach()[mask_succ]
            prj_best[mask_best] = prj_adv.detach()[mask_best]
            cam_best[mask_best] = cam_infer.detach()[mask_best]
        traj.append(dict(prj_adv=_nhwc(prj_adv), prj_best=_nhwc(prj_best),
                         cam_best=_nhwc(cam_best),
                         col_best=col_best.numpy().copy()))
    return traj


def test_spaa_trajectory_matches_reference_two_backward_loop(world):
    """The production fused SPAA batch (2 configs x (2 targeted + 1
    untargeted), per-sample weights, camde_range slice) must reproduce the
    reference's per-config two-backward trajectories state-for-state."""
    iters = 5
    with enable_x64():
        scene_j = jnp.asarray(world["cam_scene"])
        true_idx = int(np.argmax(np.asarray(
            world["logits_fn"](world["clf_params"], scene_j))[0]))
        targets = [3, 14]
        configs = [("caml2", 5.0), ("camdE_caml2", 9.0)]

        # torch: one run per (config, targeted-flag) exactly like ref
        ref = {}
        for sl, dt in configs:
            ref[(sl, True)] = _torch_spaa_trajectory(
                world, targets, True, dt, sl, iters)
            ref[(sl, False)] = _torch_spaa_trajectory(
                world, [true_idx], False, dt, sl, iters)

        # JAX: the fused production batch (camdE-active config last)
        b = 6
        tgt = jnp.asarray(targets + [true_idx] + targets + [true_idx],
                          jnp.int32)
        targeted = jnp.asarray([True, True, False] * 2)
        w = jnp.asarray([[0.0, 1.0, 0.0]] * 3 + [[0.0, 1.0, 1.0]] * 3)
        d_thr = jnp.asarray([5.0] * 3 + [9.0] * 3)
        cfg = SpaaConfig(iters=iters, camde_range=(3, 6))
        prj_init = jnp.full((b, *PRJ_HW, 3), 0.5, jnp.float64)
        state = (prj_init, prj_init,
                 jnp.broadcast_to(scene_j, (b, *CAM_HW, 3)),
                 jnp.full((b,), 1e6, jnp.float64))

        slices = {("caml2", True): slice(0, 2), ("caml2", False): slice(2, 3),
                  ("camdE_caml2", True): slice(3, 5),
                  ("camdE_caml2", False): slice(5, 6)}
        for it in range(iters):
            state = _spaa_step_jit(world["pcnet_apply"], world["logits_fn"],
                                   world["pcnet_state"], world["clf_params"],
                                   scene_j, state, prj_init, tgt, targeted,
                                   w, d_thr, cfg)
            prj_adv, prj_best, cam_best, col_best = map(np.asarray, state)
            for (sl, dt), tg in [(c, t) for c in configs
                                 for t in (True, False)]:
                r = ref[(sl, tg)][it]
                s = slices[(sl, tg)]
                err = f"iter {it} cfg ({sl}, targeted={tg})"
                np.testing.assert_allclose(prj_adv[s], r["prj_adv"],
                                           atol=1e-5, rtol=0, err_msg=err)
                np.testing.assert_allclose(prj_best[s], r["prj_best"],
                                           atol=1e-5, rtol=0, err_msg=err)
                np.testing.assert_allclose(cam_best[s], r["cam_best"],
                                           atol=1e-5, rtol=0, err_msg=err)
                np.testing.assert_allclose(col_best[s], r["col_best"],
                                           atol=1e-5, rtol=0, err_msg=err)


def _torch_percal_trajectory(world, labels, targeted, confidence, d_thr,
                             iters):
    """The literal reference PerC-AL projector loop
    (``perc_al/__init__.py:153-245``): alternating CE/color updates with
    the PREVIOUS iteration's success mask, cosine annealing, 8-bit
    quantization, best tracking."""
    import math
    logits_t = world["logits_t"]
    num = len(labels)
    inputs = _nchw(world["cam_scene"]).expand(num, -1, -1, -1)
    alpha_l_init, alpha_c_init, p_thresh = 1.0, 0.5, 0.9
    alpha_l_min, alpha_c_min = alpha_l_init / 100, alpha_c_init / 10
    multiplier = -1 if targeted else 1

    x_best = inputs.clone()
    inputs_lab = torch_rgb2lab(inputs)
    delta = torch.zeros_like(inputs, requires_grad=True)
    mask_best_adv = torch.zeros(num, dtype=torch.bool)
    col_best = torch.ones(num, dtype=torch.float64) * 100000
    lab = torch.tensor(labels)
    ar = torch.arange(num)
    traj = []
    for i in range(iters):
        alpha_c = alpha_c_min + 0.5 * (alpha_c_init - alpha_c_min) * (
            1 + math.cos(i / iters * math.pi))
        alpha_l = alpha_l_min + 0.5 * (alpha_l_init - alpha_l_min) * (
            1 + math.cos(i / iters * math.pi))
        raw = logits_t(inputs + delta)
        loss = multiplier * torch.nn.CrossEntropyLoss(reduction="sum")(
            raw, lab)
        grad_a, = torch.autograd.grad(loss, delta)
        with torch.no_grad():
            na = grad_a / grad_a.reshape(num, -1).norm(dim=1).view(
                -1, 1, 1, 1)
            delta.data[~mask_best_adv] += alpha_l * na[~mask_best_adv]
        d_map = torch_ciede2000(inputs_lab,
                                torch_rgb2lab(inputs + delta)).unsqueeze(1)
        color_dis = d_map.reshape(num, -1).norm(dim=1)
        grad_c, = torch.autograd.grad(color_dis.sum(), delta)
        with torch.no_grad():
            nc = grad_c / grad_c.reshape(num, -1).norm(dim=1).view(
                -1, 1, 1, 1)
            delta.data[mask_best_adv] -= alpha_c * nc[mask_best_adv]
            delta.data = (inputs + delta.data).clamp(0, 1) - inputs
            x_round = torch.round((inputs + delta.data) * 255) / 255
            caml2 = torch.norm(delta.detach(), dim=1).mean(1).mean(1)
            mask_high_pert = caml2 * 255 > d_thr
            raw2 = logits_t(x_round)
            p2 = F.softmax(raw2, dim=1)
            top_p, top_idx = p2.max(dim=1)
            if (not targeted) and confidence != 0:
                real = raw2[ar, lab]
                masked = raw2.clone()
                masked[ar, lab] = -float("inf")
                other = masked.max(dim=1)[0]
                mask_isadv = (real - other) <= -confidence
                mask_best_adv = mask_isadv & mask_high_pert
            elif targeted:
                mask_isadv = top_idx == lab
                mask_best_adv = (mask_isadv & (top_p > p_thresh)
                                 & mask_high_pert)
            else:
                mask_isadv = top_idx != lab
                mask_best_adv = mask_isadv & mask_high_pert
            mask_best = (color_dis.detach() < col_best) & mask_best_adv
            col_best[mask_best] = color_dis.detach()[mask_best]
            x_best[mask_isadv] = x_round[mask_isadv]
            x_best[mask_best] = x_round[mask_best]
        # re-attach delta as a leaf for the next iteration's grads
        delta = delta.detach().requires_grad_(True)
        traj.append(dict(delta=_nhwc(delta), x_best=_nhwc(x_best),
                         col_best=col_best.numpy().copy(),
                         mask_adv=mask_best_adv.numpy().copy()))
    return traj


def test_percal_trajectory_matches_reference_loop(world):
    """The fused PerC-AL projector batch (mixed targeted/untargeted,
    confidence=40 applying only to untargeted samples — exactly how
    ``perc_al_compennet_pp`` constructs the two reference calls,
    ``projector_based_attack.py:352``) must reproduce the reference's
    per-call trajectories state-for-state."""
    iters = 4
    with enable_x64():
        scene_j = jnp.asarray(world["cam_scene"])
        true_idx = int(np.argmax(np.asarray(
            world["logits_fn"](world["clf_params"], scene_j))[0]))
        targets = [3, 14]
        d_thr = 5.0

        ref_t = _torch_percal_trajectory(world, targets, True, 0.0,
                                         d_thr, iters)
        ref_u = _torch_percal_trajectory(world, [true_idx], False, 40.0,
                                         d_thr, iters)

        b = 3
        inputs = jnp.broadcast_to(scene_j, (b, *CAM_HW, 3))
        labels = jnp.asarray(targets + [true_idx], jnp.int32)
        targeted = jnp.asarray([True, True, False])
        cfg = PercALConfig(max_iterations=iters, alpha_l_init=1.0,
                           alpha_c_init=0.5, confidence=40.0)
        inputs_lab = rgb2lab_diff(inputs)
        state = (jnp.zeros_like(inputs), jnp.zeros((b,), bool),
                 jnp.full((b,), 1e5, jnp.float64), inputs)
        dt = jnp.full((b,), d_thr)
        for it in range(iters):
            state = _percal_step_jit(world["logits_fn"],
                                     world["clf_params"], inputs, inputs_lab,
                                     labels, targeted, cfg, dt, True,
                                     jnp.asarray(it, jnp.int32), state)
            delta, mask_adv, col_best, x_best = map(np.asarray, state)
            for name, s, r in [("targeted", slice(0, 2), ref_t[it]),
                               ("untargeted", slice(2, 3), ref_u[it])]:
                err = f"iter {it} ({name})"
                np.testing.assert_allclose(delta[s], r["delta"], atol=1e-5,
                                           rtol=0, err_msg=err)
                np.testing.assert_array_equal(mask_adv[s], r["mask_adv"],
                                              err_msg=err)
                np.testing.assert_allclose(col_best[s], r["col_best"],
                                           atol=1e-5, rtol=0, err_msg=err)
                np.testing.assert_allclose(x_best[s], r["x_best"], atol=1e-5,
                                           rtol=0, err_msg=err)
