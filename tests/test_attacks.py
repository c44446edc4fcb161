"""Attacker unit tests: SPAA update semantics, loop variants, PerC-AL and
the batched one-pixel DE — all hardware-free on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spaa_tpu.attack.spaa import (SpaaConfig, _normalized, _per_sample_l2,
                                  _spaa_body, spaa_attack_batched,
                                  spaa_attack_stepped, stealth_weights)
from spaa_tpu.ops.color import ciede2000_diff, rgb2lab_diff


B, HP, WP, H, W = 5, 16, 16, 12, 16
NCLS = 13


def _toy_models(seed=0):
    """A tiny differentiable 'PCNet' and 'classifier' with random params."""
    rng = np.random.default_rng(seed)
    k_pc = jnp.asarray(rng.normal(0, 0.3, (3, 3)).astype(np.float32))
    k_cl = jnp.asarray(rng.normal(0, 0.1, (H * W * 3, NCLS)).astype(np.float32))

    def pcnet_apply(state, prj):
        # downsample the projector image to camera size + mild mixing
        x = jax.image.resize(prj, (prj.shape[0], H, W, 3), "linear")
        return jnp.clip(x @ state["k"] * 0.5 + 0.4, 0.0, 1.0)

    def logits_fn(params, cam):
        return cam.reshape(cam.shape[0], -1) @ params

    return pcnet_apply, {"k": k_pc}, logits_fn, k_cl


def _reference_spaa_step(pcnet_apply, logits_fn, pc_state, cl_params,
                         cam_scene, state, im_gray, target_idx, targeted,
                         weights, d_thr, cfg):  # same arg order as _spaa_body
    """Straight transcription of the reference's per-iteration semantics
    (projector_based_attack.py:265-328): full adv and col gradients via two
    backward passes, masked alternating update, best tracking."""
    b = im_gray.shape[0]
    cam_scene_b = jnp.broadcast_to(cam_scene, (b,) + cam_scene.shape[1:])
    scene_lab = rgb2lab_diff(cam_scene_b)
    arange_b = jnp.arange(b)
    tgt_sign = jnp.where(targeted, -1.0, 1.0)
    prj_adv, prj_best, cam_best, col_best = state

    def adv_loss_fn(p):
        cam = pcnet_apply(pc_state, jnp.clip(p, 0, 1))
        raw = logits_fn(cl_params, cam)
        return cfg.adv_w * jnp.mean(tgt_sign * raw[arange_b, target_idx])

    def col_loss_fn(p):
        cam = pcnet_apply(pc_state, jnp.clip(p, 0, 1))
        prjl2 = _per_sample_l2(im_gray - p)
        caml2 = _per_sample_l2(cam_scene_b - cam)
        camde = jnp.mean(ciede2000_diff(rgb2lab_diff(cam), scene_lab),
                         axis=(1, 2))
        col_batch = (weights[:, 0] * prjl2 + weights[:, 1] * caml2
                     + weights[:, 2] * camde)
        return jnp.mean(col_batch), col_batch

    adv_grad = jax.grad(adv_loss_fn)(prj_adv)
    (_, col_batch), col_grad = jax.value_and_grad(
        col_loss_fn, has_aux=True)(prj_adv)

    cam_infer = pcnet_apply(pc_state, jnp.clip(prj_adv, 0, 1))
    raw = logits_fn(cl_params, cam_infer)
    caml2 = _per_sample_l2(cam_scene_b - cam_infer)
    p = jax.nn.softmax(raw, axis=1)
    top_idx = jnp.argmax(raw, axis=1)
    top_p = jnp.max(p, axis=1)
    mask_high_conf = top_p > cfg.p_thresh
    mask_high_pert = caml2 * 255.0 > d_thr
    mask_succ = jnp.where(targeted, top_idx == target_idx,
                          top_idx != target_idx)
    mask_best_adv = mask_succ & mask_high_pert & (mask_high_conf | ~targeted)
    m = mask_best_adv[:, None, None, None]
    step = jnp.where(m, cfg.col_lr * _normalized(col_grad),
                     cfg.adv_lr * _normalized(adv_grad))
    prj_adv = prj_adv - step
    mask_best = (col_batch < col_best) & mask_best_adv
    col_best = jnp.where(mask_best, col_batch, col_best)
    keep = (mask_succ | mask_best)[:, None, None, None]
    prj_best = jnp.where(keep, prj_adv, prj_best)
    cam_best = jnp.where(keep, cam_infer, cam_best)
    return prj_adv, prj_best, cam_best, col_best


def _setup_state(seed=1):
    rng = np.random.default_rng(seed)
    pcnet_apply, pc_state, logits_fn, cl_params = _toy_models()
    cam_scene = jnp.asarray(rng.random((1, H, W, 3)).astype(np.float32))
    prj0 = jnp.asarray(rng.random((B, HP, WP, 3)).astype(np.float32))
    target_idx = jnp.asarray(rng.integers(0, NCLS, B).astype(np.int32))
    targeted = jnp.asarray([True, True, True, False, False])
    weights = jnp.tile(jnp.asarray(stealth_weights("camdE_caml2")), (B, 1))
    d_thr = jnp.full((B,), 2.0)
    state = (prj0, prj0,
             jnp.broadcast_to(cam_scene, (B, H, W, 3)),
             jnp.full((B,), 1e6))
    return (pcnet_apply, logits_fn, pc_state, cl_params, cam_scene, state,
            prj0, target_idx, targeted, weights, d_thr)


def test_spaa_body_matches_reference_semantics():
    """The single-pullback body must reproduce the reference's two-backward
    masked update exactly (per-sample cotangent selection is algebraically
    the same; see _spaa_body docstring)."""
    args = _setup_state()
    cfg = SpaaConfig(iters=1)
    state = args[5]
    # run three iterations with both implementations, comparing states
    for it in range(3):
        new_fast = _spaa_body(*args[:5], state, *args[6:], cfg)
        new_ref = _reference_spaa_step(*args[:5], state, *args[6:], cfg)
        for a, b_ in zip(new_fast, new_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-4, atol=2e-5)
        state = new_ref


def test_spaa_fori_and_stepped_agree():
    args = _setup_state()
    (pcnet_apply, logits_fn, pc_state, cl_params, cam_scene, _, prj0,
     target_idx, targeted, weights, d_thr) = args
    cfg = SpaaConfig(iters=4)
    cam_a, prj_a = jax.jit(
        lambda *a: spaa_attack_batched(pcnet_apply, logits_fn, *a, cfg=cfg))(
        pc_state, cl_params, cam_scene, prj0, target_idx, targeted, weights,
        d_thr)
    cam_b, prj_b = spaa_attack_stepped(
        pcnet_apply, logits_fn, pc_state, cl_params, cam_scene, prj0,
        target_idx, targeted, weights, d_thr, cfg)
    np.testing.assert_allclose(np.asarray(cam_a), np.asarray(cam_b),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(prj_a), np.asarray(prj_b),
                               rtol=1e-5, atol=1e-6)


def test_spaa_attack_flips_untargeted():
    """Untargeted attacks against the toy classifier must flip most
    predictions (best-tracking only keeps successful attacks, so a changed
    prj_best certifies success)."""
    args = _setup_state()
    (pcnet_apply, logits_fn, pc_state, cl_params, cam_scene, _, prj0,
     target_idx, _, weights, d_thr) = args
    targeted = jnp.zeros((B,), bool)
    raw0 = logits_fn(cl_params, pcnet_apply(pc_state, prj0))
    true_idx = jnp.argmax(raw0, axis=1)
    cam_b, prj_b = spaa_attack_stepped(
        pcnet_apply, logits_fn, pc_state, cl_params, cam_scene, prj0,
        true_idx, targeted, weights, d_thr,
        SpaaConfig(iters=40, adv_lr=1.0))
    raw1 = logits_fn(cl_params, pcnet_apply(pc_state, prj_b))
    flipped = np.asarray(jnp.argmax(raw1, axis=1) != true_idx)
    assert flipped.mean() >= 0.6, f"untargeted attack failed: {flipped}"


def test_perc_al_digital_runs():
    from spaa_tpu.attack.perc_al import PerC_AL
    rng = np.random.default_rng(0)
    k_cl = jnp.asarray(rng.normal(0, 0.1, (H * W * 3, NCLS)).astype(np.float32))

    def logits_fn(params, im):
        return im.reshape(im.shape[0], -1) @ params

    inputs = jnp.asarray(rng.random((3, H, W, 3)).astype(np.float32))
    labels = np.asarray([1, 2, 3])
    atk = PerC_AL(max_iterations=5)
    out = atk.adversary(logits_fn, k_cl, inputs, labels, targeted=True)
    assert out.shape == inputs.shape
    assert np.isfinite(np.asarray(out)).all()
    out2 = atk.adversary_projector(logits_fn, k_cl, inputs, labels,
                                   d_thr=2.0, targeted=False, verbose=False)
    assert np.isfinite(np.asarray(out2)).all()


def test_spaa_camde_range_is_exact():
    """Restricting the CIEDE2000 term to the statically camdE-active batch
    slice (SpaaConfig.camde_range) must be bitwise-equivalent to computing
    it everywhere when the out-of-range samples carry camdE weight 0."""
    args = _setup_state()
    (pcnet_apply, logits_fn, pc_state, cl_params, cam_scene, _, prj0,
     target_idx, targeted, _, d_thr) = args
    # samples 0-1: caml2 only; samples 2-4: camdE-active
    w = jnp.asarray([[0.0, 1.0, 0.0]] * 2 + [[0.0, 1.0, 1.0]] * 3)
    full = SpaaConfig(iters=5)
    ranged = SpaaConfig(iters=5, camde_range=(2, B))
    outs_full = spaa_attack_stepped(pcnet_apply, logits_fn, pc_state,
                                    cl_params, cam_scene, prj0, target_idx,
                                    targeted, w, d_thr, full)
    outs_rng = spaa_attack_stepped(pcnet_apply, logits_fn, pc_state,
                                   cl_params, cam_scene, prj0, target_idx,
                                   targeted, w, d_thr, ranged)
    for a, b_ in zip(outs_full, outs_rng):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_percal_fused_batch_matches_sequential_runs():
    """The fused targeted+untargeted PerC-AL batch (one compiled program,
    used by orchestrate._run_percal_sweep) must reproduce the reference
    structure's two separate runs exactly: per-sample gradient
    normalization decouples the batch, and confidence only affects
    untargeted masks."""
    from spaa_tpu.attack.perc_al import PercALConfig, _percal_run
    rng = np.random.default_rng(4)
    k_cl = jnp.asarray(rng.normal(0, 0.1, (H * W * 3, NCLS)).astype(np.float32))

    def logits_fn(params, im):
        return im.reshape(im.shape[0], -1) @ params

    inputs = jnp.asarray(rng.random((4, H, W, 3)).astype(np.float32))
    labels = jnp.asarray([1, 2, 3, 5], jnp.int32)
    d_thr = jnp.full((4,), 2.0)
    iters = 6

    # sequential, reference structure: targeted run (confidence=0) and
    # untargeted run (confidence=40), separately compiled
    cfg_t = PercALConfig(max_iterations=iters, confidence=0)
    cfg_u = PercALConfig(max_iterations=iters, confidence=40)
    out_t = _percal_run(logits_fn, k_cl, inputs[:3], labels[:3], True,
                        cfg_t, d_thr=d_thr[:3], projector_variant=True)
    out_u = _percal_run(logits_fn, k_cl, inputs[3:], labels[3:], False,
                        cfg_u, d_thr=d_thr[3:], projector_variant=True)

    # fused: one batch, per-sample targeted flags, confidence=40 (only
    # applies to the untargeted sample)
    cfg_b = PercALConfig(max_iterations=iters, confidence=40)
    out_b = _percal_run(logits_fn, k_cl, inputs, labels,
                        np.asarray([True, True, True, False]), cfg_b,
                        d_thr=d_thr, projector_variant=True)

    np.testing.assert_allclose(np.asarray(out_b[:3]), np.asarray(out_t),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_b[3:]), np.asarray(out_u),
                               rtol=1e-5, atol=1e-6)


def test_one_pixel_digital_batched_de():
    from spaa_tpu.attack.one_pixel import BatchedDE, DigitalOnePixelAttacker

    # BatchedDE minimizes a quadratic with batched fitness
    target = np.asarray([3.0, -2.0])
    calls = []

    def fitness(pop):
        calls.append(pop.shape[0])
        return ((pop - target) ** 2).sum(axis=1)

    de = BatchedDE(fitness, [(-5, 5), (-5, 5)], popsize=20, maxiter=30,
                   seed=0)
    best, energy = de.solve()
    assert energy < 0.3, f"DE failed: {best} energy={energy}"
    assert max(calls) == 20, "population was not evaluated as one batch"


def test_batched_de_matches_scipy_de():
    """Calibrate BatchedDE against the solver the reference actually runs —
    ``scipy.optimize.differential_evolution`` (ref
    ``one_pixel_attacker/__init__.py:12,99-100``: best1bin, popsize=popmul,
    recombination=1, atol=-1, polish=False, dithered mutation U(0.5,1)) —
    on deterministic landscapes including a perturb-image-shaped one.

    BatchedDE is the ``updating='deferred'`` twin of scipy's default
    ``updating='immediate'`` (deferred is what makes whole-population
    batched fitness possible — scipy itself switches to deferred whenever
    ``workers``/``vectorized`` are used), so trajectories differ; the
    calibration asserts equal-budget solution QUALITY: median best energy
    over seeds within 1.5x + atol of scipy's, plus absolute near-optimum
    floors. Trajectory-level deviations are documented in PARITY.md."""
    from scipy.optimize import differential_evolution

    from spaa_tpu.attack.one_pixel import BatchedDE

    def sphere(pop):
        return np.sum(np.asarray(pop, np.float64) ** 2, axis=-1)

    def rastrigin(pop):
        p = np.asarray(pop, np.float64)
        return 10 * p.shape[-1] + np.sum(p ** 2 - 10 * np.cos(2 * np.pi * p),
                                         axis=-1)

    def rosenbrock(pop):
        p = np.asarray(pop, np.float64)
        return np.sum(100 * (p[..., 1:] - p[..., :-1] ** 2) ** 2
                      + (1 - p[..., :-1]) ** 2, axis=-1)

    # perturb-image-shaped: D=5 [row, col, r, g, b] with one-pixel-attack
    # bounds, fitness = sigmoid confidence of a fixed linear readout over
    # the perturbed image (deterministic classifier-probability shape)
    rng0 = np.random.default_rng(99)
    base_im = rng0.random((16, 16, 3))
    readout = rng0.normal(0, 1.0, (16 * 16 * 3,))

    def imgfit(pop):
        p = np.atleast_2d(np.asarray(pop, np.float64))
        out = np.empty(p.shape[0])
        for i, x in enumerate(p):
            im = base_im.copy()
            im[int(x[0]), int(x[1])] = x[2:5] / 255.0
            out[i] = 1.0 / (1.0 + np.exp(-(im.ravel() @ readout) * 0.05))
        return out

    #            name        fn        bounds              iters popmul atol floor
    cases = [("sphere10", sphere, [(-5, 5)] * 10, 250, 4, 0.5, 2.5),
             ("rastrigin5", rastrigin, [(-5.12, 5.12)] * 5, 250, 8, 2.0, 15.0),
             ("rosenbrock5", rosenbrock, [(-2, 2)] * 5, 400, 8, 0.1, 4.5),
             ("imgfit", imgfit,
              [(0, 15), (0, 15), (0, 255), (0, 255), (0, 255)],
              75, 8, 0.005, 0.51)]
    for name, f, bounds, maxiter, popmul, atol, floor in cases:
        npop = popmul * len(bounds)
        scipy_e, batched_e = [], []
        for seed in range(4):
            res = differential_evolution(
                lambda x: float(f(x[None])[0]), bounds, maxiter=maxiter,
                popsize=popmul, recombination=1, atol=-1, polish=False,
                seed=seed, tol=-1)   # tol=-1: no early convergence exit,
            scipy_e.append(res.fun)  # full equal-iteration budgets
            _, be = BatchedDE(f, bounds, popsize=npop, maxiter=maxiter,
                              seed=seed).solve()
            batched_e.append(be)
        med_s, med_b = float(np.median(scipy_e)), float(np.median(batched_e))
        assert med_b <= med_s * 1.5 + atol, \
            f"{name}: BatchedDE median {med_b} vs scipy {med_s}"
        # absolute floor: the solver actually optimizes (guards against
        # both solvers degenerating together)
        assert med_b <= floor, f"{name}: BatchedDE median {med_b} > {floor}"


def test_one_pixel_attacker_on_classifier():
    from spaa_tpu.attack.one_pixel import DigitalOnePixelAttacker

    class TinyClassifier:
        """Duck-typed stand-in for models.classifiers.Classifier: predicts
        by mean color channel dominance."""
        name = "tiny"

        def _logits_fn(self, params, im, crop_sz):
            m = im.mean(axis=(1, 2))
            return jnp.concatenate([m, 1.0 - m], axis=1) * 8.0

        params = None

        def __call__(self, im, crop_sz):
            if im.ndim == 3:
                im = im[None]
            raw = self._logits_fn(None, im, crop_sz)
            p = np.asarray(jax.nn.softmax(raw, axis=1))
            return raw, p, np.argsort(-p, axis=1)

    rng = np.random.default_rng(0)
    im = jnp.asarray((0.2 + 0.1 * rng.random((16, 16, 3))).astype(np.float32))
    atk = DigitalOnePixelAttacker(
        class_names={i: f"c{i}" for i in range(6)},
        classifier_crop_sz=(16, 16))
    # pixel block covers most of the tiny image, so the target (channel-0
    # dominance) is reachable by the DE search
    table, im_adv = atk.attack(im, TinyClassifier(), targeted_attack=True,
                               target_idx=0, pixel_count=1, pixel_size=13,
                               maxiter=8, popsize=30)
    assert im_adv.shape == im.shape
    assert bool(table["success"].iloc[0]), table
