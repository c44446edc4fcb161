"""SPAA: Stealthy Projector-based Adversarial Attack (Algorithm 1).

TPU-first re-design of reference ``projector_based_attack.py:212-339``.

The reference runs the 50-iteration PGD-style loop once per
(stealth_loss, d_thr) config — 12 sequential runs per classifier. Here the
whole attack is **one jitted program batched over configs**: stealthiness
weights, d_thr, target index and the targeted/untargeted flag are
*per-sample* arrays, so "1 untargeted + 10 targeted attacks × 12 configs"
becomes a single batch of 132 images through PCNet + classifier. The
per-sample gradient normalization (g_b / ||g_b||) makes this exactly
equivalent to the reference's per-config runs: the batch-mean loss only
rescales each sample's gradient, which normalization cancels.

Other re-designs:
  - the reference's TWO full backward passes per iteration (adversarial +
    color loss, ref ``:302-315``) become ONE PCNet pullback: the masked
    update applies either gradient per sample, so the cheap camera-space
    cotangents (classifier-bwd, color-bwd) are selected per sample BEFORE
    the expensive pullback — exactly equivalent under the per-sample
    gradient normalization (see ``_spaa_body``);
  - data-dependent in-place mask updates (``.data[mask] -=``) become
    branchless ``jnp.where`` selects;
  - on accelerators the loop is ``lax.fori_loop`` — all iterations on
    device with zero host round-trips; on the XLA CPU backend (whose
    loop bodies run without the intra-op thread pool) the same body is
    dispatched stepwise from the host (``spaa_attack_auto`` picks);
  - PCNet runs with its baked `simplify` cache: constant sampling grid,
    executed by the Pallas fixed-grid warp kernel where profitable.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from spaa_tpu.ops.color import ciede2000_diff, rgb2lab_diff


class SpaaConfig(NamedTuple):
    """Static attack hyper-parameters (SPAA Algorithm 1; values
    ref ``projector_based_attack.py:243-258``).

    ``camde_range``: optional static (lo, hi) batch slice on which the
    CIEDE2000 term is computed. In the fused sweep the per-sample stealth
    weights come from a static config grid, so samples with camdE weight
    0 are known at trace time — skipping them cuts the most expensive
    color chain to the active slice with bitwise-identical outputs (the
    skipped samples contributed exactly 0·camdE before). None = full
    batch."""
    iters: int = 50
    adv_lr: float = 2.0      # β1: adversarial step size
    col_lr: float = 1.0      # β2: stealthiness step size
    adv_w: float = 1.0
    p_thresh: float = 0.9
    camde_range: Optional[tuple] = None


def stealth_weights(stealth_loss: str):
    """Loss-name → (prjl2_w, caml2_w, camdE_w)
    (ref ``projector_based_attack.py:248-251``)."""
    return (0.1 if "prjl2" in stealth_loss else 0.0,
            1.0 if "caml2" in stealth_loss else 0.0,
            1.0 if "camdE" in stealth_loss else 0.0)


def _per_sample_l2(diff: jax.Array) -> jax.Array:
    """Mean per-pixel channel L2 norm per sample (Zhao CVPR'20 flavor,
    ref ``:275-279``): [B, H, W, C] → [B].

    sqrt is guarded: at exactly-zero pixel diffs (e.g. prjl2 at iteration 0
    where prj_adv == gray init) d√x/dx → ∞ and the pullback is NaN, which
    would poison the whole sample through gradient normalization. The
    ``maximum`` guard routes the gradient to the constant branch there."""
    s = jnp.sum(diff * diff, axis=-1)
    return jnp.mean(jnp.sqrt(jnp.maximum(s, 1e-12)), axis=(1, 2))


def _normalized(g: jax.Array) -> jax.Array:
    """g_b / ||g_b||_2 per sample (ref ``:307``)."""
    norms = jnp.sqrt(jnp.sum(g * g, axis=(1, 2, 3), keepdims=True))
    return g / jnp.maximum(norms, 1e-12)


def spaa_attack_batched(
    pcnet_apply: Callable,          # (pcnet_state, prj [B,Hp,Wp,3]) -> cam_infer
    logits_fn: Callable,            # (clf_params, cam_infer) -> raw logits
    pcnet_state,                    # pytree: frozen PCNet params/cache/mask/...
    clf_params,                     # pytree: frozen classifier params
    cam_scene: jax.Array,           # [1, H, W, 3]
    prj_init: jax.Array,            # [B, Hp, Wp, 3] (gray)
    target_idx: jax.Array,          # [B] int32
    targeted: jax.Array,            # [B] bool
    weights: jax.Array,             # [B, 3] (prjl2_w, caml2_w, camdE_w)
    d_thr: jax.Array,               # [B] float
    cfg: SpaaConfig = SpaaConfig(),
):
    """Core batched SPAA loop. Returns (cam_infer_best, prj_adv_best).

    Jittable; every per-config quantity is a traced array so one compiled
    program serves the whole stealth_loss × d_thr sweep.

    ``pcnet_state``/``clf_params`` are explicit arguments (NOT closures) so
    the frozen weights stay jit inputs — closure-captured device arrays
    would be embedded as program constants, which bloats the executable,
    defeats the compilation cache, and on networked TPU backends re-ships
    the weights with every dispatch.
    """
    b = prj_init.shape[0]
    cam_scene_b = jnp.broadcast_to(cam_scene, (b,) + cam_scene.shape[1:])

    def body(i, state):
        del i
        return _spaa_body(pcnet_apply, logits_fn, pcnet_state, clf_params,
                          cam_scene, state, prj_init, target_idx, targeted,
                          weights, d_thr, cfg)

    state0 = (prj_init, prj_init, cam_scene_b, jnp.full((b,), 1e6))
    state = jax.lax.fori_loop(0, cfg.iters, body, state0)
    _, prj_best, cam_best, _ = state
    return cam_best, jnp.clip(prj_best, 0.0, 1.0)


def spaa_attack_stepped(pcnet_apply, logits_fn, pcnet_state, clf_params,
                        cam_scene, prj_init, target_idx, targeted, weights,
                        d_thr, cfg: SpaaConfig = SpaaConfig()):
    """Same attack, but one jitted step dispatched ``cfg.iters`` times from
    the host. On the XLA CPU backend loop bodies inside fori_loop/scan run
    without the intra-op thread pool (~7x slower per step than the same
    jitted step dispatched from Python); this variant keeps CPU runs and CI
    usable. Identical math/trajectory to :func:`spaa_attack_batched`."""
    # run the body iters times threading full state through a jitted step
    b = prj_init.shape[0]
    cam_scene_b = jnp.broadcast_to(cam_scene, (b,) + cam_scene.shape[1:])
    state = (prj_init, prj_init, cam_scene_b, jnp.full((b,), 1e6))

    for _ in range(cfg.iters):
        state = _spaa_step_jit(pcnet_apply, logits_fn, pcnet_state,
                               clf_params, cam_scene, state, prj_init,
                               target_idx, targeted, weights, d_thr, cfg)
    _, prj_best, cam_best, _ = state
    return cam_best, jnp.clip(prj_best, 0.0, 1.0)


def _spaa_body(pcnet_apply, logits_fn, pcnet_state, clf_params, cam_scene,
               state, im_gray, target_idx, targeted, weights, d_thr,
               cfg: SpaaConfig):
    """One SPAA iteration on explicit state.

    Key re-design vs the reference's two full backward passes per
    iteration (``projector_based_attack.py:302-315``): the masked update
    applies *either* the adversarial gradient or the color gradient per
    sample, and both are ``J_pcnetᵀ · (a camera-space cotangent)``. So the
    camera-space cotangents (classifier-bwd and color-bwd — both cheap)
    are computed first, selected per sample by the mask, and pulled back
    through PCNet ONCE. Per-sample gradient normalization makes this
    exactly equivalent to the reference trajectory (the prjl2 term, whose
    gradient bypasses PCNet, is added before normalization on the color
    branch only)."""
    b = im_gray.shape[0]
    cam_scene_b = jnp.broadcast_to(cam_scene, (b,) + cam_scene.shape[1:])
    # Lab on the single scene image, broadcast after: rgb2lab is
    # elementwise, so f(broadcast(x)) == broadcast(f(x)) bitwise — and the
    # whole chain runs on 1 image instead of B copies every iteration
    scene_lab1 = rgb2lab_diff(cam_scene)
    arange_b = jnp.arange(b)
    tgt_sign = jnp.where(targeted, -1.0, 1.0)
    prj_adv, prj_best, cam_best, col_best = state

    # forward through the frozen simulator (clamp included: grads must
    # vanish outside [0,1], ref :265)
    cam_infer, vjp_pc = jax.vjp(
        lambda p: pcnet_apply(pcnet_state, jnp.clip(p, 0.0, 1.0)), prj_adv)

    raw, vjp_clf = jax.vjp(lambda c: logits_fn(clf_params, c), cam_infer)

    # adversarial cotangent on raw scores: d mean(sign·raw[b, t_b]) / d raw
    adv_raw_cot = jnp.zeros_like(raw).at[arange_b, target_idx].set(
        cfg.adv_w * tgt_sign / b)
    g_adv_cam, = vjp_clf(adv_raw_cot)

    # color losses that flow through the camera image; caml2 is computed
    # for the FULL batch (it also feeds mask_high_pert below), camdE only
    # on the statically camdE-active slice (see SpaaConfig.camde_range)
    lo, hi = cfg.camde_range if cfg.camde_range is not None else (0, b)

    def col_cam_fn(c):
        caml2 = _per_sample_l2(cam_scene_b - c)
        if hi > lo:
            sub_lab = jnp.broadcast_to(scene_lab1,
                                       (hi - lo,) + scene_lab1.shape[1:])
            camde_sub = jnp.mean(
                ciede2000_diff(rgb2lab_diff(c[lo:hi]), sub_lab),
                axis=(1, 2))
            camde = jnp.zeros((b,), camde_sub.dtype).at[lo:hi].set(camde_sub)
        else:
            camde = jnp.zeros((b,), c.dtype)
        col_cam_batch = weights[:, 1] * caml2 + weights[:, 2] * camde
        return jnp.mean(col_cam_batch), (caml2, col_cam_batch)

    _, vjp_col, (caml2, col_cam_batch) = jax.vjp(col_cam_fn, cam_infer,
                                                 has_aux=True)
    g_col_cam, = vjp_col(1.0)

    # prjl2 flows directly from prj_adv (not through PCNet)
    g_prjl2 = jax.grad(
        lambda p: jnp.mean(weights[:, 0] * _per_sample_l2(im_gray - p)))(
        prj_adv)
    prjl2 = _per_sample_l2(im_gray - prj_adv)
    col_batch = weights[:, 0] * prjl2 + col_cam_batch

    # masks (ref :289-299); untargeted ignores the confidence test
    p = jax.nn.softmax(raw, axis=1)
    top_idx = jnp.argmax(raw, axis=1)
    top_p = jnp.max(p, axis=1)
    mask_high_conf = top_p > cfg.p_thresh
    mask_high_pert = caml2 * 255.0 > d_thr
    mask_succ = jnp.where(targeted, top_idx == target_idx,
                          top_idx != target_idx)
    mask_best_adv = mask_succ & mask_high_pert & (mask_high_conf | ~targeted)
    m = mask_best_adv[:, None, None, None]

    # ONE PCNet pullback on the per-sample-selected camera cotangent
    cot_cam = jnp.where(m, g_col_cam, g_adv_cam)
    g_prj, = vjp_pc(cot_cam)
    total = g_prj + jnp.where(m, g_prjl2, jnp.zeros_like(g_prjl2))

    step = jnp.where(m, cfg.col_lr, cfg.adv_lr) * _normalized(total)
    prj_adv = prj_adv - step

    mask_best = (col_batch < col_best) & mask_best_adv
    col_best = jnp.where(mask_best, col_batch, col_best)
    keep = (mask_succ | mask_best)[:, None, None, None]
    prj_best = jnp.where(keep, prj_adv, prj_best)
    cam_best = jnp.where(keep, cam_infer, cam_best)
    return prj_adv, prj_best, cam_best, col_best


_spaa_step_jit = functools.partial(jax.jit, static_argnums=(0, 1, 11))(
    lambda *a: _spaa_body(*a))


def spaa_attack_auto(pcnet_apply, logits_fn, pcnet_state, clf_params,
                     cam_scene, prj_init, target_idx, targeted, weights,
                     d_thr, cfg: SpaaConfig = SpaaConfig()):
    """Backend-adaptive entry: on-device fori_loop program on accelerators,
    host-stepped jitted body on the CPU backend."""
    if jax.default_backend() == "cpu":
        return spaa_attack_stepped(pcnet_apply, logits_fn, pcnet_state,
                                   clf_params, cam_scene, prj_init,
                                   target_idx, targeted, weights, d_thr, cfg)
    return _spaa_jit(pcnet_apply, logits_fn, pcnet_state, clf_params,
                     cam_scene, prj_init, target_idx, targeted, weights,
                     d_thr, cfg)


@functools.partial(jax.jit, static_argnums=(0, 1, 10))
def _spaa_jit(pcnet_apply, logits_fn, pcnet_state, clf_params, cam_scene,
              prj_init, target_idx, targeted, weights, d_thr, cfg):
    return spaa_attack_batched(pcnet_apply, logits_fn, pcnet_state,
                               clf_params, cam_scene, prj_init, target_idx,
                               targeted, weights, d_thr, cfg)


def spaa(pcnet_apply: Callable, logits_fn: Callable, pcnet_state, clf_params,
         imagenet_labels, target_idx, targeted: bool, cam_scene, d_thr,
         stealth_loss: str, setup_info, cfg: SpaaConfig = SpaaConfig(),
         verbose: bool = True):
    """Reference-parity single-config entry point
    (ref ``spaa()``, ``projector_based_attack.py:212``).

    pcnet_apply(pcnet_state, prj): frozen PCNet forward (prj → cam_infer).
    logits_fn(clf_params, cam):    frozen classifier forward (cam → logits).
    Returns (cam_infer_best, prj_adv_best) as jnp arrays.
    """
    import numpy as np
    num_target = len(target_idx)
    ph, pw = setup_info["prj_im_sz"][1], setup_info["prj_im_sz"][0]
    prj_init = jnp.full((num_target, ph, pw, 3),
                        float(setup_info["prj_brightness"]))
    w = jnp.tile(jnp.asarray(stealth_weights(stealth_loss)), (num_target, 1))
    cam_best, prj_best = spaa_attack_auto(
        pcnet_apply, logits_fn, pcnet_state, clf_params,
        jnp.asarray(cam_scene), prj_init,
        jnp.asarray(np.asarray(target_idx), jnp.int32),
        jnp.full((num_target,), bool(targeted)),
        w, jnp.full((num_target,), float(d_thr)), cfg)
    if verbose:
        raw = logits_fn(clf_params, cam_best)
        p = jax.nn.softmax(raw, axis=1)
        v = 7 if (targeted and num_target > 7) else 0
        idx = int(jnp.argmax(raw[v]))
        print(f"  [spaa done] p = {float(p[v, idx]):.4f} | y = {idx:3d} "
              f"({imagenet_labels.get(idx, '?')})")
    return cam_best, prj_best
