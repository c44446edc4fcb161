"""Attack orchestration: config factories, the benchmark sweep driver, and
real-capture replay.

Re-design of reference ``projector_based_attack.py:24-209,342-359``. Public
behavior preserved: same attacker names, same stealth_loss × d_thr ×
classifier sweep grid, same output directory scheme
(``prj/adv/<attacker_cfg>/<loss>/<d_thr>/<classifier>`` etc., a de-facto
API of the benchmark dataset layout).

TPU re-design: for SPAA/PerC-AL the (stealth_loss × d_thr) grid for one
classifier is fused into a *single batched attack call* (see
``attack/spaa.py``) — the per-config loop below only slices results back
out into the reference directory layout.
"""

from __future__ import annotations

import itertools
from os.path import join
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from spaa_tpu.attack.perc_al import PerC_AL
from spaa_tpu.attack.spaa import SpaaConfig, spaa_attack_auto, stealth_weights
from spaa_tpu.models.classifiers import (Classifier, load_imagenet_labels,
                                         make_logits_fn)
from spaa_tpu.train.data import load_setup_info
from spaa_tpu.train.train import get_model_train_cfg
from spaa_tpu.utils.config import DictConfig
from spaa_tpu.utils.io import imread, save_imgs
from spaa_tpu.utils.seed import reset_rng_seeds
from spaa_tpu.ops.image import center_crop, expand_4d

ATTACKER_NAMES = ["SPAA", "PerC-AL+CompenNet++", "One-pixel_DE"]


def get_attacker_cfg(attacker_name: str, data_root: str, setup_list,
                     device_ids=(0,), load_pretrained: bool = False,
                     plot_on: bool = False) -> DictConfig:
    """Ref ``projector_based_attack.py:169-192`` — identical grids."""
    cfg = DictConfig({})
    cfg.attacker_name = attacker_name
    cfg.classifier_names = ["inception_v3", "resnet18", "vgg16"]
    cfg.data_root = data_root
    cfg.setup_list = setup_list
    cfg.device = "tpu"
    cfg.device_ids = list(device_ids)
    cfg.load_pretrained = load_pretrained
    cfg.plot_on = plot_on
    if attacker_name == "SPAA":
        cfg.stealth_losses = ["caml2", "camdE", "camdE_caml2"]
        cfg.d_threshes = [5, 7, 9, 11]
    elif attacker_name == "PerC-AL+CompenNet++":
        cfg.stealth_losses = ["camdE"]
        cfg.d_threshes = [11]
    elif attacker_name == "One-pixel_DE":
        cfg.stealth_losses = ["-"]
        cfg.d_threshes = ["-"]
    else:
        raise AssertionError(f"{attacker_name} not supported!")
    return cfg


def to_attacker_cfg_str(attacker_name: str):
    """Ref ``projector_based_attack.py:195-209`` — directory-name scheme."""
    assert attacker_name in ATTACKER_NAMES, f"{attacker_name} not supported!"
    if attacker_name == "SPAA":
        mc = get_model_train_cfg(["PCNet"], single=True)
        model_cfg_str = (f"{mc.model_name}_{mc.loss}_{mc.num_train}_"
                         f"{mc.batch_size}_{mc.max_iters}")
        return f"{attacker_name}_{model_cfg_str}", model_cfg_str
    if attacker_name == "PerC-AL+CompenNet++":
        mc = get_model_train_cfg(["CompenNet++"], single=True)
        model_cfg_str = (f"{mc.model_name}_{mc.loss}_{mc.num_train}_"
                         f"{mc.batch_size}_{mc.max_iters}")
        return (f"{attacker_name}_{mc.loss}_{mc.num_train}_{mc.batch_size}_"
                f"{mc.max_iters}", model_cfg_str)
    return attacker_name, None


def perc_al_compennet_pp(compennet_pp_apply, classifier: Classifier,
                         imagenet_labels, target_idx, targeted,
                         cam_scene, d_thr, setup_info,
                         max_iterations: int = 50):
    """Two-stage attacker (ref ``projector_based_attack.py:342-359``):
    PerC-AL digital attack on the camera image, then CompenNet++
    compensates it into a projector input.

    ``targeted`` may be a bool (reference semantics) or a per-sample bool
    array — the fused sweep passes 10 targeted + 1 untargeted as one batch
    (one compiled program per classifier instead of two). Confidence=40
    only ever applies to untargeted samples (ref constructs the targeted
    attacker with confidence=0, which is a no-op for targeted masks)."""
    num_target = len(target_idx)
    cam_scene_b = jnp.broadcast_to(jnp.asarray(cam_scene),
                                   (num_target,) + cam_scene.shape[1:])
    if isinstance(targeted, (bool, np.bool_)):
        confidence = 0 if targeted else 40
    else:
        confidence = 40
    attacker = PerC_AL(max_iterations=max_iterations, alpha_l_init=1.0,
                       alpha_c_init=0.5, confidence=confidence)
    cp_sz = tuple(int(c) for c in setup_info["classifier_crop_sz"])

    def logits_fn(params, im):
        return classifier._logits_fn(params, im, cp_sz)

    cam_infer_best = attacker.adversary_projector(
        logits_fn, classifier.params, cam_scene_b, np.asarray(target_idx),
        imagenet_labels=imagenet_labels, d_thr=d_thr, targeted=targeted)
    prj_adv_best = compennet_pp_apply(cam_infer_best, cam_scene_b)
    return cam_infer_best, prj_adv_best


def run_projector_based_attack(cfg, procams=None,
                               weights_dir: Optional[str] = None):
    """Benchmark sweep driver (ref ``projector_based_attack.py:24-148``).

    procams: optional project-and-capture object for One-pixel_DE (hardware
    or the synthetic simulator). weights_dir: classifier checkpoints dir.
    """
    attacker_name = cfg.attacker_name
    assert attacker_name in ATTACKER_NAMES, f"{attacker_name} not supported!"
    assert (attacker_name != "One-pixel_DE") or (len(cfg.setup_list) == 1), \
        f"{attacker_name} does not support attacking multiple setups simultaneously!"
    reset_rng_seeds(0)

    for setup_name in cfg.setup_list:
        print(f"\nPerforming [{attacker_name}] attack on [{setup_name}]")
        setup_path = join(cfg.data_root, "setups", setup_name)
        setup_info = load_setup_info(setup_path)
        cp_sz = tuple(int(c) for c in setup_info["classifier_crop_sz"])
        w_cam, h_cam = setup_info["cam_im_sz"]
        cam_scene = np.asarray(center_crop(
            expand_4d(jnp.asarray(imread(join(setup_path,
                                              "cam/raw/ref/img_0002.png")))),
            (h_cam, w_cam)))

        imagenet_labels = load_imagenet_labels(
            join(cfg.data_root, "imagenet1000_clsidx_to_labels.txt"))
        target_labels = load_imagenet_labels(
            join(cfg.data_root, "imagenet10_clsidx_to_labels.txt"))

        dl_based = attacker_name in ["SPAA", "PerC-AL+CompenNet++"]
        trained = None
        if dl_based:
            from spaa_tpu.train.pipeline import (train_eval_compennet_pp,
                                                 train_eval_pcnet)
            model_cfg = get_model_train_cfg(
                None, cfg.data_root, [setup_name],
                load_pretrained=cfg.load_pretrained, plot_on=cfg.plot_on)
            if attacker_name == "SPAA":
                model_cfg.model_list = ["PCNet"]
                if "max_iters" in cfg:       # test override
                    model_cfg.max_iters = cfg.max_iters
                trained, _, model_cfg = train_eval_pcnet(model_cfg)
            else:
                model_cfg.model_list = ["CompenNet++"]
                if "max_iters" in cfg:
                    model_cfg.max_iters = cfg.max_iters
                if "init_max_iters" in cfg:  # test override (CompenNet init)
                    model_cfg.init_max_iters = cfg.init_max_iters
                trained, _, model_cfg = train_eval_compennet_pp(model_cfg)
            cfg.model_cfg = dict(model_cfg)
        else:
            from spaa_tpu.attack.one_pixel import ProjectorOnePixelAttacker
            assert procams is not None, \
                "One-pixel_DE needs a procams (hardware or simulator)"
            one_pixel_de = ProjectorOnePixelAttacker(imagenet_labels,
                                                     setup_info, procams)
            ph, pw = setup_info["prj_im_sz"][1], setup_info["prj_im_sz"][0]
            im_prj_org = np.full((ph, pw, 3),
                                 float(setup_info["prj_brightness"]),
                                 np.float32)
            one_pixel_de.im_cam_org = cam_scene[0]
            model_cfg = None

        attacker_cfg_str = to_attacker_cfg_str(attacker_name)[0]

        n = 10  # 10 targeted + 1 untargeted (ref :79-81)
        target_labels = dict(itertools.islice(target_labels.items(), n))
        target_idx = list(target_labels.keys())

        for classifier_name in cfg.classifier_names:
            classifier = Classifier(classifier_name, weights_dir,
                                    sort_results=dl_based)
            _, p, pred_idx = classifier(jnp.asarray(cam_scene), cp_sz)
            true_idx = int(pred_idx[0, 0]) if dl_based else int(p.argmax())
            true_label = imagenet_labels[true_idx]
            print(f"\n---- [{attacker_name}] attacking [{classifier_name}], "
                  f"original prediction: ({true_label}, p={p.max():.2f}) ----")

            if attacker_name == "SPAA":
                _run_spaa_sweep(cfg, trained, classifier, cam_scene,
                                target_idx, true_idx, setup_info, setup_path,
                                attacker_cfg_str, classifier_name,
                                imagenet_labels)
            elif attacker_name == "PerC-AL+CompenNet++":
                _run_percal_sweep(cfg, trained, classifier, cam_scene,
                                  target_idx, true_idx, setup_info,
                                  setup_path, attacker_cfg_str,
                                  classifier_name, imagenet_labels)
            else:
                _run_one_pixel(cfg, one_pixel_de, classifier, im_prj_org,
                               target_idx, true_idx, true_label, setup_path,
                               attacker_cfg_str, classifier_name,
                               imagenet_labels, n)

        if dl_based:
            print(f"\nThe next step is to project and capture "
                  f"[{attacker_name}] generated adversarial projections in "
                  f"{join(setup_path, 'prj/adv', attacker_cfg_str)}")
    return cfg


def make_pcnet_fn(trained, use_pallas_warp: Optional[bool] = None,
                  compute_dtype: Optional[str] = None,
                  taps_stem: Optional[bool] = None,
                  taps_enc2: Optional[bool] = None):
    """Frozen PCNet forward with the baked simplify cache.

    Returns ``(pcnet_apply, pcnet_state)`` with
    ``pcnet_apply(pcnet_state, prj) -> cam_infer`` — the state pytree is a
    jit *argument* everywhere (closure-captured device arrays would be
    baked into the compiled program as constants).

    TPU fast paths (both default-on on the TPU backend):
      - the constant-grid warp runs through the Pallas two-stage-gather
        kernel (``ops.pallas.warp``) instead of XLA gather/scatter;
      - the shading CNN computes in bfloat16 (f32 in/out) — the MXU's
        native dtype; attack gradients stay f32 outside.

    ``taps_stem``/``taps_enc2`` (conv1/conv1_s resp. conv2/conv2_s
    backward-data via the tap-GEMM rewrite, layers.conv2d_taps_bwd) are
    opt-in on every backend: the in-context A/B on the production sweep
    programs (tools/taps_ab.py, TPU, trained ckpt) measured the all-on
    variant 11-24% SLOWER per classifier — XLA's layout/fusion around
    the rewrites costs more than the recovered MXU lanes, same verdict
    as the packed-encoder/subpix knobs (tools/incontext_ab.py).
    """
    on_tpu = jax.default_backend() == "tpu"
    if use_pallas_warp is None:
        use_pallas_warp = on_tpu
    if compute_dtype is None:
        compute_dtype = "bfloat16" if on_tpu else "float32"
    if taps_stem is None:
        taps_stem = False   # measured in-context loss; see docstring
    if taps_enc2 is None:
        taps_enc2 = False
    cdtype = jnp.dtype(compute_dtype)

    model = trained.model
    updates = {k: True for k, want in
               (("taps_stem", taps_stem), ("taps_enc2", taps_enc2))
               if want and getattr(model, k, None) is False}
    if updates:
        # param tree is identical either way (tests/test_taps_bwd.py)
        model = model.clone(**updates)
    cache = trained.simplify()
    state = dict(params=trained.params, cache=cache, mask=trained.mask,
                 scene=jnp.asarray(trained.cam_scene))

    spec = None
    if use_pallas_warp and cache is not None:
        from spaa_tpu.ops.pallas.warp import build_fixed_warp
        prj_hw = (int(trained.setup_info["prj_im_sz"][1]),
                  int(trained.setup_info["prj_im_sz"][0]))
        # fold the binary direct-light mask into the warp weights (exact:
        # PCNet multiplies the warped image by the mask immediately after,
        # and x*m*m == x*m ONLY for a 0/1 mask — a fractional/feathered
        # mask would be squared silently, hence the assert)
        dstw = None
        if trained.mask is not None:
            m = np.asarray(trained.mask)
            dstw = m[..., 0] if m.ndim == 3 else m
            assert np.all((dstw == 0.0) | (dstw == 1.0)), \
                "direct-light mask must be binary to fold into warp weights"
        spec, warp_tables = build_fixed_warp(np.asarray(cache.fine_grid),
                                             prj_hw, dst_weight=dstw)
        print(f"[make_pcnet_fn] pallas warp tables: K_f={spec.fwd_k} "
              f"G_f={spec.fwd_g} K_b={spec.bwd_k} G_b={spec.bwd_g}")
        # pathological (non-smooth) grids explode the spill count; the XLA
        # take-based path is then the better program
        if spec.fwd_k > 32 or spec.bwd_k > 48:
            print(f"[make_pcnet_fn] warp spill counts too high "
                  f"(K_f={spec.fwd_k}, K_b={spec.bwd_k}); "
                  "falling back to XLA grid_sample")
            spec = None
        else:
            state["warp"] = warp_tables

    lowp = cdtype != jnp.float32
    if lowp:
        state["params_c"] = jax.tree.map(
            lambda x: x.astype(cdtype) if x.dtype == jnp.float32 else x,
            trained.params)

    def pcnet_apply(st, prj):
        from spaa_tpu.models.pcnet import PCNetCache
        # the scene stays [1, H, W, 3]: ShadingNet runs its scene-only
        # skipConv1 chain on ONE image and broadcasts at the final add
        # (value-preserving; saves a B-wide conv chain per attack iter)
        s = st["scene"]
        warped = None
        cache = st["cache"]
        if spec is not None:
            from spaa_tpu.ops.pallas.warp import fixed_warp_apply
            warped = fixed_warp_apply(spec, st["warp"], prj)
            # the Pallas warp supersedes the baked grid, but the baked
            # surface-branch features (use_rough=False variants) must be
            # kept — dropping the whole cache would silently recompute the
            # surface branch every forward
            if cache is not None:
                cache = (PCNetCache(None, cache.surface_feats)
                         if cache.surface_feats is not None else None)
        if not lowp:
            return model.apply({"params": st["params"]}, prj, s, st["mask"],
                               cache=cache, warped=warped)
        out = model.apply(
            {"params": st["params_c"]}, prj.astype(cdtype), s.astype(cdtype),
            None if st["mask"] is None else jnp.asarray(st["mask"], cdtype),
            # fine_grid stays f32 (coordinate precision; grid_sample
            # returns the IMAGE dtype, so a f32 grid doesn't promote the
            # bf16 activations) but cached surface features must match the
            # compute dtype or the next conv raises a dtype mismatch
            cache=None if cache is None else PCNetCache(
                cache.fine_grid,
                None if cache.surface_feats is None else jax.tree.map(
                    lambda x: x.astype(cdtype), cache.surface_feats)),
            warped=None if warped is None else warped.astype(cdtype))
        return out.astype(jnp.float32)

    return pcnet_apply, state


def make_attack_logits_fn(classifier, cp_sz, compute_dtype):
    """Classifier forward for the attack loops: crop to ``cp_sz``, compute
    in ``compute_dtype`` (bf16 on TPU), raw f32 logits out. Returns
    ``(logits_fn, clf_params)`` with the params pre-cast to the compute
    dtype (params are jit arguments, never closures)."""
    logits_fn_inner = make_logits_fn(classifier.name)
    cdtype = jnp.dtype(compute_dtype)
    clf_params = classifier.params
    if cdtype != jnp.float32:
        clf_params = jax.tree.map(
            lambda x: x.astype(cdtype) if x.dtype == jnp.float32 else x,
            clf_params)

    def logits_fn(params, im):
        return logits_fn_inner(params, im.astype(cdtype),
                               cp_sz).astype(jnp.float32)

    return logits_fn, clf_params


def build_spaa_sweep_arrays(cfg, setup_info, target_idx, true_idx):
    """Per-sample arrays of the fused (stealth_loss × d_thr) SPAA sweep:
    the batch layout contract shared by the sequential driver
    (:func:`_run_spaa_sweep`) and the setup-parallel deployment path
    (:func:`spaa_tpu.parallel.run_spaa_attack_multi_setup`).

    Returns ``(configs, per_cfg, prj_init, tgt, targeted, w, dt,
    spaa_cfg)`` — config ci occupies batch rows ``[ci*per_cfg,
    (ci+1)*per_cfg)`` as ``n`` targeted samples then 1 untargeted
    (ref ``projector_based_attack.py:79-81,136-139``)."""
    configs = [(sl, d) for sl in cfg.stealth_losses for d in cfg.d_threshes]
    # camdE-active configs last (stable sort): the CIEDE2000 chain — the
    # most expensive color term — then runs on one static contiguous batch
    # slice instead of the whole batch (SpaaConfig.camde_range; bitwise
    # identical outputs, the skipped samples had weight 0)
    configs.sort(key=lambda c: stealth_weights(c[0])[2] > 0)
    n = len(target_idx)
    per_cfg = n + 1  # 10 targeted + 1 untargeted
    b = len(configs) * per_cfg
    n_camde = sum(1 for sl, _ in configs if stealth_weights(sl)[2] > 0)
    camde_range = ((len(configs) - n_camde) * per_cfg, b)

    ph, pw = setup_info["prj_im_sz"][1], setup_info["prj_im_sz"][0]
    prj_init = np.full((b, ph, pw, 3), float(setup_info["prj_brightness"]),
                       np.float32)
    tgt = np.zeros(b, np.int32)
    targeted = np.zeros(b, bool)
    w = np.zeros((b, 3), np.float32)
    dt = np.zeros(b, np.float32)
    for ci, (sl, d) in enumerate(configs):
        s = ci * per_cfg
        tgt[s:s + n] = target_idx
        targeted[s:s + n] = True
        tgt[s + n] = true_idx
        targeted[s + n] = False
        w[s:s + per_cfg] = stealth_weights(sl)
        dt[s:s + per_cfg] = float(d)

    spaa_cfg = SpaaConfig(iters=int(cfg.get("attack_iters", 50)),
                          camde_range=camde_range)
    return configs, per_cfg, prj_init, tgt, targeted, w, dt, spaa_cfg


def save_spaa_sweep_outputs(cam_best, prj_best, configs, per_cfg,
                            setup_path, attacker_cfg_str, classifier_name):
    """Unpack the fused sweep's outputs into the reference directory
    layout (targeted 1..n then untargeted as image n+1, ref ``:136-139``)."""
    for ci, (stealth_loss, d_thr) in enumerate(configs):
        s = ci * per_cfg
        folder = join(attacker_cfg_str, stealth_loss, str(d_thr),
                      classifier_name)
        save_imgs(cam_best[s:s + per_cfg],
                  join(setup_path, "cam/infer/adv", folder))
        save_imgs(prj_best[s:s + per_cfg],
                  join(setup_path, "prj/adv", folder))


def _run_spaa_sweep(cfg, trained, classifier, cam_scene, target_idx,
                    true_idx, setup_info, setup_path, attacker_cfg_str,
                    classifier_name, imagenet_labels):
    """All (stealth_loss × d_thr) configs × (1 untargeted + 10 targeted) as
    ONE batched attack, then unpack into the reference directory layout."""
    cp_sz = tuple(int(c) for c in setup_info["classifier_crop_sz"])
    compute_dtype = cfg.get(
        "attack_dtype",
        "bfloat16" if jax.default_backend() == "tpu" else "float32")
    pcnet_apply, pcnet_state = make_pcnet_fn(trained,
                                             compute_dtype=compute_dtype)
    logits_fn, clf_params = make_attack_logits_fn(classifier, cp_sz,
                                                  compute_dtype)
    (configs, per_cfg, prj_init, tgt, targeted, w, dt,
     spaa_cfg) = build_spaa_sweep_arrays(cfg, setup_info, target_idx,
                                         true_idx)
    cam_best, prj_best = spaa_attack_auto(
        pcnet_apply, logits_fn, pcnet_state, clf_params,
        jnp.asarray(cam_scene), jnp.asarray(prj_init), jnp.asarray(tgt),
        jnp.asarray(targeted), jnp.asarray(w), jnp.asarray(dt),
        spaa_cfg)
    save_spaa_sweep_outputs(np.asarray(cam_best), np.asarray(prj_best),
                            configs, per_cfg, setup_path, attacker_cfg_str,
                            classifier_name)
    print(f"  [SPAA] {len(configs)} configs × {per_cfg} attacks "
          f"done in one batched run (batch {prj_init.shape[0]})")


def _run_percal_sweep(cfg, trained, classifier, cam_scene, target_idx,
                      true_idx, setup_info, setup_path, attacker_cfg_str,
                      classifier_name, imagenet_labels):
    model, params = trained.model, trained.params
    jit_apply = jax.jit(lambda p, cam, scene:
                        model.apply({"params": p}, cam, scene))

    def compennet_pp_apply(cam, scene):
        return jit_apply(params, cam, scene)

    # fused sweep: 10 targeted + 1 untargeted as ONE batched PerC-AL program
    # per (loss, d_thr) — same technique as the SPAA sweep; per-sample
    # gradient normalization makes it exactly equivalent to the reference's
    # two separate runs (tests/test_attacks.py::test_percal_batched_*)
    for stealth_loss in cfg.stealth_losses:
        for d_thr in cfg.d_threshes:
            folder = join(attacker_cfg_str, stealth_loss, str(d_thr),
                          classifier_name)
            all_idx = list(target_idx) + [true_idx]
            targeted_arr = np.asarray([True] * len(target_idx) + [False])
            cam_all, prj_all = perc_al_compennet_pp(
                compennet_pp_apply, classifier, imagenet_labels, all_idx,
                targeted_arr, jnp.asarray(cam_scene), d_thr, setup_info,
                max_iterations=int(cfg.get("attack_iters", 50)))
            save_imgs(np.asarray(cam_all),
                      join(setup_path, "cam/infer/adv", folder))
            save_imgs(np.asarray(prj_all),
                      join(setup_path, "prj/adv", folder))


def _run_one_pixel(cfg, one_pixel_de, classifier, im_prj_org, target_idx,
                   true_idx, true_label, setup_path, attacker_cfg_str,
                   classifier_name, imagenet_labels, n):
    # DE budget (ref projector_based_attack.py:111-130 defaults; the
    # cfg.get overrides exist for tiny-shape CI runs)
    pixel_size = int(cfg.get("op_pixel_size", 41))
    maxiter = int(cfg.get("op_maxiter", 4))
    pop_u = int(cfg.get("op_popsize_untargeted", 50))
    pop_t = int(cfg.get("op_popsize_targeted", 10))
    for stealth_loss in cfg.stealth_losses:
        for d_thr in cfg.d_threshes:
            folder = join(attacker_cfg_str, stealth_loss, str(d_thr),
                          classifier_name)
            cam_raw_adv_path = join(setup_path, "cam/raw/adv", folder)
            prj_adv_path = join(setup_path, "prj/adv", folder)
            # untargeted (ref :110-113)
            _, prj_u, cam_u = one_pixel_de(
                im_prj_org, classifier, False, target_idx=true_idx,
                pixel_count=1, pixel_size=pixel_size, maxiter=maxiter,
                popsize=pop_u, verbose=True, true_label=true_label)
            # targeted (ref :124-134)
            for i in range(n):
                _, prj_t, cam_t = one_pixel_de(
                    im_prj_org, classifier, True, target_idx=target_idx[i],
                    pixel_count=1, pixel_size=pixel_size, maxiter=maxiter,
                    popsize=pop_t, verbose=True, true_label=true_label)
                save_imgs(cam_t[None], cam_raw_adv_path, idx=i)
                save_imgs(prj_t[None], prj_adv_path, idx=i)
            save_imgs(cam_u[None], cam_raw_adv_path, idx=n)
            save_imgs(prj_u[None], prj_adv_path, idx=n)


def project_capture_real_attack(cfg, procams) -> None:
    """Replay adversarial projections through (real or simulated) ProCams
    (ref ``projector_based_attack.py:151-166``)."""
    attacker_name = cfg.attacker_name
    assert attacker_name in ["SPAA", "PerC-AL+CompenNet++"], \
        f"{attacker_name} not supported, One-pixel_DE does not use this function!"
    assert len(cfg.setup_list) == 1

    setup_path = join(cfg.data_root, "setups", cfg.setup_list[0])
    setup_info = load_setup_info(setup_path)
    for stealth_loss in cfg.stealth_losses:
        for d_thr in cfg.d_threshes:
            for classifier_name in cfg.classifier_names:
                attacker_cfg_str = to_attacker_cfg_str(attacker_name)[0]
                folder = join(attacker_cfg_str, stealth_loss, str(d_thr),
                              classifier_name)
                procams.project_capture_data(
                    join(setup_path, "prj/adv", folder),
                    join(setup_path, "cam/raw/adv", folder), setup_info)
