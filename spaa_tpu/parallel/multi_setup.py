"""Setup-parallel PCNet training: S independent setups in one SPMD program.

The reference benchmark trains one PCNet per captured setup, strictly
sequentially (``reproduce_paper_results.py:63-65`` loops 13 setups through
``train_eval_pcnet``). The trainings are embarrassingly parallel — no
shared state — so on a TPU pod slice the whole phase collapses to
ceil(13 / n_devices) sequential trainings: every per-setup tensor (params,
optimizer state, scene, mask, train pairs) gets a leading setup axis,
the axis is sharded over a 1-D ``jax.sharding.Mesh``, and the vmapped
train step runs with **zero cross-setup collectives** (XLA partitions it
into per-device programs; ICI stays idle).

Per-setup math is identical to :func:`spaa_tpu.train.train.train_model_scan`
on that setup (same minibatch gather, uint8 wire cast, curriculum switch,
optax update) — equivalence and sharded==single-device are tested in
``tests/test_parallel.py``.

This is a beyond-reference capability: the reference's only parallel axis
is ``nn.DataParallel`` batch scatter within ONE training (SURVEY.md §2
"Parallelism strategies").
"""

from __future__ import annotations

import functools
import os
from functools import partial
from os.path import join
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spaa_tpu.train.train import compute_loss


def stack_setups(trees):
    """Stack a list of identically-shaped pytrees along a new leading
    (setup) axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def unstack_setups(tree, num_setups: int):
    """Inverse of :func:`stack_setups`: stacked pytree → list of pytrees."""
    return [jax.tree.map(lambda x: x[i], tree) for i in range(num_setups)]


def _u8_to_f32(x):
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    return x


def _one_setup_step(model_apply: Callable, tx, loss_option: str,
                    curriculum_iter: int, variant: str, inputs, targets,
                    scene, mask, params, opt_state, idx, itr):
    """One training step of ONE setup — the same math as
    ``train.train_model_scan``'s step with the pipeline's loss for
    ``variant``:

    - ``"pcnet"``: ``apply(vars, prj, scene, mask)`` + curriculum
      l1→l1+ssim at ``curriculum_iter`` (ref ``train_network.py:299-303``)
    - ``"compennet_pp"``: ``apply(vars, cam, scene)`` (no mask argument,
      no curriculum — ref ``train_network.py:131-160``); ``mask`` is a
      dummy placeholder so both variants share the program plumbing.

    scene stays [1, H, W, 3] in both (the scene-only conv chains run on
    ONE image)."""
    x = _u8_to_f32(jnp.take(inputs, idx, axis=0))
    y = _u8_to_f32(jnp.take(targets, idx, axis=0))

    def loss_fn(p):
        if variant == "pcnet":
            infer = model_apply({"params": p}, x, scene, mask)
            w = (itr > curriculum_iter).astype(jnp.float32)
            return compute_loss(infer, y, loss_option, ssim_weight=w)
        assert variant == "compennet_pp", variant
        infer = model_apply({"params": p}, x, scene)
        return compute_loss(infer, y, loss_option)

    (loss, l2), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss, l2


def setup_sharding(mesh: Optional[Mesh], axis: str = "setup"):
    """NamedSharding splitting the leading (setup) axis, or None."""
    if mesh is None:
        return None
    return NamedSharding(mesh, P(axis))


@functools.lru_cache(maxsize=16)
def _compiled_multi_setup_programs(model_apply, tx, loss_option: str,
                                   curriculum_iter: int, variant: str,
                                   mesh: Optional[Mesh], axis: str,
                                   scan: bool):
    """Jitted multi-setup programs, memoized like
    ``train._compiled_train_programs`` so repeat calls (bench warm-up +
    timed run, chunked 13-setup training) hit jax's executable cache
    instead of re-tracing fresh closures. Flax ``model.apply`` bound
    methods and ``jax.sharding.Mesh`` hash stably; optax transforms hash
    by the identity of their function members.

    Multi-device execution goes through shard_map, NOT bare jit +
    sharding propagation: vmap lowers the batch-1 scene convs
    (e.g. ShadingNet's 1x1 skipConv1_0) to feature_group_count=S
    grouped convs, and XLA's SPMD partitioner mis-shards those (kernel
    output features split without the lhs channels — INVALID_ARGUMENT
    at compile). shard_map sidesteps propagation entirely: each device
    traces the per-shard program on LOCAL setups (fgc = S/n_devices)
    and, since the trainings share nothing, emits zero collectives.
    """
    # vmap over the setup axis; the shared (idx, itr) stay unmapped. All
    # big tensors are jit ARGUMENTS (iron rule: no device-array closures).
    vstep = jax.vmap(
        partial(_one_setup_step, model_apply, tx, loss_option,
                curriculum_iter, variant),
        in_axes=(0, 0, 0, 0, 0, 0, None, None))

    def step_any(inputs, targets, scenes, masks, p, o, idx, itr):
        # ONE setup (per-device after shard_map, or a single-setup call):
        # bypass vmap. vmap lowers every conv to a grouped conv (the
        # setup axis folds into channels) and XLA:TPU runs those ~8-13%
        # slower per setup at these shapes (tools/multi_setup_bench.py,
        # RTT-amortized: 59.0 vmapped vs 54.8 squeezed vs 52 production
        # ms/iter) — the squeeze keeps the one-setup-per-chip deployment
        # at the sequential production step's speed.
        if jax.tree.leaves(p)[0].shape[0] == 1:
            sq = partial(jax.tree.map, lambda x: x[0])
            p1, o1, loss, l2 = _one_setup_step(
                model_apply, tx, loss_option, curriculum_iter, variant,
                sq(inputs), sq(targets), sq(scenes), sq(masks), sq(p),
                sq(o), idx, itr)
            ex = partial(jax.tree.map, lambda x: x[None])
            return ex(p1), ex(o1), loss[None], l2[None]
        return vstep(inputs, targets, scenes, masks, p, o, idx, itr)

    def _maybe_shard_map(f, out_specs):
        if mesh is None:
            return jax.jit(f)
        sp = P(axis)
        return jax.jit(jax.shard_map(
            f, mesh=mesh, in_specs=(sp,) * 6 + (P(), P()),
            out_specs=out_specs))

    if scan:
        def run(params_stk, opt_stk, inputs, targets, scenes, masks,
                idx_all, iters_all):
            def body(carry, idx_itr):
                p, o = carry
                idx, itr = idx_itr
                p, o, loss, l2 = step_any(inputs, targets, scenes,
                                          masks, p, o, idx, itr)
                return (p, o), (loss, l2)
            (p, o), (losses, l2s) = jax.lax.scan(
                body, (params_stk, opt_stk), (idx_all, iters_all))
            return p, o, losses, l2s

        return _maybe_shard_map(
            run, (P(axis), P(axis), P(None, axis), P(None, axis)))

    return _maybe_shard_map(
        lambda p, o, inp, tgt, sc, mk, idx, itr:
            step_any(inp, tgt, sc, mk, p, o, idx, itr),
        (P(axis), P(axis), P(axis), P(axis)))


def train_pcnet_multi_setup(model_apply: Callable, params_list, tx,
                            scenes, masks, inputs, targets,
                            batch_idx: np.ndarray,
                            mesh: Optional[Mesh] = None,
                            axis: str = "setup",
                            loss_option: str = "l1+ssim",
                            curriculum_iter: int = 400,
                            use_scan: Optional[bool] = None,
                            variant: str = "pcnet",
                            segment: Optional[int] = 200):
    """Train S independent PCNets as one SPMD program.

    model_apply: the shared Flax apply, ``model.apply(vars, prj, scene,
                 mask)`` (all setups share the architecture; the benchmark
                 setups share image sizes too, ``data/README.md``).
    params_list: S per-setup param trees (identical structure/shapes;
                 per-setup affine inits differ in VALUE only).
    scenes:      [S, 1, H, W, 3] camera scenes (float or uint8 wire).
    masks:       [S, H, W, 1] direct-light masks.
    inputs/targets: [S, N, h, w, 3] / [S, N, H, W, 3] train pairs
                 (uint8 wire recommended — cast on device per minibatch).
    batch_idx:   [iters, batch] shared minibatch plan (the reference
                 reseeds 123 per setup, so per-setup plans are identical;
                 ``train.sample_batch_indices``).
    mesh:        1-D mesh whose ``axis`` shards the setup axis; S must be
                 divisible by the mesh size. None → single device.

    Returns (params_list_out, losses [iters, S], l2s [iters, S]).

    ``use_scan``: as in ``train_model_scan`` — on the CPU backend XLA runs
    scan bodies without the intra-op thread pool, so there the jitted
    step is dispatched from Python (same trajectory).
    ``segment``: max iterations per scan dispatch (default 200, matching
    the production ``valid_rate`` segments; None = one dispatch). A
    single multi-thousand-iter dispatch executes >100 s on-device and
    networked TPU backends can kill the worker as hung.
    """
    num_setups = len(params_list)
    if mesh is not None and num_setups % mesh.devices.size != 0:
        raise ValueError(f"{num_setups} setups not divisible by the "
                         f"{mesh.devices.size}-device mesh")
    if use_scan is None:
        use_scan = jax.default_backend() != "cpu"

    params_stk = stack_setups(params_list)
    opt_stk = jax.vmap(tx.init)(params_stk)
    scenes = jnp.asarray(scenes)
    masks = jnp.asarray(masks)
    inputs = jnp.asarray(inputs)
    targets = jnp.asarray(targets)
    if scenes.ndim == 4:                       # [S, H, W, 3] → [S, 1, ...]
        scenes = scenes[:, None]

    if mesh is not None:
        sh = setup_sharding(mesh, axis)
        put = lambda t: jax.tree.map(lambda x: jax.device_put(x, sh), t)
        params_stk, opt_stk = put(params_stk), put(opt_stk)
        scenes, masks = put(scenes), put(masks)
        inputs, targets = put(inputs), put(targets)

    # 0-based iteration numbering, matching train_model_scan's
    # ``jnp.arange(it, it + n)`` (the curriculum compares ``itr > 400``
    # against the same values in both loops)
    idx_all = jnp.asarray(batch_idx)
    iters_all = jnp.arange(idx_all.shape[0], dtype=jnp.int32)

    if use_scan:
        run = _compiled_multi_setup_programs(
            model_apply, tx, loss_option, curriculum_iter, variant,
            mesh, axis, True)
        # Execute the scan in production-sized segments (one dispatch ≈
        # ``segment`` iters), exactly like ``train_model_scan``'s
        # valid_rate segments: a single 2000-iter dispatch runs >100 s
        # on-device, which networked TPU backends can kill as a hung
        # worker (observed: axon "TPU worker process crashed" mid-wave).
        # Same trajectory — the segments thread (params, opt) through.
        n = int(idx_all.shape[0])
        seg = n if segment is None else max(1, min(int(segment), n))
        loss_parts, l2_parts = [], []
        for lo in range(0, n, seg):
            hi = min(lo + seg, n)
            params_stk, opt_stk, loss, l2 = run(
                params_stk, opt_stk, inputs, targets, scenes, masks,
                idx_all[lo:hi], iters_all[lo:hi])
            loss_parts.append(loss)
            l2_parts.append(l2)
        losses = (loss_parts[0] if len(loss_parts) == 1
                  else jnp.concatenate(loss_parts))
        l2s = (l2_parts[0] if len(l2_parts) == 1
               else jnp.concatenate(l2_parts))
    else:
        step1 = _compiled_multi_setup_programs(
            model_apply, tx, loss_option, curriculum_iter, variant,
            mesh, axis, False)
        losses, l2s = [], []
        for i in range(idx_all.shape[0]):
            params_stk, opt_stk, loss, l2 = step1(
                params_stk, opt_stk, inputs, targets, scenes, masks,
                idx_all[i], iters_all[i])
            losses.append(loss)
            l2s.append(l2)
        losses = jnp.stack(losses)
        l2s = jnp.stack(l2s)

    return (unstack_setups(params_stk, num_setups),
            np.asarray(losses), np.asarray(l2s))


def pretrain_pcnets_multi_setup(cfg_default, mesh="auto",
                                chunk: Optional[int] = None):
    """Fill the PCNet checkpoint cache for every setup in
    ``cfg_default.setup_list``, training up to ``chunk`` setups per SPMD
    program instead of the reference's strictly sequential loop
    (``reproduce_paper_results.py:63-65`` → ``train_network.py:476-594``).

    Checkpoints are saved under the EXACT config-string keys
    ``train_eval_pcnet`` uses (``log.opt_to_string``), so the normal
    per-setup pipeline afterwards loads them (run it with
    ``load_pretrained=True``) and still produces its validation tables,
    inferred-image dumps, and log rows.

    cfg_default: the ``get_model_train_cfg(["PCNet"], ...)`` non-single
    form. Only the benchmark's single-element model/loss/num_train lists
    are supported — ablation grids keep the sequential path.
    Setups are grouped by tensor shape; a group chunk that is not
    divisible by the mesh size falls back to single-device vmap.

    mesh="auto" (default) builds a 1-D setup mesh over all visible
    devices when there is more than one; chunk=None picks the mesh size
    (one setup per device — each device then runs the UN-vmapped
    production step via ``step_any``'s squeeze path) or 1 on a single
    device. Measured single-chip (tools/multi_setup_bench.py,
    RTT-amortized 200-iter segments): stacking S>1 setups on ONE chip is
    ~8-13% SLOWER per setup than sequential production training (vmap's
    grouped-conv lowering; 59.0 vs 52-54.8 ms/iter) — the win is
    strictly multi-device, where the shard_map path scales the whole
    phase by n_devices with zero collectives.

    Returns a list of dicts: setup, status (trained|cached), PSNR/RMSE/SSIM
    of the final validation (for trained setups).
    """
    return _pretrain_multi_setup(cfg_default, mesh, chunk, "PCNet")


def train_compennet_pp_multi_setup(model_apply: Callable, params_list, tx,
                                   scenes, inputs, targets,
                                   batch_idx: np.ndarray,
                                   mesh: Optional[Mesh] = None,
                                   axis: str = "setup",
                                   loss_option: str = "l1+ssim",
                                   use_scan: Optional[bool] = None):
    """CompenNet++ flavor of :func:`train_pcnet_multi_setup`:
    ``apply(vars, cam, scene)`` (no mask), no SSIM curriculum, inputs =
    camera captures / targets = projector ground truth (the compensation
    direction, ref ``train_network.py:597-733``)."""
    masks = np.zeros((len(params_list), 1, 1, 1), np.float32)  # placeholder
    return train_pcnet_multi_setup(
        model_apply, params_list, tx, scenes, masks, inputs, targets,
        batch_idx, mesh=mesh, axis=axis, loss_option=loss_option,
        use_scan=use_scan, variant="compennet_pp")


def pretrain_compennets_pp_multi_setup(cfg_default, mesh="auto",
                                       chunk: Optional[int] = None):
    """CompenNet++ twin of :func:`pretrain_pcnets_multi_setup`: fill the
    CompenNet++ checkpoint cache several setups per SPMD program, under
    ``train_eval_compennet_pp``'s exact config-string keys (ref sequential
    loop ``train_network.py:597-733``). The shared CompenNet init
    pretraining (``init_compennet``) runs/loads ONCE up front, exactly as
    the sequential pipeline does."""
    return _pretrain_multi_setup(cfg_default, mesh, chunk, "CompenNet++")


def _pretrain_multi_setup(cfg_default, mesh, chunk, model_name: str):
    """Shared scaffold of the two cache fillers. The four per-model
    divergences (optimizer factory, per-setup init, train direction,
    eval direction) branch on ``model_name``; everything else — skip
    already-cached setups, group by tensor shape, chunk to the mesh,
    save under the pipeline's config-string key, final validation — is
    identical."""
    from spaa_tpu.parallel.mesh import make_mesh
    from spaa_tpu.train.data import as_uint8_wire, load_data
    from spaa_tpu.train.train import (make_compennet_pp_optimizer,
                                      make_evaluator, make_pcnet_optimizer,
                                      sample_batch_indices)
    from spaa_tpu.utils import log as L
    from spaa_tpu.utils.seed import reset_rng_seeds

    is_pcnet = model_name == "PCNet"

    if isinstance(mesh, str):
        assert mesh == "auto", f"unrecognized mesh={mesh!r}"
        n_dev = len(jax.devices())
        mesh = make_mesh(n_dev, axis="setup") if n_dev > 1 else None
    if chunk is None:
        chunk = mesh.devices.size if mesh is not None else 1
    assert chunk >= 1

    for k, n in [("model_list", 1), ("num_train_list", 1), ("loss_list", 1)]:
        assert len(cfg_default[k]) == n, \
            f"multi-setup pretraining supports only single-element {k}"
    assert cfg_default.model_list[0] == model_name, \
        f"only the full {model_name} architecture is setup-batchable here"

    data_root = cfg_default.data_root
    ckpt_dir = join(data_root, "../checkpoint")
    if not is_pcnet:
        from spaa_tpu.train.pipeline import init_compennet
        _, compen_params = init_compennet(data_root, cfg_default)

    rows, jobs = [], []
    for setup_name in cfg_default.setup_list:
        data = load_data(data_root, setup_name)
        num_train = min(int(cfg_default.num_train_list[0]),
                        int(data["prj_train"].shape[0]))
        cfg = cfg_default.copy()
        cfg.num_train = num_train
        cfg.batch_size = min(int(cfg.batch_size), num_train)
        for key in ["num_train_list", "model_list", "loss_list",
                    "setup_list"]:
            if key in cfg:
                del cfg[key]
        cfg.model_name = model_name
        cfg.loss = cfg_default.loss_list[0]
        cfg.setup_name = setup_name.replace("/", "_")
        title = L.opt_to_string(cfg)
        if os.path.exists(L.checkpoint_path(ckpt_dir, title)):
            rows.append(dict(setup=setup_name, status="cached"))
            continue
        jobs.append(dict(setup=setup_name, data=data, cfg=cfg, title=title,
                         key=(data["cam_train"].shape[1:3],
                              data["prj_train"].shape[1:3],
                              num_train, int(cfg.batch_size))))

    groups: dict = {}
    for j in jobs:
        groups.setdefault(j["key"], []).append(j)

    for group in groups.values():
        cfg = group[0]["cfg"]
        tx = (make_pcnet_optimizer(cfg) if is_pcnet
              else make_compennet_pp_optimizer(cfg))
        for lo in range(0, len(group), chunk):
            ch = group[lo:lo + chunk]
            ch_mesh = mesh
            if mesh is not None and len(ch) % mesh.devices.size != 0:
                ch_mesh = None   # remainder chunk: single-device vmap
            model, params_list, idx = None, [], None
            for j in ch:
                cam_hw, prj_hw = j["key"][0], j["key"][1]
                if is_pcnet:
                    # per-setup determinism identical to train_eval_pcnet:
                    # reseed 123, build (affine from this setup's mask
                    # bbox), then draw the shared minibatch plan
                    from spaa_tpu.train.pipeline import _build_pcnet
                    key = reset_rng_seeds(123)
                    model, p = _build_pcnet("PCNet", cam_hw,
                                            j["data"]["mask_corners"], key)
                else:
                    # identical to train_eval_compennet_pp: reseed 0,
                    # init, INVERSE affine from this setup's mask bbox
                    # (documented fix of the reference's copied
                    # forward-affine init), splice the shared pretrained
                    # CompenNet
                    from spaa_tpu.models import CompenNetPlusplus
                    from spaa_tpu.train.pipeline import _set_affine
                    from spaa_tpu.utils.jaxtools import host_init
                    reset_rng_seeds(0)
                    model = CompenNetPlusplus(out_size=tuple(prj_hw))
                    cam_hw3 = (1, *cam_hw, 3)
                    p = host_init(lambda: model.init(
                        jax.random.PRNGKey(0), jnp.zeros(cam_hw3),
                        jnp.zeros(cam_hw3))["params"])
                    p = _set_affine(p, j["data"]["mask_corners"],
                                    inverse=True)
                    p["compen_net"] = compen_params
                params_list.append(p)
                idx = sample_batch_indices(cfg.num_train, cfg.batch_size,
                                           cfg.max_iters)
            print(f"----- multi-setup training {len(ch)} {model_name}: "
                  f"{[j['setup'] for j in ch]} -----")
            scenes = np.stack([j["data"]["cam_scene"] for j in ch])
            prj = np.stack([as_uint8_wire(
                j["data"]["prj_train"][:cfg.num_train]) for j in ch])
            cam = np.stack([as_uint8_wire(
                j["data"]["cam_train"][:cfg.num_train]) for j in ch])
            if is_pcnet:
                out_params, losses, _ = train_pcnet_multi_setup(
                    model.apply, params_list, tx, scenes,
                    np.stack([j["data"]["mask"] for j in ch]),
                    prj, cam, idx, mesh=ch_mesh, curriculum_iter=400,
                    loss_option=cfg.loss)
            else:                          # compensation direction
                out_params, losses, _ = train_compennet_pp_multi_setup(
                    model.apply, params_list, tx, scenes, cam, prj, idx,
                    mesh=ch_mesh, loss_option=cfg.loss)
            if not np.isfinite(losses[-1]).all():
                raise FloatingPointError(
                    f"non-finite training loss in multi-setup chunk "
                    f"{[j['setup'] for j in ch]}")
            for s, j in enumerate(ch):
                L.save_checkpoint(ckpt_dir, out_params[s], j["title"])
                d = j["data"]
                if is_pcnet:
                    msk = jnp.asarray(d["mask"])

                    def apply_fn(p, x, scene, _m=msk, _model=model):
                        return _model.apply({"params": p}, x, scene, _m)
                    v_in, v_gt = d["prj_valid"], d["cam_valid"]
                else:
                    def apply_fn(p, x, scene, _model=model):
                        return _model.apply({"params": p}, x, scene)
                    v_in, v_gt = d["cam_valid"], d["prj_valid"]
                evaluator = make_evaluator(apply_fn, as_uint8_wire(v_in),
                                           as_uint8_wire(v_gt),
                                           d["cam_scene"])
                psnr, rmse, ssim = (float(v) for v in
                                    evaluator(out_params[s])[:3])
                print(f"{j['setup']}: valid PSNR {psnr:.2f} "
                      f"RMSE {rmse:.4f} SSIM {ssim:.4f}")
                rows.append(dict(setup=j["setup"], status="trained",
                                 PSNR=psnr, RMSE=rmse, SSIM=ssim))
    return rows


def spaa_attack_multi_setup(pcnet_apply: Callable, logits_fn: Callable,
                            pcnet_states, clf_params, cam_scenes,
                            prj_inits, target_idx, targeted, weights,
                            d_thr, mesh: Mesh, axis: str = "setup",
                            cfg=None):
    """S setups' SPAA sweeps as ONE shard_map program, one setup per
    device (the attack-phase twin of :func:`train_pcnet_multi_setup`;
    the reference — and our orchestrator — run setups sequentially,
    ``projector_based_attack.py:24-209``).

    Each device runs the UNMODIFIED production
    :func:`spaa_tpu.attack.spaa.spaa_attack_batched` on its local setup
    (frozen per-setup PCNet state + shared classifier), so per-device
    math, compile shape, and speed are identical to the single-setup
    program; the phase wall-clock divides by n_devices with zero
    collectives.

    pcnet_states: list of S frozen PCNet state pytrees (params/scene/
                  mask/caches — whatever ``pcnet_apply`` consumes).
    clf_params:   ONE classifier tree, replicated.
    cam_scenes [S,1,H,W,3], prj_inits [S,B,hp,wp,3], target_idx [S,B],
    targeted [S,B], weights [S,B,3], d_thr [S,B] — per-setup stacks of
    the production per-config arrays.

    Requires len(pcnet_states) == mesh size (chunk callers into waves).
    Returns (cam_infer_best [S,B,...], prj_adv_best [S,B,...]).
    """
    from spaa_tpu.attack.spaa import SpaaConfig, spaa_attack_batched
    if cfg is None:
        cfg = SpaaConfig()
    S = len(pcnet_states)
    if S != mesh.devices.size:
        raise ValueError(f"{S} setups != {mesh.devices.size}-device mesh "
                         "(chunk into waves of mesh-size setups)")

    states_stk = stack_setups(pcnet_states)
    sq = partial(jax.tree.map, lambda x: x[0])

    def body(st, clf, scenes, prjs, tgt, tgd, w, dt):
        cam, prj = spaa_attack_batched(
            pcnet_apply, logits_fn, sq(st), clf, scenes[0], prjs[0],
            tgt[0], tgd[0], w[0], dt[0], cfg=cfg)
        return cam[None], prj[None]

    sp = P(axis)
    # check_vma=False: the attack body takes an explicit jax.vjp whose
    # cotangents mix device-varying primals with replicated constants —
    # sound here (the body touches only its own shard; no collectives),
    # but the varying-axes checker can't prove it
    run = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(sp, P(), sp, sp, sp, sp, sp, sp),
        out_specs=(sp, sp), check_vma=False))
    sh = NamedSharding(mesh, sp)
    put = lambda t: jax.tree.map(lambda x: jax.device_put(jnp.asarray(x),
                                                          sh), t)
    return run(put(states_stk), clf_params, put(cam_scenes),
               put(prj_inits), put(target_idx), put(targeted),
               put(weights), put(d_thr))


def percal_attack_multi_setup(compen_apply: Callable, logits_fn: Callable,
                              compen_params_list, clf_params, cam_scenes,
                              target_idx, targeted, d_thr, mesh: Mesh,
                              axis: str = "setup", cfg=None):
    """S setups' PerC-AL+CompenNet++ attacks as ONE shard_map program,
    one setup per device — the PerC-AL twin of
    :func:`spaa_attack_multi_setup` (sequential reference:
    ``projector_based_attack.py:342-359`` per setup).

    Each device runs the UNMODIFIED production loop
    (:func:`spaa_tpu.attack.perc_al.perc_al_core`, projector variant) on
    its scene batch, then compensates the adversarial camera images into
    projector inputs through its setup-local CompenNet++.

    compen_apply(params, cam [B,...], scene [B,...]) -> prj.
    compen_params_list: S CompenNet++ param trees.
    cam_scenes [S,1,H,W,3]; target_idx/targeted/d_thr [S,B].

    Requires len(compen_params_list) == mesh size.
    Returns (cam_infer_best [S,B,...], prj_adv_best [S,B,...]).
    """
    from spaa_tpu.attack.perc_al import PercALConfig, perc_al_core
    if cfg is None:
        cfg = PercALConfig()
    S = len(compen_params_list)
    if S != mesh.devices.size:
        raise ValueError(f"{S} setups != {mesh.devices.size}-device mesh "
                         "(chunk into waves of mesh-size setups)")

    params_stk = stack_setups(compen_params_list)
    sq = partial(jax.tree.map, lambda x: x[0])

    def body(cp, clf, scenes, tgt, tgd, dt):
        b = tgt.shape[1]
        scene_b = jnp.broadcast_to(scenes[0],
                                   (b,) + scenes.shape[2:])
        x_best = perc_al_core(logits_fn, clf, scene_b, tgt[0], tgd[0],
                              cfg, d_thr=dt[0], projector_variant=True)
        prj = compen_apply(sq(cp), x_best, scene_b)
        return x_best[None], prj[None]

    sp = P(axis)
    # check_vma=False for the same reason as spaa_attack_multi_setup
    run = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(sp, P(), sp, sp, sp, sp),
        out_specs=(sp, sp), check_vma=False))
    sh = NamedSharding(mesh, sp)
    put = lambda t: jax.tree.map(lambda x: jax.device_put(jnp.asarray(x),
                                                          sh), t)
    return run(put(params_stk), clf_params, put(cam_scenes),
               put(jnp.asarray(np.asarray(target_idx), jnp.int32)),
               put(targeted), put(d_thr))


def run_spaa_attack_multi_setup(cfg, mesh="auto", weights_dir=None):
    """SPAA benchmark sweeps over ``cfg.setup_list``, mesh-size setups at
    a time — the deployment wrapper around
    :func:`spaa_attack_multi_setup`, producing byte-for-byte the same
    output directory layout as the sequential driver
    (:func:`spaa_tpu.attack.orchestrate.run_projector_based_attack`,
    ref ``projector_based_attack.py:24-148``); equivalence is pinned in
    ``tests/test_parallel.py``.

    Per-setup PCNet training/loading stays sequential here (use
    :func:`pretrain_pcnets_multi_setup` / ``--multi-setup-train`` to fill
    the checkpoint cache in parallel first, then run this with
    ``cfg.load_pretrained=True``). Setups are grouped by tensor-shape key
    and chunked into waves of mesh-size; a remainder wave runs on a
    sub-mesh of its own size (or sequentially when it is a single setup).

    The per-setup PCNet states must form ONE stackable pytree, so the
    wave program uses the XLA grid_sample warp, not the Pallas fixed-grid
    kernel — its per-setup tap tables have data-dependent spill counts
    K (shapes differ across setups; see ``ops/pallas/warp.py``). Padding
    the tables to a common K (exact: spilled taps carry weight 0) is the
    knob to add if single-device profiles ever justify it.
    """
    import itertools

    from spaa_tpu.attack.orchestrate import (build_spaa_sweep_arrays,
                                             make_attack_logits_fn,
                                             make_pcnet_fn,
                                             save_spaa_sweep_outputs,
                                             to_attacker_cfg_str)
    from spaa_tpu.attack.spaa import spaa_attack_auto
    from spaa_tpu.models.classifiers import Classifier, load_imagenet_labels
    from spaa_tpu.ops.image import center_crop, expand_4d
    from spaa_tpu.parallel.mesh import make_mesh
    from spaa_tpu.train.data import load_setup_info
    from spaa_tpu.train.pipeline import train_eval_pcnet
    from spaa_tpu.train.train import get_model_train_cfg
    from spaa_tpu.utils.io import imread
    from spaa_tpu.utils.seed import reset_rng_seeds

    assert cfg.attacker_name == "SPAA", \
        "multi-setup attack waves are implemented for SPAA"
    reset_rng_seeds(0)
    if isinstance(mesh, str):
        assert mesh == "auto", f"unrecognized mesh={mesh!r}"
        n_dev = len(jax.devices())
        mesh = make_mesh(n_dev, axis="setup") if n_dev > 1 else None
    wave_sz = mesh.devices.size if mesh is not None else 1
    compute_dtype = cfg.get(
        "attack_dtype",
        "bfloat16" if jax.default_backend() == "tpu" else "float32")

    # per-setup prep: scene, trained PCNet (cache hit when pretrained),
    # frozen attack state — identical to the sequential driver's
    attacker_cfg_str = to_attacker_cfg_str("SPAA")[0]
    prepped = []
    for setup_name in cfg.setup_list:
        setup_path = join(cfg.data_root, "setups", setup_name)
        setup_info = load_setup_info(setup_path)
        w_cam, h_cam = setup_info["cam_im_sz"]
        cam_scene = np.asarray(center_crop(
            expand_4d(jnp.asarray(imread(join(
                setup_path, "cam/raw/ref/img_0002.png")))), (h_cam, w_cam)))
        model_cfg = get_model_train_cfg(
            ["PCNet"], cfg.data_root, [setup_name],
            load_pretrained=cfg.load_pretrained,
            plot_on=bool(cfg.get("plot_on", False)))
        if "max_iters" in cfg:       # test override
            model_cfg.max_iters = cfg.max_iters
        trained, _, model_cfg = train_eval_pcnet(model_cfg)
        pcnet_apply, pcnet_state = make_pcnet_fn(
            trained, use_pallas_warp=False, compute_dtype=compute_dtype)
        cp_sz = tuple(int(c) for c in setup_info["classifier_crop_sz"])
        prepped.append(dict(
            name=setup_name, path=setup_path, info=setup_info,
            scene=cam_scene, apply=pcnet_apply, state=pcnet_state,
            key=(cam_scene.shape, tuple(setup_info["prj_im_sz"]), cp_sz)))
    cfg.model_cfg = dict(model_cfg)

    imagenet_labels = load_imagenet_labels(
        join(cfg.data_root, "imagenet1000_clsidx_to_labels.txt"))
    target_labels = load_imagenet_labels(
        join(cfg.data_root, "imagenet10_clsidx_to_labels.txt"))
    target_idx = list(itertools.islice(target_labels.keys(), 10))

    groups: dict = {}
    for pr in prepped:
        groups.setdefault(pr["key"], []).append(pr)

    for classifier_name in cfg.classifier_names:
        classifier = Classifier(classifier_name, weights_dir,
                                sort_results=True)
        for key, group in groups.items():
            cp_sz = key[2]
            logits_fn, clf_params = make_attack_logits_fn(
                classifier, cp_sz, compute_dtype)
            for lo in range(0, len(group), wave_sz):
                wave = group[lo:lo + wave_sz]
                per_setup = []
                for pr in wave:
                    _, _, pred_idx = classifier(jnp.asarray(pr["scene"]),
                                                cp_sz)
                    true_idx = int(pred_idx[0, 0])
                    arrays = build_spaa_sweep_arrays(
                        cfg, pr["info"], target_idx, true_idx)
                    per_setup.append(arrays)
                    print(f"  [SPAA multi-setup] {pr['name']} vs "
                          f"{classifier_name}: original class "
                          f"{imagenet_labels[true_idx]}")
                configs, per_cfg = per_setup[0][0], per_setup[0][1]
                spaa_cfg = per_setup[0][7]
                stk = [np.stack([ps[i] for ps in per_setup])
                       for i in range(2, 7)]
                if len(wave) == 1:
                    # remainder-of-one: the plain sequential program
                    cam_b, prj_b = spaa_attack_auto(
                        wave[0]["apply"], logits_fn, wave[0]["state"],
                        clf_params, jnp.asarray(wave[0]["scene"]),
                        jnp.asarray(stk[0][0]), jnp.asarray(stk[1][0]),
                        jnp.asarray(stk[2][0]), jnp.asarray(stk[3][0]),
                        jnp.asarray(stk[4][0]), spaa_cfg)
                    cam_ms, prj_ms = np.asarray(cam_b)[None], \
                        np.asarray(prj_b)[None]
                else:
                    wv_mesh = mesh
                    if len(wave) != wave_sz:   # remainder: sub-mesh
                        wv_mesh = Mesh(mesh.devices.ravel()[:len(wave)],
                                       mesh.axis_names)
                    cam_ms, prj_ms = spaa_attack_multi_setup(
                        wave[0]["apply"], logits_fn,
                        [pr["state"] for pr in wave], clf_params,
                        np.stack([pr["scene"] for pr in wave]),
                        stk[0], stk[1], stk[2], stk[3], stk[4],
                        mesh=wv_mesh, cfg=spaa_cfg)
                    cam_ms, prj_ms = np.asarray(cam_ms), np.asarray(prj_ms)
                for s, pr in enumerate(wave):
                    save_spaa_sweep_outputs(
                        cam_ms[s], prj_ms[s], configs, per_cfg,
                        pr["path"], attacker_cfg_str, classifier_name)
                print(f"  [SPAA multi-setup] wave of {len(wave)} setups × "
                      f"{len(configs)} configs × {per_cfg} attacks done "
                      f"({classifier_name})")
    return cfg


def run_percal_attack_multi_setup(cfg, mesh="auto", weights_dir=None):
    """PerC-AL+CompenNet++ twin of :func:`run_spaa_attack_multi_setup`:
    the benchmark's PerC-AL attacks over ``cfg.setup_list``, mesh-size
    setups per shard_map wave, saved outputs identical to the sequential
    driver's (``attack.orchestrate._run_percal_sweep``). CompenNet++
    training/loading stays sequential (fill the cache with
    :func:`pretrain_compennets_pp_multi_setup` first)."""
    import itertools

    from spaa_tpu.attack.orchestrate import (perc_al_compennet_pp,
                                             to_attacker_cfg_str)
    from spaa_tpu.attack.perc_al import PercALConfig
    from spaa_tpu.models.classifiers import Classifier, load_imagenet_labels
    from spaa_tpu.ops.image import center_crop, expand_4d
    from spaa_tpu.parallel.mesh import make_mesh
    from spaa_tpu.train.data import load_setup_info
    from spaa_tpu.train.pipeline import train_eval_compennet_pp
    from spaa_tpu.train.train import get_model_train_cfg
    from spaa_tpu.utils.io import imread, save_imgs
    from spaa_tpu.utils.seed import reset_rng_seeds

    assert cfg.attacker_name == "PerC-AL+CompenNet++"
    reset_rng_seeds(0)
    if isinstance(mesh, str):
        assert mesh == "auto", f"unrecognized mesh={mesh!r}"
        n_dev = len(jax.devices())
        mesh = make_mesh(n_dev, axis="setup") if n_dev > 1 else None
    wave_sz = mesh.devices.size if mesh is not None else 1

    attacker_cfg_str = to_attacker_cfg_str("PerC-AL+CompenNet++")[0]
    prepped = []
    for setup_name in cfg.setup_list:
        setup_path = join(cfg.data_root, "setups", setup_name)
        setup_info = load_setup_info(setup_path)
        w_cam, h_cam = setup_info["cam_im_sz"]
        cam_scene = np.asarray(center_crop(
            expand_4d(jnp.asarray(imread(join(
                setup_path, "cam/raw/ref/img_0002.png")))), (h_cam, w_cam)))
        model_cfg = get_model_train_cfg(
            ["CompenNet++"], cfg.data_root, [setup_name],
            load_pretrained=cfg.load_pretrained,
            plot_on=bool(cfg.get("plot_on", False)))
        for key in ("max_iters", "init_max_iters"):   # test overrides
            if key in cfg:
                model_cfg[key] = cfg[key]
        trained, _, model_cfg = train_eval_compennet_pp(model_cfg)
        cp_sz = tuple(int(c) for c in setup_info["classifier_crop_sz"])
        prepped.append(dict(
            name=setup_name, path=setup_path, info=setup_info,
            scene=cam_scene, model=trained.model, params=trained.params,
            key=(cam_scene.shape, cp_sz)))
    cfg.model_cfg = dict(model_cfg)

    imagenet_labels = load_imagenet_labels(
        join(cfg.data_root, "imagenet1000_clsidx_to_labels.txt"))
    target_labels = load_imagenet_labels(
        join(cfg.data_root, "imagenet10_clsidx_to_labels.txt"))
    target_idx = list(itertools.islice(target_labels.keys(), 10))
    n = len(target_idx)
    b = n + 1
    attack_iters = int(cfg.get("attack_iters", 50))
    pcfg = PercALConfig(max_iterations=attack_iters, alpha_l_init=1.0,
                        alpha_c_init=0.5, confidence=40)

    groups: dict = {}
    for pr in prepped:
        groups.setdefault(pr["key"], []).append(pr)

    for classifier_name in cfg.classifier_names:
        classifier = Classifier(classifier_name, weights_dir,
                                sort_results=True)
        for key, group in groups.items():
            cp_sz = key[1]

            def logits_fn(params, im, _clf=classifier, _cp=cp_sz):
                return _clf._logits_fn(params, im, _cp)

            for lo in range(0, len(group), wave_sz):
                wave = group[lo:lo + wave_sz]
                model = wave[0]["model"]

                def compen_apply(p, cam, scene, _m=model):
                    return _m.apply({"params": p}, cam, scene)

                tgt = np.zeros((len(wave), b), np.int32)
                for s, pr in enumerate(wave):
                    _, _, pred_idx = classifier(jnp.asarray(pr["scene"]),
                                                cp_sz)
                    tgt[s, :n] = target_idx
                    tgt[s, n] = int(pred_idx[0, 0])
                targeted = np.tile(np.asarray([True] * n + [False]),
                                   (len(wave), 1))
                for stealth_loss in cfg.stealth_losses:
                    for d_thr in cfg.d_threshes:
                        folder = join(attacker_cfg_str, stealth_loss,
                                      str(d_thr), classifier_name)
                        if len(wave) == 1:
                            pr = wave[0]
                            cam_ms, prj_ms = perc_al_compennet_pp(
                                partial(jax.jit(compen_apply),
                                        pr["params"]),
                                classifier, imagenet_labels,
                                list(tgt[0]), targeted[0],
                                jnp.asarray(pr["scene"]), d_thr,
                                pr["info"],
                                max_iterations=attack_iters)
                            cam_ms = np.asarray(cam_ms)[None]
                            prj_ms = np.asarray(prj_ms)[None]
                        else:
                            wv_mesh = mesh
                            if len(wave) != wave_sz:
                                wv_mesh = Mesh(
                                    mesh.devices.ravel()[:len(wave)],
                                    mesh.axis_names)
                            cam_ms, prj_ms = percal_attack_multi_setup(
                                compen_apply, logits_fn,
                                [pr["params"] for pr in wave],
                                classifier.params,
                                np.stack([pr["scene"] for pr in wave]),
                                tgt, targeted,
                                np.full((len(wave), b), float(d_thr),
                                        np.float32),
                                mesh=wv_mesh, cfg=pcfg)
                            cam_ms = np.asarray(cam_ms)
                            prj_ms = np.asarray(prj_ms)
                        for s, pr in enumerate(wave):
                            save_imgs(cam_ms[s], join(pr["path"],
                                                      "cam/infer/adv",
                                                      folder))
                            save_imgs(prj_ms[s], join(pr["path"],
                                                      "prj/adv", folder))
                print(f"  [PerC-AL multi-setup] wave of {len(wave)} setups "
                      f"done ({classifier_name})")
    return cfg
