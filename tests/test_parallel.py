"""Multi-chip (virtual 8-device CPU mesh) paths: data-parallel training
step and the sharded batched attack must match their single-device runs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from spaa_tpu.parallel import (batch_sharding, make_mesh, replicate,
                               replicated, shard_attack_inputs, shard_batch)


def test_mesh_has_8_virtual_devices():
    assert len(jax.devices()) >= 8


def test_sharded_attack_matches_single_device():
    from spaa_tpu.attack.spaa import SpaaConfig, spaa_attack_batched

    B, HP, H, W, NCLS = 8, 16, 12, 16, 7
    rng = np.random.default_rng(0)
    k_pc = jnp.asarray(rng.normal(0, 0.3, (3, 3)).astype(np.float32))
    k_cl = jnp.asarray(rng.normal(0, 0.1, (H * W * 3, NCLS)).astype(np.float32))

    def pcnet_apply(state, prj):
        x = jax.image.resize(prj, (prj.shape[0], H, W, 3), "linear")
        return jnp.clip(x @ state["k"] * 0.5 + 0.4, 0.0, 1.0)

    def logits_fn(params, cam):
        return cam.reshape(cam.shape[0], -1) @ params

    cam_scene = jnp.asarray(rng.random((1, H, W, 3)).astype(np.float32))
    prj0 = jnp.asarray(rng.random((B, HP, HP, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.integers(0, NCLS, B).astype(np.int32))
    targeted = jnp.asarray([True] * 4 + [False] * 4)
    weights = jnp.tile(jnp.asarray([0.0, 1.0, 1.0]), (B, 1))
    d_thr = jnp.full((B,), 2.0)
    cfg = SpaaConfig(iters=3)

    run = jax.jit(lambda *a: spaa_attack_batched(
        pcnet_apply, logits_fn, *a, cfg=cfg))

    # single device
    cam_ref, prj_ref = run({"k": k_pc}, k_cl, cam_scene, prj0, tgt,
                           targeted, weights, d_thr)

    # 8-way batch-sharded
    mesh = make_mesh(8)
    args = shard_attack_inputs(mesh, {"k": k_pc}, k_cl, cam_scene, prj0,
                               tgt, targeted, weights, d_thr)
    with mesh:
        cam_sh, prj_sh = run(*args)

    np.testing.assert_allclose(np.asarray(cam_ref), np.asarray(cam_sh),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(prj_ref), np.asarray(prj_sh),
                               rtol=1e-5, atol=1e-6)


def test_data_parallel_train_step_matches_single_device():
    """Replicated-params DP training step == single-device step (the
    gradient all-reduce is XLA's, not ours — this guards the sharding
    annotations)."""
    import optax

    from spaa_tpu.models import PCNet
    from spaa_tpu.train import compute_loss, make_pcnet_optimizer
    from spaa_tpu.utils.config import DictConfig

    B, cam_hw, prj_hw = 8, (16, 24), (16, 16)
    rng = np.random.default_rng(0)
    model = PCNet(out_size=cam_hw)
    prj = jnp.asarray(rng.random((B, *prj_hw, 3)).astype(np.float32))
    scene = jnp.asarray(rng.random((B, *cam_hw, 3)).astype(np.float32))
    cam_gt = scene * 0.6 + 0.2
    mask = jnp.ones((*cam_hw, 1))
    params = model.init(jax.random.PRNGKey(0), prj[:1], scene[:1],
                        mask)["params"]
    cfg = DictConfig(dict(lr_drop_ratio=0.2, l2_reg=1e-4))
    tx = make_pcnet_optimizer(cfg)
    opt_state = tx.init(params)

    def loss_fn(p, b):
        infer = model.apply({"params": p}, b["prj"], b["scene"], mask)
        return compute_loss(infer, b["cam"], "l1")[0]

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), loss

    batch = dict(prj=prj, scene=scene, cam=cam_gt)
    p_ref, loss_ref = step(params, opt_state, batch)

    mesh = make_mesh(8)
    params_r = replicate(params, mesh)
    opt_r = jax.tree.map(
        lambda x: jax.device_put(x, replicated(mesh))
        if hasattr(x, "shape") else x, opt_state)
    batch_sh = shard_batch(batch, mesh)
    with mesh:
        p_sh, loss_sh = step(params_r, opt_r, batch_sh)

    np.testing.assert_allclose(float(loss_ref), float(loss_sh), rtol=1e-5)
    # gradient all-reduce order differs across shardings -> small f32 drift
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_sharded_attack_real_resnet18_matches_single_device():
    """Sharded==single-device on a REAL zoo network (VERDICT r3 #3): the
    linear-toy test above can't catch sharding bugs in BN eval stats,
    max-pool, or the strided stem. ResNet18 with deterministic random
    params in the converted layout; 32x32 input (the global-pool head
    tolerates small sizes — exactly how the reference wraps classifiers in
    DataParallel, ref ``classifier.py:38-39``)."""
    from spaa_tpu.attack.spaa import SpaaConfig, spaa_attack_batched
    from spaa_tpu.models.classifiers import init_params, normalize_imagenet
    from spaa_tpu.models.classifiers.resnet import ResNet18
    from spaa_tpu.ops.image import center_crop, resize_area

    B, HP, H, W = 8, 16, 24, 32
    rng = np.random.default_rng(1)
    k_pc = jnp.asarray(rng.normal(0, 0.3, (3, 3)).astype(np.float32))
    clf_params = init_params("resnet18", seed=0)
    net = ResNet18()

    def pcnet_apply(state, prj):
        x = jax.image.resize(prj, (prj.shape[0], H, W, 3), "linear")
        return jnp.clip(x @ state["k"] * 0.5 + 0.4, 0.0, 1.0)

    def logits_fn(params, cam):
        x = resize_area(center_crop(cam, (24, 24)), (32, 32))
        return net.apply({"params": params}, normalize_imagenet(x))

    cam_scene = jnp.asarray(rng.random((1, H, W, 3)).astype(np.float32))
    prj0 = jnp.asarray(rng.random((B, HP, HP, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.integers(0, 1000, B).astype(np.int32))
    targeted = jnp.asarray([True] * 4 + [False] * 4)
    weights = jnp.tile(jnp.asarray([0.0, 1.0, 1.0]), (B, 1))
    d_thr = jnp.full((B,), 2.0)
    cfg = SpaaConfig(iters=2)

    run = jax.jit(lambda *a: spaa_attack_batched(
        pcnet_apply, logits_fn, *a, cfg=cfg))
    cam_ref, prj_ref = run({"k": k_pc}, clf_params, cam_scene, prj0, tgt,
                           targeted, weights, d_thr)

    mesh = make_mesh(8)
    args = shard_attack_inputs(mesh, {"k": k_pc}, clf_params, cam_scene,
                               prj0, tgt, targeted, weights, d_thr)
    with mesh:
        cam_sh, prj_sh = run(*args)

    np.testing.assert_allclose(np.asarray(cam_ref), np.asarray(cam_sh),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(prj_ref), np.asarray(prj_sh),
                               rtol=1e-5, atol=1e-6)


def test_multi_setup_train_matches_sequential_and_shards():
    """Setup-parallel training (parallel/multi_setup.py): S independent
    PCNets in one SPMD program must reproduce S sequential
    train_model_scan runs, and the setup-axis sharded run must match the
    single-device run. This is the scale-out path for the reference's
    13-setup benchmark training phase (reproduce_paper_results.py:63-65
    loops setups sequentially)."""
    import optax

    from spaa_tpu.models import PCNet
    from spaa_tpu.parallel import train_pcnet_multi_setup
    from spaa_tpu.train import compute_loss, make_pcnet_optimizer
    from spaa_tpu.train.train import sample_batch_indices, train_model_scan
    from spaa_tpu.utils.config import DictConfig

    S, N, B, iters, curr = 2, 8, 4, 6, 2
    cam_hw, prj_hw = (16, 24), (12, 12)
    model = PCNet(out_size=cam_hw)
    rng = np.random.default_rng(2)

    scenes, masks, params_list, prj_tr, cam_tr = [], [], [], [], []
    for s in range(S):
        scene = rng.random((1, *cam_hw, 3)).astype(np.float32)
        mask = (rng.random((*cam_hw, 1)) > 0.2).astype(np.float32)
        prj = rng.random((N, *prj_hw, 3)).astype(np.float32)
        cam = rng.random((N, *cam_hw, 3)).astype(np.float32)
        p = model.init(jax.random.PRNGKey(s), jnp.asarray(prj[:1]),
                       jnp.asarray(scene), jnp.asarray(mask))["params"]
        scenes.append(scene); masks.append(mask); params_list.append(p)
        prj_tr.append(prj); cam_tr.append(cam)

    cfg = DictConfig(dict(lr_drop_ratio=0.2, l2_reg=1e-4,
                          max_iters=iters, valid_rate=iters))
    tx = make_pcnet_optimizer(cfg)
    import random as _random
    idx = sample_batch_indices(N, B, iters, seed_state=_random.Random(7))

    # S sequential reference trainings, pipeline-style loss closures
    def make_loss(scene, mask):
        scene_j, mask_j = jnp.asarray(scene), jnp.asarray(mask)

        def loss_fn(p, prj, cam_gt, itr):
            infer = model.apply({"params": p}, prj, scene_j, mask_j)
            w = (itr > curr).astype(jnp.float32)
            return compute_loss(infer, cam_gt, "l1+ssim", ssim_weight=w)
        return loss_fn

    from spaa_tpu.train.train import _compiled_train_programs

    # --- Part A: ONE-STEP equivalence vs the production step, TIGHT.
    # Adam cannot be used for a tight param comparison at ANY horizon:
    # its very first update is ~lr*sign(g), so a last-ulp difference in a
    # near-zero gradient element flips the whole +-lr step (measured: six
    # lr=1e-2 iters drift outputs by 0.045). SGD is linear in the
    # gradient, so ulp noise stays ulp — one SGD step pins down the step
    # math (minibatch gather, curriculum weight, loss, vmap plumbing)
    # against the production program to 1e-5. Both curriculum branches.
    sgd = optax.sgd(0.1)
    for curr_a, tag in [(curr, "l1-only"), (-1, "l1+ssim")]:
        out1, loss1, _ = train_pcnet_multi_setup(
            model.apply, params_list, sgd, np.stack(scenes),
            np.stack(masks), np.stack(prj_tr), np.stack(cam_tr), idx[:1],
            curriculum_iter=curr_a)
        for s in range(S):
            def loss_fn(p, prj, cam_gt, itr, _s=s, _c=curr_a):
                infer = model.apply({"params": p}, prj,
                                    jnp.asarray(scenes[_s]),
                                    jnp.asarray(masks[_s]))
                w = (itr > _c).astype(jnp.float32)
                return compute_loss(infer, cam_gt, "l1+ssim",
                                    ssim_weight=w)
            _, run_step = _compiled_train_programs(loss_fn, sgd)
            p1, _, l1, _ = run_step(params_list[s], sgd.init(params_list[s]),
                                    jnp.asarray(prj_tr[s]),
                                    jnp.asarray(cam_tr[s]),
                                    jnp.asarray(idx[0]),
                                    jnp.asarray(0, jnp.int32))
            np.testing.assert_allclose(loss1[0, s], float(l1), rtol=1e-5,
                                       err_msg=f"{tag} setup {s} loss")
            for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(out1[s])):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
                    err_msg=f"{tag} setup {s} one-step params")

    # --- Part B: full production optimizer (3-group Adam multi-transform)
    # over the uint8 wire path; loss trajectories vs sequential production
    # runs, LOOSE (Adam amplifies vmapped-vs-single conv ulp noise).
    prj_u8 = [np.round(p * 255).astype(np.uint8) for p in prj_tr]
    cam_u8 = [np.round(c * 255).astype(np.uint8) for c in cam_tr]
    ref_losses = []
    for s in range(S):
        _, run_step = _compiled_train_programs(make_loss(scenes[s],
                                                         masks[s]), tx)
        p, o = params_list[s], tx.init(params_list[s])
        inp, tgt = jnp.asarray(prj_u8[s]), jnp.asarray(cam_u8[s])
        ls = []
        for i in range(iters):
            p, o, loss, _ = run_step(p, o, inp, tgt, jnp.asarray(idx[i]),
                                     jnp.asarray(i, jnp.int32))
            ls.append(float(loss))
        ref_losses.append(ls)

    _, losses, l2s = train_pcnet_multi_setup(
        model.apply, params_list, tx, np.stack(scenes), np.stack(masks),
        np.stack(prj_u8), np.stack(cam_u8), idx, curriculum_iter=curr)
    assert losses.shape == (iters, S) and np.isfinite(losses).all()
    for s in range(S):
        np.testing.assert_allclose(losses[:, s], ref_losses[s],
                                   rtol=1e-3, atol=1e-6,
                                   err_msg=f"setup {s} loss trajectory")

    # --- Part C: sharded over a 2-device 'setup' mesh == single device
    # (scan path, the TPU execution shape). shard_map re-traces on LOCAL
    # shapes (the vmap-grouped scene convs become fgc=1 per device), so
    # reduction orders legitimately differ at the ulp level between the
    # sharded and single-device programs; SGD keeps that linear (tight),
    # Adam would amplify it to O(lr) on sign-flip elements (loose).
    mesh = make_mesh(2, axis="setup")
    base = train_pcnet_multi_setup(
        model.apply, params_list, sgd, np.stack(scenes), np.stack(masks),
        np.stack(prj_tr), np.stack(cam_tr), idx, curriculum_iter=curr,
        use_scan=True)
    with mesh:
        shard = train_pcnet_multi_setup(
            model.apply, params_list, sgd, np.stack(scenes),
            np.stack(masks), np.stack(prj_tr), np.stack(cam_tr), idx,
            mesh=mesh, curriculum_iter=curr, use_scan=True)
        shard_adam = train_pcnet_multi_setup(
            model.apply, params_list, tx, np.stack(scenes),
            np.stack(masks), np.stack(prj_u8), np.stack(cam_u8), idx,
            mesh=mesh, curriculum_iter=curr, use_scan=True)
    np.testing.assert_allclose(base[1], shard[1], rtol=1e-5, atol=1e-6)
    for s in range(S):
        for a, b in zip(jax.tree.leaves(base[0][s]),
                        jax.tree.leaves(shard[0][s])):
            # atol: 6 SGD steps x lr 0.1 x ~1e-7/step conv retrace noise
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
    # the production-optimizer sharded run reproduces the trajectories too
    np.testing.assert_allclose(shard_adam[1], losses, rtol=1e-3,
                               atol=1e-6)

    # indivisible setup count is rejected
    with pytest.raises(ValueError):
        train_pcnet_multi_setup(
            model.apply, params_list + params_list[:1], tx,
            np.stack(scenes + scenes[:1]), np.stack(masks + masks[:1]),
            np.stack(prj_tr + prj_tr[:1]), np.stack(cam_tr + cam_tr[:1]),
            idx, mesh=mesh, curriculum_iter=curr)


def test_pretrain_multi_setup_fills_checkpoint_cache(tmp_path):
    """pretrain_pcnets_multi_setup must save checkpoints under the EXACT
    config-string keys train_eval_pcnet uses, so the per-setup pipeline
    then loads instead of retraining (the --multi-setup-train flow in
    reproduce_paper_results.py)."""
    import glob
    import os

    from spaa_tpu.parallel import pretrain_pcnets_multi_setup
    from spaa_tpu.train.pipeline import train_eval_pcnet
    from spaa_tpu.train.train import get_model_train_cfg
    from spaa_tpu.utils.sim_procams import DEFAULT_SIM_SETUP_INFO, SimProCams

    root = str(tmp_path / "data")
    names = ["vpt1", "vpt2"]
    for n in names:
        info = dict(DEFAULT_SIM_SETUP_INFO)
        info.update(prj_im_sz=[64, 64], cam_im_sz=[64, 48],
                    classifier_crop_sz=[48, 48])
        SimProCams(info).make_setup(root, n, num_train=12, num_test=2)

    def make_cfg(**kw):
        mc = get_model_train_cfg(None, root, names, **kw)
        mc.model_list = ["PCNet"]
        mc.max_iters = 6
        mc.valid_rate = 6
        return mc

    rows = pretrain_pcnets_multi_setup(make_cfg(), chunk=2)
    assert [r["status"] for r in rows] == ["trained", "trained"]
    assert all(np.isfinite(r["PSNR"]) for r in rows)
    ckpts = glob.glob(os.path.join(root, "../checkpoint", "*.flax"))
    assert len(ckpts) == 2

    # idempotent: everything cached on the second pass
    rows2 = pretrain_pcnets_multi_setup(make_cfg(), chunk=2)
    assert [r["status"] for r in rows2] == ["cached", "cached"]

    # key contract: the per-setup pipeline finds and LOADS the checkpoints
    # (no retraining) and produces its usual per-setup log rows
    mtimes = {c: os.path.getmtime(c) for c in ckpts}
    _, ret, _ = train_eval_pcnet(make_cfg(load_pretrained=True))
    for c, m in mtimes.items():
        assert os.path.getmtime(c) == m, "pipeline retrained instead of loading"
    psnr_rows = ret[ret["Setup"].isin(names)]
    assert len(psnr_rows) == 2 and np.isfinite(
        psnr_rows["PSNR"].to_numpy(float)).all()


def test_pretrain_compennet_pp_multi_setup_fills_checkpoint_cache(tmp_path):
    """CompenNet++ twin of the PCNet contract test: shared CompenNet init
    runs once, per-setup checkpoints land under train_eval_compennet_pp's
    exact keys, and the pipeline then loads instead of retraining."""
    import glob
    import os

    from spaa_tpu.parallel import pretrain_compennets_pp_multi_setup
    from spaa_tpu.train.pipeline import train_eval_compennet_pp
    from spaa_tpu.train.train import get_model_train_cfg
    from spaa_tpu.utils.sim_procams import DEFAULT_SIM_SETUP_INFO, SimProCams

    root = str(tmp_path / "data")
    names = ["vcp1", "vcp2"]
    for n in names:
        info = dict(DEFAULT_SIM_SETUP_INFO)
        info.update(prj_im_sz=[64, 64], cam_im_sz=[64, 48],
                    classifier_crop_sz=[48, 48])
        SimProCams(info).make_setup(root, n, num_train=12, num_test=2)

    def make_cfg(**kw):
        mc = get_model_train_cfg(None, root, names, **kw)
        mc.model_list = ["CompenNet++"]
        mc.max_iters = 6
        mc.valid_rate = 6
        mc.init_max_iters = 4
        return mc

    rows = pretrain_compennets_pp_multi_setup(make_cfg(), chunk=2)
    assert [r["status"] for r in rows] == ["trained", "trained"]
    assert all(np.isfinite(r["PSNR"]) for r in rows)
    # per-setup CompenNet++ checkpoints + the shared CompenNet init
    ckpts = sorted(glob.glob(os.path.join(root, "../checkpoint", "*.flax")))
    names_on_disk = [os.path.basename(c) for c in ckpts]
    assert sum("CompenNet++" in n for n in names_on_disk) == 2
    assert sum(n.startswith("init_CompenNet_") for n in names_on_disk) == 1

    rows2 = pretrain_compennets_pp_multi_setup(make_cfg(), chunk=2)
    assert [r["status"] for r in rows2] == ["cached", "cached"]

    mtimes = {c: os.path.getmtime(c) for c in ckpts}
    _, ret, _ = train_eval_compennet_pp(make_cfg(load_pretrained=True))
    for c, m in mtimes.items():
        assert os.path.getmtime(c) == m, "pipeline retrained instead of loading"
    psnr_rows = ret[ret["Setup"].isin(names)]
    assert len(psnr_rows) == 2 and np.isfinite(
        psnr_rows["PSNR"].to_numpy(float)).all()


def test_spaa_attack_multi_setup_matches_sequential():
    """Setup-parallel SPAA (one setup per device, shard_map) must equal S
    sequential production spaa_attack_batched runs — each device traces
    the SAME single-setup program, so this pins the stacking/sharding
    plumbing, not reduction-order noise."""
    from spaa_tpu.attack.spaa import SpaaConfig, spaa_attack_batched
    from spaa_tpu.parallel import spaa_attack_multi_setup

    S, B, HP, H, W, NCLS = 2, 6, 16, 12, 16, 7
    rng = np.random.default_rng(3)

    def pcnet_apply(state, prj):
        x = jax.image.resize(prj, (prj.shape[0], H, W, 3), "linear")
        return jnp.clip(x @ state["k"] * 0.5 + state["bias"], 0.0, 1.0)

    k_cl = jnp.asarray(rng.normal(0, 0.1, (H * W * 3, NCLS)).astype(np.float32))

    def logits_fn(params, cam):
        return cam.reshape(cam.shape[0], -1) @ params

    states, scenes, prjs, tgts, tgds, ws, dts = [], [], [], [], [], [], []
    for s in range(S):
        states.append({"k": jnp.asarray(
            rng.normal(0, 0.3, (3, 3)).astype(np.float32)),
            "bias": jnp.asarray(0.3 + 0.1 * s)})
        scenes.append(rng.random((1, H, W, 3)).astype(np.float32))
        prjs.append(rng.random((B, HP, HP, 3)).astype(np.float32))
        tgts.append(rng.integers(0, NCLS, B).astype(np.int32))
        tgds.append(np.asarray([True, False] * (B // 2)))
        ws.append(np.tile(np.asarray([0.0, 1.0, 1.0], np.float32), (B, 1)))
        dts.append(np.full((B,), 2.0, np.float32))
    cfg = SpaaConfig(iters=3)

    run1 = jax.jit(lambda *a: spaa_attack_batched(
        pcnet_apply, logits_fn, *a, cfg=cfg))
    refs = [run1(states[s], k_cl, jnp.asarray(scenes[s]),
                 jnp.asarray(prjs[s]), jnp.asarray(tgts[s]),
                 jnp.asarray(tgds[s]), jnp.asarray(ws[s]),
                 jnp.asarray(dts[s])) for s in range(S)]

    mesh = make_mesh(2, axis="setup")
    cam_ms, prj_ms = spaa_attack_multi_setup(
        pcnet_apply, logits_fn, states, k_cl, np.stack(scenes),
        np.stack(prjs), np.stack(tgts), np.stack(tgds), np.stack(ws),
        np.stack(dts), mesh=mesh, cfg=cfg)
    for s in range(S):
        np.testing.assert_allclose(np.asarray(refs[s][0]),
                                   np.asarray(cam_ms[s]),
                                   rtol=1e-6, atol=1e-7,
                                   err_msg=f"setup {s} cam_best")
        np.testing.assert_allclose(np.asarray(refs[s][1]),
                                   np.asarray(prj_ms[s]),
                                   rtol=1e-6, atol=1e-7,
                                   err_msg=f"setup {s} prj_best")

    # wrong wave size is rejected
    with pytest.raises(ValueError):
        spaa_attack_multi_setup(
            pcnet_apply, logits_fn, states[:1], k_cl, np.stack(scenes[:1]),
            np.stack(prjs[:1]), np.stack(tgts[:1]), np.stack(tgds[:1]),
            np.stack(ws[:1]), np.stack(dts[:1]), mesh=mesh, cfg=cfg)


@pytest.mark.slow
@pytest.mark.nightly
def test_run_spaa_attack_multi_setup_matches_sequential_driver(tmp_path):
    """Deployment wrapper: two synthetic setups attacked as one 2-device
    shard_map wave must reproduce the sequential driver's saved sweep
    outputs (same trained PCNets via the shared checkpoint cache; saved
    uint8 PNGs compared pixelwise).

    nightly (~4 min): the cheap primitive-level equivalences
    (test_spaa_attack_multi_setup_matches_sequential et al.) stay in the
    default suite; this one re-proves the full driver-vs-wave contract."""
    import glob
    import shutil
    from os.path import join

    from spaa_tpu.attack import get_attacker_cfg, run_projector_based_attack
    from spaa_tpu.parallel import run_spaa_attack_multi_setup
    from spaa_tpu.utils.io import imread_u8
    from spaa_tpu.utils.sim_procams import DEFAULT_SIM_SETUP_INFO, SimProCams

    root_a = str(tmp_path / "a" / "data")
    names = ["ms1", "ms2"]
    info = dict(DEFAULT_SIM_SETUP_INFO)
    info.update(prj_im_sz=[64, 64], cam_im_sz=[64, 48],
                classifier_crop_sz=[48, 48])
    for k, n in enumerate(names):
        SimProCams(dict(info), seed=11 + k).make_setup(
            root_a, n, num_train=16, num_test=4)

    def _cfg(root, load_pretrained):
        cfg = get_attacker_cfg("SPAA", root, names,
                               load_pretrained=load_pretrained)
        cfg.max_iters = 30           # tiny PCNet training
        cfg.attack_iters = 5         # tiny SPAA budget
        cfg.classifier_names = ["resnet18"]
        cfg.stealth_losses = ["caml2", "camdE"]  # exercises camde_range
        cfg.d_threshes = [5]
        return cfg

    run_projector_based_attack(_cfg(root_a, False))

    # same world + same trained weights for the wrapper: copy the data
    # tree AND the sibling checkpoint cache, drop A's attack outputs
    root_b = str(tmp_path / "b" / "data")
    shutil.copytree(str(tmp_path / "a"), str(tmp_path / "b"))
    for n in names:
        for sub in ["prj/adv", "cam/infer/adv"]:
            shutil.rmtree(join(root_b, "setups", n, sub))

    run_spaa_attack_multi_setup(_cfg(root_b, True),
                                mesh=make_mesh(2, axis="setup"))

    pngs_a = sorted(
        glob.glob(join(root_a, "setups/*/prj/adv/**/*.png"), recursive=True)
        + glob.glob(join(root_a, "setups/*/cam/infer/adv/**/*.png"),
                    recursive=True))
    # 2 setups x (prj + cam/infer) x 2 configs x 11 attacks
    assert len(pngs_a) == 2 * 2 * 2 * 11, pngs_a
    worst = 0
    for pa in pngs_a:
        pb = pa.replace(root_a, root_b)
        # compare the DECODED uint8 pixels: the float imread round-trip
        # ((u/255)*255) adds f32 rounding noise that pushed an exact
        # 1-count delta to 1.0000075 and failed the threshold spuriously
        im_a = np.asarray(imread_u8(pa), np.int16)
        im_b = np.asarray(imread_u8(pb), np.int16)
        worst = max(worst, int(np.abs(im_a - im_b).max()))
    # both paths run the identical per-setup math (stepped vs fori_loop
    # bodies of the same _spaa_body); saved uint8 pixels may flip by 1
    # count on exact-half rounding edges
    assert worst <= 1, f"saved sweep outputs differ by {worst} counts"


def test_percal_attack_multi_setup_matches_sequential():
    """Setup-parallel PerC-AL+CompenNet++ (one setup per device) must
    equal S sequential runs of the production loop + compensation."""
    from spaa_tpu.attack.perc_al import PercALConfig, perc_al_core
    from spaa_tpu.parallel import percal_attack_multi_setup

    S, B, H, W, NCLS = 2, 6, 12, 16, 7
    rng = np.random.default_rng(5)
    k_cl = jnp.asarray(rng.normal(0, 0.1, (H * W * 3, NCLS)).astype(np.float32))

    def logits_fn(params, cam):
        return cam.reshape(cam.shape[0], -1) @ params

    def compen_apply(p, cam, scene):
        return jnp.clip((cam - scene) @ p["k"] + p["b"], 0.0, 1.0)

    params, scenes, tgts = [], [], []
    for s in range(S):
        params.append({"k": jnp.asarray(
            rng.normal(0, 0.3, (3, 3)).astype(np.float32)),
            "b": jnp.asarray(0.4 + 0.05 * s)})
        scenes.append(rng.random((1, H, W, 3)).astype(np.float32))
        tgts.append(rng.integers(0, NCLS, B).astype(np.int32))
    targeted = np.tile(np.asarray([True] * (B - 1) + [False]), (S, 1))
    d_thr = np.full((S, B), 2.0, np.float32)
    cfg = PercALConfig(max_iterations=4, confidence=40)

    refs = []
    run1 = jax.jit(lambda clf, sc, t, tg, dt: perc_al_core(
        logits_fn, clf, jnp.broadcast_to(sc[0], (B,) + sc.shape[2:]),
        t, tg, cfg, d_thr=dt, projector_variant=True))
    for s in range(S):
        x_best = run1(k_cl, jnp.asarray(scenes[s])[None][0][None],
                      jnp.asarray(tgts[s]), jnp.asarray(targeted[s]),
                      jnp.asarray(d_thr[s]))
        scene_b = jnp.broadcast_to(jnp.asarray(scenes[s]),
                                   (B, H, W, 3))
        refs.append((x_best, compen_apply(params[s], x_best, scene_b)))

    mesh = make_mesh(2, axis="setup")
    cam_ms, prj_ms = percal_attack_multi_setup(
        compen_apply, logits_fn, params, k_cl, np.stack(scenes),
        np.stack(tgts), targeted, d_thr, mesh=mesh, cfg=cfg)
    for s in range(S):
        np.testing.assert_allclose(np.asarray(refs[s][0]),
                                   np.asarray(cam_ms[s]),
                                   rtol=1e-6, atol=1e-7,
                                   err_msg=f"setup {s} cam_best")
        np.testing.assert_allclose(np.asarray(refs[s][1]),
                                   np.asarray(prj_ms[s]),
                                   rtol=1e-6, atol=1e-7,
                                   err_msg=f"setup {s} prj_best")


@pytest.mark.slow
@pytest.mark.nightly
def test_run_percal_attack_multi_setup_matches_sequential_driver(tmp_path):
    """PerC-AL deployment wrapper vs the sequential driver: two synthetic
    setups, shared CompenNet++ checkpoints, saved PNGs compared.

    nightly (~4 min): see the SPAA twin above for why this is opt-in."""
    import glob
    import shutil
    from os.path import join

    from spaa_tpu.attack import get_attacker_cfg, run_projector_based_attack
    from spaa_tpu.parallel import run_percal_attack_multi_setup
    from spaa_tpu.utils.io import imread_u8
    from spaa_tpu.utils.sim_procams import DEFAULT_SIM_SETUP_INFO, SimProCams

    root_a = str(tmp_path / "a" / "data")
    names = ["mp1", "mp2"]
    info = dict(DEFAULT_SIM_SETUP_INFO)
    info.update(prj_im_sz=[64, 64], cam_im_sz=[64, 48],
                classifier_crop_sz=[48, 48])
    for k, n in enumerate(names):
        SimProCams(dict(info), seed=31 + k).make_setup(
            root_a, n, num_train=16, num_test=4)

    def _cfg(root, load_pretrained):
        cfg = get_attacker_cfg("PerC-AL+CompenNet++", root, names,
                               load_pretrained=load_pretrained)
        cfg.max_iters = 30           # tiny CompenNet++ training
        cfg.init_max_iters = 20      # tiny CompenNet init pretrain
        cfg.attack_iters = 5         # tiny PerC-AL budget
        cfg.classifier_names = ["resnet18"]
        return cfg

    run_projector_based_attack(_cfg(root_a, False))

    root_b = str(tmp_path / "b" / "data")
    shutil.copytree(str(tmp_path / "a"), str(tmp_path / "b"))
    for n in names:
        for sub in ["prj/adv", "cam/infer/adv"]:
            shutil.rmtree(join(root_b, "setups", n, sub))

    run_percal_attack_multi_setup(_cfg(root_b, True),
                                  mesh=make_mesh(2, axis="setup"))

    pngs_a = sorted(
        glob.glob(join(root_a, "setups/*/prj/adv/**/*.png"), recursive=True)
        + glob.glob(join(root_a, "setups/*/cam/infer/adv/**/*.png"),
                    recursive=True))
    # 2 setups x (prj + cam/infer) x 1 config x 11 attacks
    assert len(pngs_a) == 2 * 2 * 1 * 11, pngs_a
    worst = 0
    for pa in pngs_a:
        pb = pa.replace(root_a, root_b)
        # decoded uint8 counts, not the float round-trip (see the SPAA
        # twin above — the f32 (u/255)*255 epsilon is not a real delta)
        im_a = np.asarray(imread_u8(pa), np.int16)
        im_b = np.asarray(imread_u8(pb), np.int16)
        worst = max(worst, int(np.abs(im_a - im_b).max()))
    assert worst <= 1, f"saved PerC-AL outputs differ by {worst} counts"


def test_multi_setup_scan_segments_bitwise_equal():
    """The wave-training scan executes in production-sized segments
    (multi_setup.train_pcnet_multi_setup ``segment``): a single
    multi-thousand-iter dispatch runs >100 s on-device and networked TPU
    backends kill the worker as hung (observed on the 13-setup rehearsal).
    Segmenting threads (params, opt) through scan dispatches — the
    trajectory must be BITWISE identical to the one-dispatch program."""
    import optax
    from flax import linen as nn

    from spaa_tpu.parallel import train_pcnet_multi_setup

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, scene, mask):
            y = nn.Conv(3, (3, 3))(x)
            return jnp.clip(y + 0.1 * scene + 0.0 * mask, 0, 1)

    rng = np.random.default_rng(0)
    S, N, H, W = 2, 12, 8, 8
    m = Tiny()
    params_list = [
        m.init(jax.random.PRNGKey(s), jnp.zeros((1, H, W, 3)),
               jnp.zeros((1, H, W, 3)), jnp.zeros((H, W, 1)))["params"]
        for s in range(S)]
    scenes = rng.random((S, 1, H, W, 3)).astype(np.float32)
    masks = np.ones((S, H, W, 1), np.float32)
    inp = rng.random((S, N, H, W, 3)).astype(np.float32)
    tgt = rng.random((S, N, H, W, 3)).astype(np.float32)
    idx = rng.integers(0, N, (10, 4))
    kw = dict(mesh=None, curriculum_iter=4, use_scan=True)
    one = train_pcnet_multi_setup(m.apply, params_list, optax.adam(1e-3),
                                  scenes, masks, inp, tgt, idx,
                                  segment=None, **kw)
    seg = train_pcnet_multi_setup(m.apply, params_list, optax.adam(1e-3),
                                  scenes, masks, inp, tgt, idx,
                                  segment=3, **kw)   # 3,3,3,1 dispatches
    for xa, xb in zip(jax.tree.leaves(one[0]), jax.tree.leaves(seg[0])):
        assert np.array_equal(np.asarray(xa), np.asarray(xb))
    assert np.array_equal(one[1], seg[1])
    assert np.array_equal(one[2], seg[2])
