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
