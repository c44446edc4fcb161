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

from functools import partial
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
                    curriculum_iter: int, inputs, targets, scene, mask,
                    params, opt_state, idx, itr):
    """One training step of ONE setup — the same math as
    ``train.train_model_scan``'s step with the pipeline's PCNet loss
    (scene stays [1, H, W, 3]; curriculum l1→l1+ssim at
    ``curriculum_iter``, ref ``train_network.py:299-303``)."""
    x = _u8_to_f32(jnp.take(inputs, idx, axis=0))
    y = _u8_to_f32(jnp.take(targets, idx, axis=0))

    def loss_fn(p):
        infer = model_apply({"params": p}, x, scene, mask)
        w = (itr > curriculum_iter).astype(jnp.float32)
        return compute_loss(infer, y, loss_option, ssim_weight=w)

    (loss, l2), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss, l2


def setup_sharding(mesh: Optional[Mesh], axis: str = "setup"):
    """NamedSharding splitting the leading (setup) axis, or None."""
    if mesh is None:
        return None
    return NamedSharding(mesh, P(axis))


def train_pcnet_multi_setup(model_apply: Callable, params_list, tx,
                            scenes, masks, inputs, targets,
                            batch_idx: np.ndarray,
                            mesh: Optional[Mesh] = None,
                            axis: str = "setup",
                            loss_option: str = "l1+ssim",
                            curriculum_iter: int = 400,
                            use_scan: Optional[bool] = None):
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

    # vmap over the setup axis; the shared (idx, itr) stay unmapped. All
    # big tensors are jit ARGUMENTS (iron rule: no device-array closures).
    vstep = jax.vmap(
        partial(_one_setup_step, model_apply, tx, loss_option,
                curriculum_iter),
        in_axes=(0, 0, 0, 0, 0, 0, None, None))

    # 0-based iteration numbering, matching train_model_scan's
    # ``jnp.arange(it, it + n)`` (the curriculum compares ``itr > 400``
    # against the same values in both loops)
    idx_all = jnp.asarray(batch_idx)
    iters_all = jnp.arange(idx_all.shape[0], dtype=jnp.int32)

    # Multi-device execution goes through shard_map, NOT bare jit +
    # sharding propagation: vmap lowers the batch-1 scene convs
    # (e.g. ShadingNet's 1x1 skipConv1_0) to feature_group_count=S
    # grouped convs, and XLA's SPMD partitioner mis-shards those (kernel
    # output features split without the lhs channels — INVALID_ARGUMENT
    # at compile). shard_map sidesteps propagation entirely: each device
    # traces the per-shard program on LOCAL setups (fgc = S/n_devices)
    # and, since the trainings share nothing, emits zero collectives.
    def _maybe_shard_map(f, out_specs):
        if mesh is None:
            return jax.jit(f)
        sp = P(axis)
        return jax.jit(jax.shard_map(
            f, mesh=mesh, in_specs=(sp,) * 6 + (P(), P()),
            out_specs=out_specs))

    if use_scan:
        def run(params_stk, opt_stk, inputs, targets, scenes, masks,
                idx_all, iters_all):
            def body(carry, idx_itr):
                p, o = carry
                idx, itr = idx_itr
                p, o, loss, l2 = vstep(inputs, targets, scenes, masks,
                                       p, o, idx, itr)
                return (p, o), (loss, l2)
            (p, o), (losses, l2s) = jax.lax.scan(
                body, (params_stk, opt_stk), (idx_all, iters_all))
            return p, losses, l2s

        run = _maybe_shard_map(
            run, (P(axis), P(None, axis), P(None, axis)))
        params_stk, losses, l2s = run(params_stk, opt_stk, inputs,
                                      targets, scenes, masks, idx_all,
                                      iters_all)
    else:
        step1 = _maybe_shard_map(
            lambda p, o, inp, tgt, sc, mk, idx, itr:
                vstep(inp, tgt, sc, mk, p, o, idx, itr),
            (P(axis), P(axis), P(axis), P(axis)))
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
