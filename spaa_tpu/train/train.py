"""Training/eval runtime for PCNet and CompenNet++ (reference
``train_network.py`` re-designed TPU-first).

Key re-designs vs the reference's per-iteration Python loop:
  - the whole training loop runs as ``lax.scan`` segments on device
    (``valid_rate`` iterations per dispatch): minibatch gather from
    HBM-resident train tensors, forward, loss, backward, three optimizer
    groups — one XLA program, zero host round-trips inside a segment;
  - the reference's three Adam groups with separate lrs and MultiStepLR
    milestones (``train_network.py:248-265``) become a single
    ``optax.multi_transform`` over param labels with piecewise-constant
    schedules;
  - the l1 → l1+ssim loss curriculum at iter 400 (``:299-303``) is a
    branchless ``jnp.where`` weight inside the jitted step, keeping one
    compiled program;
  - validation (``evaluate_model``) is a chunked jitted forward.
"""

from __future__ import annotations

import functools
import math
import random
import time
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from spaa_tpu.ops import metrics as M
from spaa_tpu.ops.ssim import ssim as ssim_fn
from spaa_tpu.utils.config import DictConfig


# --------------------------------------------------------------- loss menu
def huber(x: jax.Array, y: jax.Array, scaling: float = 0.1) -> jax.Array:
    """Pseudo-Huber loss (ref ``train_network.py`` ``huber``; the same
    formula :func:`compute_loss` applies inline for the 'huber' option)."""
    d2 = (x - y) ** 2
    h = (jnp.sqrt(jnp.clip(1 + d2 / scaling ** 2, 1e-4)) - 1) * scaling
    return jnp.mean(jnp.abs(h))


def compute_loss(infer: jax.Array, target: jax.Array, loss_option: str,
                 ssim_weight: Optional[jax.Array] = None):
    """Loss menu l1/l2/ssim/huber (ref ``train_network.py:367-392``).
    ``ssim_weight`` (0/1 scalar) implements the curriculum switch without
    recompiling. Returns (train_loss, l2_loss)."""
    if not loss_option:
        raise TypeError("Loss type not specified")
    train_loss = 0.0
    l2_loss = jnp.mean((infer - target) ** 2)
    if "l1" in loss_option:
        train_loss += jnp.mean(jnp.abs(infer - target))
    if "l2" in loss_option:
        train_loss += l2_loss
    if "ssim" in loss_option:
        s = 1.0 - ssim_fn(infer, target)
        train_loss += s if ssim_weight is None else ssim_weight * s
    if "huber" in loss_option:
        scaling = 0.1
        d2 = (infer - target) ** 2
        h = (jnp.sqrt(jnp.clip(1 + d2 / scaling ** 2, 1e-4)) - 1) * scaling
        train_loss += jnp.mean(jnp.abs(h))
    return train_loss, l2_loss


# ---------------------------------------------------------------- configs
def get_model_train_cfg(model_list, data_root=None, setup_list=None,
                        device_ids=(0,), center_crop=False,
                        load_pretrained=False, plot_on=False,
                        single=False) -> DictConfig:
    """Training config factory (ref ``train_network.py:444-473``); defaults
    kept identical so config-derived names match the reference layout."""
    cfg = DictConfig({})
    cfg.data_root = data_root
    cfg.setup_list = setup_list
    cfg.device = "tpu"
    cfg.device_ids = list(device_ids)
    cfg.load_pretrained = load_pretrained
    cfg.max_iters = 2000
    cfg.batch_size = 24
    cfg.lr = 1e-3
    cfg.lr_drop_ratio = 0.2
    cfg.lr_drop_rate = 800
    cfg.l2_reg = 1e-4
    cfg.train_plot_rate = 50
    cfg.valid_rate = 200
    cfg.plot_on = plot_on
    cfg.center_crop = center_crop
    if single:
        cfg.model_name = model_list[0]
        cfg.num_train = 500
        cfg.loss = "l1+ssim"
    else:
        cfg.model_list = model_list
        cfg.num_train_list = [500]
        cfg.loss_list = ["l1+ssim"]
    return cfg


# ----------------------------------------------------------- optimizers
def _param_label(path_tuple) -> str:
    keys = [getattr(p, "key", str(p)) for p in path_tuple]
    if "warping_net" in keys:
        if keys[-1] in ("affine_mat", "theta"):
            return "aff_tps"
        return "refine"
    return "shading"


def make_pcnet_optimizer(cfg) -> optax.GradientTransformation:
    """Three Adam groups, lrs 1e-2 / 5e-3 / 1e-3, MultiStepLR milestones
    100 / 1200 / 1800 with gamma=lr_drop_ratio, weight decay on the shading
    group only (ref ``train_network.py:252-265``; torch Adam's coupled
    weight_decay == add_decayed_weights *before* the Adam moments)."""
    g = cfg.lr_drop_ratio

    def sched(lr, milestone):
        return optax.piecewise_constant_schedule(lr, {milestone: g})

    tx = optax.multi_transform(
        {
            "aff_tps": optax.adam(sched(1e-2, 100)),
            "refine": optax.adam(sched(5e-3, 1200)),
            "shading": optax.chain(optax.add_decayed_weights(cfg.l2_reg),
                                   optax.adam(sched(1e-3, 1800))),
        },
        lambda params: jax.tree_util.tree_map_with_path(
            lambda path, _: _param_label(path), params),
    )
    return tx


def make_compennet_pp_optimizer(cfg) -> optax.GradientTransformation:
    """Single Adam + StepLR every ``lr_drop_rate`` iters
    (ref ``train_network.py:145-148``)."""
    boundaries = {int(b): cfg.lr_drop_ratio
                  for b in range(cfg.lr_drop_rate, cfg.max_iters + 1,
                                 cfg.lr_drop_rate)}
    sched = optax.piecewise_constant_schedule(cfg.lr, boundaries)
    return optax.chain(optax.add_decayed_weights(cfg.l2_reg),
                       optax.adam(sched))


# ------------------------------------------------------------- train loop
def sample_batch_indices(num_train: int, batch_size: int, max_iters: int,
                         seed_state: Optional[random.Random] = None) -> np.ndarray:
    """All minibatch indices up front, using python ``random.sample`` like
    the reference (``train_network.py:295``) for trajectory parity."""
    r = seed_state or random
    return np.asarray(
        [r.sample(range(num_train), batch_size) for _ in range(max_iters)],
        np.int32)


@functools.lru_cache(maxsize=16)
def _compiled_train_programs(apply_loss_fn: Callable, tx):
    """The two jitted training programs (scan segment + single step) for a
    (loss_fn, optimizer) pair, memoized by object identity.

    ``train_model_scan`` used to build these as fresh closures per call, so
    a second call with the SAME loss/optimizer (e.g. bench.py's compile
    warm-up before its timed e2e run, or repeated training on one setup)
    re-traced and re-compiled identical programs. Memoizing the jitted
    callables makes any repeat call hit jax's in-process executable cache
    directly — independent of whether the persistent on-disk cache works
    on the backend. (optax GradientTransformations are NamedTuples of
    functions — hashable by identity, like ``apply_loss_fn``.)"""
    grad_fn = jax.value_and_grad(apply_loss_fn, has_aux=True)

    # train tensors are jit ARGUMENTS (not closures) — closure-captured
    # device arrays would be embedded as program constants (slow trace,
    # bloated executable, re-shipped per dispatch on networked backends)
    def step(inputs, targets, carry, idx_and_iter):
        params, opt_state = carry
        idx, itr = idx_and_iter
        x = jnp.take(inputs, idx, axis=0)
        y = jnp.take(targets, idx, axis=0)
        # uint8 wire format (lossless for PNG-sourced data: k/255 is the
        # same f32 everywhere): 4x less host→device upload AND a 4x
        # smaller HBM-resident train set; the cast runs on-device on the
        # gathered minibatch only
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
        if y.dtype == jnp.uint8:
            y = y.astype(jnp.float32) / 255.0
        (loss, l2), grads = grad_fn(params, x, y, itr)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), (loss, l2)

    @jax.jit
    def run_segment(params, opt_state, inputs, targets, idx_seg, iter_seg):
        (params, opt_state), (losses, l2s) = jax.lax.scan(
            partial(step, inputs, targets), (params, opt_state),
            (idx_seg, iter_seg))
        return params, opt_state, losses, l2s

    @jax.jit
    def run_step(params, opt_state, inputs, targets, idx, itr):
        (params, opt_state), (loss, l2) = step(inputs, targets,
                                               (params, opt_state), (idx, itr))
        return params, opt_state, loss, l2

    return run_segment, run_step


def train_model_scan(apply_loss_fn: Callable, params, tx, train_arrays: dict,
                     batch_idx: np.ndarray, cfg,
                     valid_fn: Optional[Callable] = None,
                     log_prefix: str = "", use_scan: Optional[bool] = None,
                     curve_logger=None, resume_path: Optional[str] = None):
    """Generic scan-segmented training loop.

    apply_loss_fn(params, inputs, targets, itr) -> (loss, l2)
    train_arrays: dict with 'inputs' [N,...] and 'targets' [N,...]
                  (device-resident; gathered per step).

    On TPU the whole ``valid_rate`` segment is one ``lax.scan`` dispatch
    (zero host round-trips). On the CPU backend XLA executes while-loop
    bodies without the intra-op thread pool (~7x slower per step than the
    identical jitted step dispatched from Python), so there we loop a
    single jitted step instead — same math, same trajectory.

    ``resume_path``: crash-recovery snapshot file (params + optimizer
    state + iteration). Saved after every segment; if it exists on entry,
    training continues from its iteration with the exact Adam moments and
    schedule step (the uninterrupted trajectory — ``batch_idx`` holds the
    full precomputed index plan, so the remaining minibatches are the same
    ones the killed run would have drawn). Removed on completion; the
    reference has no equivalent (params-only save-at-end,
    ``utils.py:717-721``).
    """
    import os as _os
    import zlib as _zlib

    from spaa_tpu.utils import log as L

    def _data_fingerprint() -> int:
        # identifies the training data + index plan: shapes/dtypes, a few
        # strided sample images, and the whole (small) batch-index array.
        # Guards against resuming a stale snapshot after the setup was
        # re-captured under the same config string.
        h = 0
        for key in ("inputs", "targets"):
            a = np.asarray(train_arrays[key])
            h = _zlib.crc32(f"{a.shape}{a.dtype}".encode(), h)
            step = max(1, a.shape[0] // 4)
            h = _zlib.crc32(np.ascontiguousarray(a[::step]).tobytes(), h)
        return _zlib.crc32(np.asarray(batch_idx).tobytes(), h)

    opt_state = tx.init(params)
    start_it = 0
    data_fp = _data_fingerprint() if resume_path is not None else 0
    if resume_path is not None and _os.path.exists(resume_path):
        p2, o2, it2, fp2 = L.load_train_state(resume_path, params, opt_state)
        if fp2 == 0:
            # legacy snapshot (written before fingerprints existed): its
            # provenance can't be verified — honor the invested compute
            # but say so; new snapshots always carry a fingerprint
            params, opt_state, start_it = p2, o2, it2
            print(f"{log_prefix}Resuming from {resume_path} at iter "
                  f"{start_it} (legacy snapshot without a data "
                  "fingerprint — delete it to force a fresh run)")
        elif fp2 != data_fp:
            print(f"{log_prefix}WARNING: {resume_path} was written for "
                  "DIFFERENT training data or index plan (the setup was "
                  "re-captured or the config reused) — discarding the "
                  "stale snapshot and training from scratch")
            _os.remove(resume_path)
        else:
            params, opt_state, start_it = p2, o2, it2
            print(f"{log_prefix}Resuming from {resume_path} "
                  f"at iter {start_it}")
    inputs = jax.device_put(train_arrays["inputs"])
    targets = jax.device_put(train_arrays["targets"])
    idx_all = jax.device_put(jnp.asarray(batch_idx))
    if use_scan is None:
        use_scan = jax.default_backend() != "cpu"

    run_segment, run_step = _compiled_train_programs(apply_loss_fn, tx)

    max_iters = int(cfg.max_iters)
    seg = int(cfg.valid_rate)
    start = time.time()
    it = start_it
    valid_psnr = valid_rmse = valid_ssim = 0.0
    # evaluators built by make_evaluator expose an async (device-array)
    # metrics dispatch; with it, the whole reporting tail of segment k
    # (scalar pulls, resume snapshot, validation result, logging) runs
    # while segment k+1 is already computing on device — on a networked
    # backend this hides ~all per-segment host latency
    async_valid = getattr(valid_fn, "async_metrics", None) \
        if valid_fn is not None else None

    def report(state):
        nonlocal valid_psnr, valid_rmse, valid_ssim
        it_done, loss_last, l2_last, vout, p_done, o_done = state
        if resume_path is not None:
            L.save_train_state(resume_path, p_done, o_done, it_done,
                               fingerprint=data_fp)
        loss_v = float(loss_last)
        rmse_v = math.sqrt(float(l2_last) * 3)
        if vout is not None:
            if async_valid is not None:
                valid_psnr, valid_rmse, valid_ssim = (
                    float(v) for v in np.asarray(vout))
            else:
                valid_psnr, valid_rmse, valid_ssim, _ = vout
        lapse = time.strftime("%H:%M:%S", time.gmtime(time.time() - start))
        print(f"{log_prefix}Iter:{it_done:5d} | Time: {lapse} | "
              f"Train Loss: {loss_v:.4f} | Train RMSE: {rmse_v:.4f} | "
              f"Valid PSNR: {valid_psnr:2.4f} | Valid RMSE: {valid_rmse:.4f} "
              f"| Valid SSIM: {valid_ssim:.4f} |")
        if curve_logger is not None:
            curve_logger.append(it_done, train_loss=loss_v,
                                train_rmse=rmse_v, valid_psnr=valid_psnr,
                                valid_rmse=valid_rmse, valid_ssim=valid_ssim)

    pending = None
    while it < max_iters:
        n = min(seg, max_iters - it)
        if use_scan:
            iter_seg = jnp.arange(it, it + n, dtype=jnp.int32)
            params, opt_state, losses, l2s = run_segment(
                params, opt_state, inputs, targets, idx_all[it:it + n],
                iter_seg)
            loss_last, l2_last = losses[-1], l2s[-1]
        else:
            for j in range(it, it + n):
                params, opt_state, loss_last, l2_last = run_step(
                    params, opt_state, inputs, targets, idx_all[j],
                    jnp.asarray(j, jnp.int32))
        it += n
        if pending is not None:     # segment k-1's tail under segment k
            report(pending)
        vout = None
        if valid_fn is not None:
            vout = (async_valid(params) if async_valid is not None
                    else valid_fn(params))
        pending = (it, loss_last, l2_last, vout, params, opt_state)
    if pending is not None:
        report(pending)
    if resume_path is not None and _os.path.exists(resume_path):
        _os.remove(resume_path)  # completed: the final checkpoint supersedes
    return params, valid_psnr, valid_rmse, valid_ssim


def make_evaluator(apply_fn: Callable, valid_inputs, valid_targets,
                   cam_scene, chunk_sz: int = 10,
                   fused: Optional[bool] = None):
    """Chunked no-grad eval (ref ``evaluate_model``,
    ``train_network.py:395-441``). apply_fn(params, x, scene) -> infer.

    During training, only the scalar metrics cross the device boundary
    (``return_images=False``) — materializing the inferred image stack per
    validation costs hundreds of MB of device→host traffic; the images are
    pulled once, at the final evaluation. On TPU the metrics-only path is
    additionally fused into ONE dispatch (``lax.map`` over equal chunks —
    memory bounded like the chunked loop, but a single program: on a
    networked backend the old path paid ~10 round-trips per validation).
    The CPU backend keeps the per-chunk loop (XLA:CPU runs loop bodies
    without the intra-op thread pool — iron rule 4)."""
    n = valid_inputs.shape[0]
    chunks = [c for c in np.array_split(np.arange(n), min(chunk_sz, n))
              if len(c)]
    jit_apply = jax.jit(apply_fn)
    v_in = jax.device_put(valid_inputs)
    v_gt = jax.device_put(valid_targets)
    scene = jax.device_put(cam_scene)
    n_chunks = min(chunk_sz, n)
    if fused is None:   # default: fuse off-CPU (iron rule 4); override for tests
        fused = jax.default_backend() != "cpu"
    fused = fused and n % max(n_chunks, 1) == 0

    def _f01(x):
        # uint8 wire format (see train_model_scan.step): convert on device
        if x.dtype == jnp.uint8:
            return x.astype(jnp.float32) / 255.0
        return x

    @jax.jit
    def _chunk_metrics(params, x, gt):
        x, gt = _f01(x), _f01(gt)
        infer = apply_fn(params, x, scene)   # scene [1,...]: models broadcast internally
        from spaa_tpu.ops.metrics import _metrics_device
        return _metrics_device(infer, gt)[:3]

    @jax.jit
    def _all_metrics(params, xr, gtr):
        # xr/gtr: [n_chunks, k, ...]; equal chunks → plain mean over chunk
        # PSNR/RMSE/SSIM equals the frac-weighted mean of the loop path
        def body(args):
            x, gt = _f01(args[0]), _f01(args[1])
            infer = apply_fn(params, x, scene)
            from spaa_tpu.ops.metrics import _metrics_device
            p, r, s = _metrics_device(infer, gt)[:3]
            return jnp.stack([p, r, s])
        ms = jax.lax.map(body, (xr, gtr))          # [n_chunks, 3]
        return jnp.mean(ms, axis=0)

    if fused:
        k = n // n_chunks
        v_in_r = v_in.reshape((n_chunks, k) + v_in.shape[1:])
        v_gt_r = v_gt.reshape((n_chunks, k) + v_gt.shape[1:])

    def evaluate(params, return_images: bool = False):
        if not return_images and fused:
            p, r, s = (float(v) for v in np.asarray(
                _all_metrics(params, v_in_r, v_gt_r)))
            return p, r, s, None
        infers = []
        psnr = rmse = ssim_v = 0.0
        for idx in chunks:
            x = v_in[idx[0]:idx[-1] + 1]
            gt = v_gt[idx[0]:idx[-1] + 1]
            frac = len(idx) / n
            if return_images:
                x, gt = _f01(x), _f01(gt)
                infer = jit_apply(params, x, scene)
                infers.append(np.asarray(infer))
                p, r, s, *_ = M.calc_img_dists(infer, gt)
            else:
                p, r, s = (float(v) for v in _chunk_metrics(params, x, gt))
            psnr += p * frac
            rmse += r * frac
            ssim_v += s * frac
        images = np.concatenate(infers, 0) if return_images else None
        return psnr, rmse, ssim_v, images

    if fused:
        # async metrics: returns the un-pulled [3] device array so the
        # training loop can dispatch it behind the next segment and pull
        # later (train_model_scan's pipelined reporting)
        evaluate.async_metrics = lambda params: _all_metrics(params, v_in_r,
                                                             v_gt_r)
    return evaluate
