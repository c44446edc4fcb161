"""Device-mesh utilities: data-parallel sharding for training and attacks.

The reference's only multi-device axis is ``nn.DataParallel`` batch
scatter/gather (SURVEY.md §2 "Parallelism strategies" — TP/PP/SP/EP are
absent by design: small CNNs on ≤320x240 images). The TPU-native
equivalent: a 1-D ``jax.sharding.Mesh`` over the ``data`` axis with
``NamedSharding`` batch partitioning; XLA inserts the gradient ``psum``
over ICI automatically when the jitted loss reduces over the batch.

On one chip this collapses to plain ``jit`` — same code path.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard leading (batch) dim, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Place every array's leading dim across the mesh."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def shard_attack_inputs(mesh: Mesh, pcnet_state, clf_params, cam_scene,
                        prj_init, target_idx, targeted, weights, d_thr,
                        axis: str = "data"):
    """Shard a batched attack over the mesh: per-sample arrays split on the
    batch axis, frozen model state replicated. The jitted attack program
    then runs SPMD — per-sample math is device-local and XLA inserts the
    (tiny) collectives for the batch-mean losses over ICI.

    The TPU-native replacement for the reference's ``nn.DataParallel``
    scatter/gather around its attack loops (SURVEY.md §2 parallelism)."""
    bs = batch_sharding(mesh, axis)
    rep = replicated(mesh)
    put_b = lambda x: jax.device_put(x, bs)
    put_r = lambda t: jax.tree.map(lambda x: jax.device_put(x, rep), t)
    return (put_r(pcnet_state), put_r(clf_params),
            jax.device_put(cam_scene, rep), put_b(prj_init),
            put_b(target_idx), put_b(targeted), put_b(weights), put_b(d_thr))
