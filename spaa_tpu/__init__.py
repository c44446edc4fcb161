"""spaa_tpu — a TPU-native (JAX/Flax/Pallas) framework for stealthy
projector-based adversarial attacks, with the capabilities of
BingyaoHuang/SPAA re-designed TPU-first.

Layers (bottom-up), mirroring the reference inventory (SURVEY.md §1-2):
  ops/       L0 numeric & image primitives (grid_sample, TPS, SSIM, ΔE2000)
  models/    L2 Flax modules (WarpingNet, ShadingNetSPAA, CompenNet[++],
             PCNet) + the classifier zoo (ResNet-18 / VGG-16 / Inception-v3)
  train/     L3 training/eval runtime (optax multi-group optimizers,
             jitted steps, checkpointing, logging)
  attack/    L4 attackers (SPAA, PerC-AL[+CompenNet++], One-pixel DE with
             batched population eval) + benchmark orchestration/stats
  parallel/  device-mesh sharding helpers (pjit/shard_map over jax meshes)
  utils/     host-side I/O, configs, logging, ProCams hardware + simulator
"""

__version__ = "0.1.0"

# persistent XLA compilation cache: the benchmark re-runs large jitted
# programs (attack loops, train segments) across many processes/rounds;
# without this every process pays tens of seconds of recompilation
from spaa_tpu.utils.jaxtools import enable_compilation_cache as _ecc

_ecc()
del _ecc
