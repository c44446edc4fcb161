"""RNG seeding utilities.

JAX is functional: randomness flows through explicit ``jax.random`` keys, so
"resetting global seeds" (reference ``utils.py:70-76``) maps to constructing a
fresh root key here plus seeding numpy/python for the host-side code paths
(data shuffling done on host, OpenCV, scipy).
"""

from __future__ import annotations

import random

import jax
import numpy as np


def reset_rng_seeds(seed: int) -> jax.Array:
    """Seed numpy + python RNGs and return a root JAX PRNG key.

    Mirrors reference ``utils.py:70-76`` (which also seeds torch/cuda; the
    JAX equivalent is the returned key that callers thread through).
    """
    np.random.seed(seed)
    random.seed(seed)
    return jax.random.PRNGKey(seed)


def set_reproducibility(reproducible: bool = False) -> None:
    """TPU/XLA equivalent of the cudnn-determinism toggle
    (reference ``utils.py:79-81``). XLA on TPU is deterministic for a fixed
    program; this is a no-op kept for API parity."""
    del reproducible
