"""Test config: force JAX onto CPU with 8 virtual devices.

Real TPU hardware is a single chip in this environment; multi-chip sharding
paths are validated on a virtual 8-device CPU mesh (same XLA semantics).
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override: env presets axon (TPU)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# the axon sitecustomize registers the TPU backend at interpreter start and
# pins jax_platforms=axon; re-pin to cpu before any computation runs
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
