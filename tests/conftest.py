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


def pytest_addoption(parser):
    parser.addoption(
        "--nightly", action="store_true", default=False,
        help="also run the multi-minute e2e tests marked 'nightly' "
             "(equivalent: SPAA_NIGHTLY=1)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: takes >30s (informational only)")
    config.addinivalue_line(
        "markers", "nightly: multi-minute e2e; skipped unless --nightly "
                   "or SPAA_NIGHTLY=1 (suite wall-clock budget is ~25 min)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--nightly") or os.environ.get("SPAA_NIGHTLY"):
        return
    skip = pytest.mark.skip(
        reason="nightly e2e (run with --nightly or SPAA_NIGHTLY=1)")
    for item in items:
        if "nightly" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
