"""Test-session configuration.

Force the CPU backend with 8 virtual devices BEFORE jax is imported anywhere,
so multi-chip sharding logic (mesh/pjit/shard_map/collectives) is exercised in
CI without TPU hardware. Mirrors how the driver dry-runs `dryrun_multichip`.

Set DENSEPOINTS_TEST_TPU=1 to keep the real backend instead: the CPU-only
tests still pass (Pallas kernels compile for real this time) and the
`tests/ops/test_tpu_smoke.py` Mosaic-compile smoke tests un-skip. This is the
leg that catches "compiles in interpret mode, fails on hardware" regressions
(the round-1 bench failure mode).
"""
import os

_USE_TPU = os.environ.get("DENSEPOINTS_TEST_TPU") == "1"
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture()
def rng():
    # Function-scoped: every test gets the same fresh seeded stream, so
    # outcomes never depend on execution order.
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-process / long-running integration tests"
    )
