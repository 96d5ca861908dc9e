"""Test-session configuration.

Force the CPU backend with 8 virtual devices BEFORE jax is imported anywhere,
so multi-chip sharding logic (mesh/pjit/shard_map/collectives) is exercised in
CI without TPU hardware. Mirrors how the driver dry-runs `dryrun_multichip`.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture()
def rng():
    # Function-scoped: every test gets the same fresh seeded stream, so
    # outcomes never depend on execution order.
    return np.random.default_rng(0)
