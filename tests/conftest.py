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
    # Persistent compilation cache: recompiles dominate the suite's wall
    # time (~650 s cold). XLA:CPU only persists its kernels when the
    # xla-caches knob is on; warm runs then skip most compile work.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "JAX_COMPILATION_CACHE_DIR", "/tmp/densepoints_jax_cache"
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    try:
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:  # older jax without the knob
        pass

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
