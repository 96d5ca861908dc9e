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
    # The cache dir is keyed by a host-CPU fingerprint: XLA:CPU AOT
    # entries encode the COMPILE machine's features, and loading entries
    # from a different machine generation produces numerically different
    # kernels than fresh compiles — which broke 1-dev == 8-dev
    # determinism tests (the two programs have different cache keys, so
    # one could hit a stale entry while the other compiled fresh).
    def _host_tag() -> str:
        import hashlib

        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith("flags"):
                        return hashlib.md5(line.encode()).hexdigest()[:10]
        except OSError:
            pass
        import platform

        return hashlib.md5(platform.processor().encode()).hexdigest()[:10]

    if os.environ.get("DENSEPOINTS_NO_CACHE") != "1":
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "JAX_COMPILATION_CACHE_DIR",
                f"/tmp/densepoints_jax_cache_{_host_tag()}",
            ),
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.5
        )
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
