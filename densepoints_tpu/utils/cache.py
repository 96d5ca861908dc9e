"""Persistent XLA compilation cache for production entry points.

Cold starts through the remote-compile tunnel cost 300+ s of compile for
a 12-view scene (BENCH_r04 compile_overhead_seconds: 309) and recur per
process per run. The test suite has had a persistent cache since round 4
(tests/conftest.py); this wires the same thing into the CLI, the
multihost initializer, and bench — so the second process/run of the same
shapes skips compilation entirely (measured on the tunnel backend:
1.4 s -> 0.04 s for a fresh process on a cached program).

Safety keying (the round-4 lesson, tests/conftest.py:28-66): XLA:CPU AOT
entries encode the COMPILE machine's CPU features without keying on
them, so loading another machine generation's entries produces
numerically different kernels than fresh compiles. The cache directory
is therefore fingerprinted by backend platform + host CPU flags; TPU
entries additionally key on the device kind via the directory name.
"""
from __future__ import annotations

import hashlib
import os
import pathlib

__all__ = ["enable_compilation_cache"]


def _host_tag() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return hashlib.md5(platform.processor().encode()).hexdigest()[:10]


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Turn on the persistent compilation cache (idempotent).

    Respects an existing user-set `jax_compilation_cache_dir`; disable
    entirely with DENSEPOINTS_NO_CACHE=1. Returns the directory in use
    (None if disabled).
    """
    if os.environ.get("DENSEPOINTS_NO_CACHE") == "1":
        return None
    import jax

    current = jax.config.jax_compilation_cache_dir
    if current:
        return current
    if cache_dir is None:
        cache_dir = os.environ.get("DENSEPOINTS_CACHE_DIR")
    if cache_dir is None:
        try:
            platform = jax.default_backend()
            kind = jax.devices()[0].device_kind.replace(" ", "-")
        except Exception:
            platform, kind = "unknown", "unknown"
        base = pathlib.Path(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
        )
        cache_dir = str(
            base / "densepoints_tpu"
            / f"jax_cache_{platform}_{kind}_{_host_tag()}"
        )
    pathlib.Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    try:
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:  # older jax without the knob
        pass
    return cache_dir
