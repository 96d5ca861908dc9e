"""Persistent-compilation-cache wiring (VERDICT r4 #8)."""
import jax

from densepoints_tpu.utils.cache import enable_compilation_cache


def test_respects_existing_cache_dir():
    # The test conftest already configured a cache dir; enabling again
    # must NOT clobber it (the user-set-value contract).
    current = jax.config.jax_compilation_cache_dir
    assert current  # conftest set it
    assert enable_compilation_cache("/tmp/somewhere_else") == current
    assert jax.config.jax_compilation_cache_dir == current


def test_disabled_by_env(monkeypatch):
    monkeypatch.setenv("DENSEPOINTS_NO_CACHE", "1")
    assert enable_compilation_cache() is None
