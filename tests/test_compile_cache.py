"""Persistent compilation cache wiring (ttrt.utils.compile_cache).

Functional effect (a second process replaying a compile from disk) is a
TPU/TTFF measurement recorded in README; these tests pin the config
plumbing: env gate, directory creation, and non-fatality.
"""

import os

import jax
import pytest

from ttrt.utils.compile_cache import enable_compile_cache


@pytest.fixture(autouse=True)
def _restore_jax_cache_config():
    """enable_compile_cache mutates GLOBAL jax config; without teardown
    every later test in this pytest process would serialize its compiled
    executables into a throwaway tmp dir (pure overhead on the
    minutes-long interpret-mode kernel compiles)."""
    keys = ("jax_compilation_cache_dir",
            "jax_persistent_cache_min_compile_time_secs",
            "jax_persistent_cache_min_entry_size_bytes")
    before = {k: getattr(jax.config, k) for k in keys
              if hasattr(jax.config, k)}
    yield
    for k, v in before.items():
        jax.config.update(k, v)


def test_env_zero_disables(monkeypatch):
    monkeypatch.setenv("TTRT_COMPILE_CACHE", "0")
    assert enable_compile_cache() is None


def test_custom_dir_created_and_configured(monkeypatch, tmp_path):
    target = str(tmp_path / "jaxcache")
    monkeypatch.setenv("TTRT_COMPILE_CACHE", target)
    out = enable_compile_cache()
    assert out == target
    assert os.path.isdir(target)
    assert jax.config.jax_compilation_cache_dir == target


def test_cache_actually_persists_an_entry(monkeypatch, tmp_path):
    """A compiled program must land on disk (CPU backend compiles
    locally, so this exercises the full write path end-to-end)."""
    import jax.numpy as jnp

    target = str(tmp_path / "jaxcache2")
    monkeypatch.setenv("TTRT_COMPILE_CACHE", target)
    assert enable_compile_cache() == target

    @jax.jit
    def f(x):
        return (x * 2.0 + 1.0).sum()

    f(jnp.arange(8.0)).block_until_ready()
    # entry written unless the compile beat the 0.5 s floor (possible on
    # a warm CPU); either way the call path must not have raised
    assert os.path.isdir(target)
