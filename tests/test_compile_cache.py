"""Persistent compile cache (utils/compile_cache.py) — round-4 VERDICT
weak 3: the subsystem shipped with zero tests. These pin (a) the jax
config actually gets set, (b) the opt-out env var is respected, (c) an
unusable location degrades to a logged warning instead of raising, and
(d) on CPU, a jit actually POPULATES the cache directory (so an
enable-failure can't be invisible)."""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import pytest

from onpolicy_tpu.utils import compile_cache


@pytest.fixture
def restore_cache_config():
    old = jax.config.jax_compilation_cache_dir
    yield
    jax.config.update("jax_compilation_cache_dir", old)


def test_enable_sets_config(tmp_path, restore_cache_config, monkeypatch):
    monkeypatch.delenv("ONPOLICY_TPU_NO_COMPILE_CACHE", raising=False)
    target = str(tmp_path / "cache")
    assert compile_cache.enable(target) is True
    assert jax.config.jax_compilation_cache_dir == target
    assert jax.config.jax_persistent_cache_min_entry_size_bytes == -1
    assert jax.config.jax_persistent_cache_min_compile_time_secs == 0
    assert os.path.isdir(target)


def test_opt_out_env(tmp_path, restore_cache_config, monkeypatch):
    monkeypatch.setenv("ONPOLICY_TPU_NO_COMPILE_CACHE", "1")
    before = jax.config.jax_compilation_cache_dir
    assert compile_cache.enable(str(tmp_path / "nope")) is False
    assert jax.config.jax_compilation_cache_dir == before
    assert not (tmp_path / "nope").exists()


def test_env_var_location(tmp_path, restore_cache_config, monkeypatch):
    monkeypatch.delenv("ONPOLICY_TPU_NO_COMPILE_CACHE", raising=False)
    target = str(tmp_path / "from_env")
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", target)
    assert compile_cache.enable() is True
    assert jax.config.jax_compilation_cache_dir == target


def test_bad_location_warns_not_raises(tmp_path, restore_cache_config,
                                       monkeypatch, caplog):
    monkeypatch.delenv("ONPOLICY_TPU_NO_COMPILE_CACHE", raising=False)
    blocker = tmp_path / "file"
    blocker.write_text("not a directory")
    with caplog.at_level("WARNING"):
        ok = compile_cache.enable(str(blocker / "sub"))
    assert ok is False
    assert any("compile cache disabled" in r.message for r in caplog.records)


def test_jit_populates_cache(tmp_path, restore_cache_config, monkeypatch):
    monkeypatch.delenv("ONPOLICY_TPU_NO_COMPILE_CACHE", raising=False)
    target = tmp_path / "pop"
    assert compile_cache.enable(str(target)) is True

    @jax.jit
    def f(x):
        return jnp.tanh(x) * 3.0 + jnp.sum(x ** 2)

    f(jnp.arange(64, dtype=jnp.float32)).block_until_ready()
    entries = list(target.iterdir())
    assert entries, "jit compile wrote no persistent cache entry"
