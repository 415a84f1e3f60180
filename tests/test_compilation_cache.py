"""Knob behavior of utils/compilation_cache.py (the function every CLI
calls before touching jax). The actual compile-time win is a TPU-only
property (CLAUDE.md r5 facts: 18.7 -> 2.7 s); here we pin the config
semantics without leaving global jax config mutated for other tests."""
from __future__ import annotations

import os

import jax
import pytest

from recommendflow_tpu.utils.compilation_cache import enable_compilation_cache


@pytest.fixture
def restore_cache_config():
    before = getattr(jax.config, "jax_compilation_cache_dir", None)
    try:
        yield
    finally:
        jax.config.update("jax_compilation_cache_dir", before)


def test_disabled_by_env(monkeypatch, restore_cache_config):
    monkeypatch.setenv("RECFLOW_XLA_CACHE", "0")
    assert enable_compilation_cache() is None


def test_user_jax_config_wins(monkeypatch, tmp_path, restore_cache_config):
    monkeypatch.delenv("RECFLOW_XLA_CACHE", raising=False)
    user_dir = str(tmp_path / "user_cache")
    jax.config.update("jax_compilation_cache_dir", user_dir)
    # a user-configured cache must not be overridden
    assert enable_compilation_cache(str(tmp_path / "other")) is None
    assert jax.config.jax_compilation_cache_dir == user_dir


def test_env_dir_and_default(monkeypatch, tmp_path, restore_cache_config):
    monkeypatch.delenv("RECFLOW_XLA_CACHE", raising=False)
    jax.config.update("jax_compilation_cache_dir", None)
    d = str(tmp_path / "env_cache")
    monkeypatch.setenv("RECFLOW_XLA_CACHE", d)
    assert enable_compilation_cache() == d
    assert os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d
    # explicit path argument beats nothing but yields the arg when unset
    jax.config.update("jax_compilation_cache_dir", None)
    monkeypatch.delenv("RECFLOW_XLA_CACHE", raising=False)
    d2 = str(tmp_path / "arg_cache")
    assert enable_compilation_cache(d2) == d2
