"""Persistent-cache helper (utils/cache.py): resolution order, no-override,
opt-out."""

import jax
import pytest

from busca_tpu.utils.cache import enable_persistent_cache


@pytest.fixture(autouse=True)
def _restore_cache_dir():
    before = jax.config.jax_compilation_cache_dir
    yield
    jax.config.update("jax_compilation_cache_dir", before)


def test_respects_already_configured_dir():
    # conftest points the cache at the repo-local .jax_cache; a bare call
    # must keep it (tests/bench invoke CLI mains in-process)
    before = jax.config.jax_compilation_cache_dir
    assert before  # set by tests/conftest.py
    assert enable_persistent_cache() == before
    assert jax.config.jax_compilation_cache_dir == before


def test_explicit_path_wins(tmp_path):
    p = str(tmp_path / "cache")
    assert enable_persistent_cache(p) == p
    assert jax.config.jax_compilation_cache_dir == p


def test_env_opt_out(tmp_path, monkeypatch):
    monkeypatch.setenv("BUSCA_JAX_CACHE", "0")
    assert enable_persistent_cache(str(tmp_path / "x")) is None


def test_env_path_used_when_unset(tmp_path, monkeypatch):
    monkeypatch.setenv("BUSCA_JAX_CACHE", str(tmp_path / "envcache"))
    jax.config.update("jax_compilation_cache_dir", None)
    got = enable_persistent_cache()
    assert got == str(tmp_path / "envcache")
    assert jax.config.jax_compilation_cache_dir == got
