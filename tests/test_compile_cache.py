"""Persistent-compilation-cache utility (sgmse_tpu/utils/compile_cache.py)."""
import os

import jax

from sgmse_tpu.utils.compile_cache import enable_persistent_cache


def test_enable_sets_cache_dir(tmp_path, monkeypatch):
    monkeypatch.delenv("SGMSE_TPU_COMPILE_CACHE", raising=False)
    d = str(tmp_path / "xla")
    out = enable_persistent_cache(d)
    assert out == d
    assert os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d


def test_env_var_opt_out(monkeypatch):
    monkeypatch.setenv("SGMSE_TPU_COMPILE_CACHE", "0")
    assert enable_persistent_cache() is None


def test_env_var_sets_dir(tmp_path, monkeypatch):
    d = str(tmp_path / "envcache")
    monkeypatch.setenv("SGMSE_TPU_COMPILE_CACHE", d)
    assert enable_persistent_cache() == d
    assert os.path.isdir(d)


def test_multiprocess_disabled_by_default(tmp_path, monkeypatch):
    """An asymmetric cache hit across ranks blows the 30s Gloo context-init
    deadline, so multi-process runs must not enable the cache implicitly —
    only via the explicit env var / argument opt-ins."""
    monkeypatch.delenv("SGMSE_TPU_COMPILE_CACHE", raising=False)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    assert enable_persistent_cache() is None
    d = str(tmp_path / "optin")
    monkeypatch.setenv("SGMSE_TPU_COMPILE_CACHE", d)
    assert enable_persistent_cache() == d
