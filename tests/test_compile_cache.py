"""Persistent XLA compile cache (cli/common.enable_compile_cache):
default-on for every CLI/bench/driver entry; measured 4.1s -> 0.4s
EDSR-b cold start on the TPU here. Pins the env contract and that
compiles actually land in the directory."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from larvanet_tpu.cli import common


def _restore(old_dir, old_min, old_entry=None):
    jax.config.update("jax_compilation_cache_dir", old_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", old_min)
    if old_entry is not None:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", old_entry)


def test_env_path_and_disable(tmp_path, monkeypatch):
    old_dir = jax.config.jax_compilation_cache_dir
    old_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        monkeypatch.setenv("LVT_COMPILE_CACHE", str(tmp_path))
        assert common.enable_compile_cache() == str(tmp_path)
        assert jax.config.jax_compilation_cache_dir == str(tmp_path)

        monkeypatch.setenv("LVT_COMPILE_CACHE", "")
        assert common.enable_compile_cache() is None  # explicit opt-out
    finally:
        _restore(old_dir, old_min)


def test_compiles_land_in_cache(tmp_path, monkeypatch):
    old_dir = jax.config.jax_compilation_cache_dir
    old_min = jax.config.jax_persistent_cache_min_compile_time_secs
    old_entry = jax.config.jax_persistent_cache_min_entry_size_bytes
    try:
        monkeypatch.setenv("LVT_COMPILE_CACHE", str(tmp_path))
        common.enable_compile_cache()
        # CPU compiles are sub-second; drop the time threshold to observe
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        # The cache instance is created lazily on first compile and then
        # pinned for the process; earlier suite tests may have initialized
        # it against the old dir, so reset it to pick up tmp_path.
        from jax._src import compilation_cache as _cc

        _cc.reset_cache()

        f = jax.jit(lambda x: jnp.tanh(x @ x) + x)
        f(np.ones((64, 64), np.float32)).block_until_ready()
        assert len(os.listdir(tmp_path)) >= 1
    finally:
        _restore(old_dir, old_min, old_entry)
