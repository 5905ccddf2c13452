"""Persistent XLA compilation cache.

Compiles on this TPU backend go through a remote-compile relay and take
minutes for the full model; the persistent cache cuts warm starts by ~3-4x.
Call `enable_compilation_cache()` before the first jit (bench.py, demo.py and
the run scripts all do).
"""
from __future__ import annotations

import os

import jax

DEFAULT_CACHE_DIR = os.environ.get("FUTURE_OD_JAX_CACHE", "/root/.jax_tpu_cache")

_enabled = False


def enable_compilation_cache(cache_dir: str = DEFAULT_CACHE_DIR) -> None:
    global _enabled
    if _enabled:
        return
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        _enabled = True
    except Exception as exc:  # pragma: no cover - config name drift
        print(f"compilation cache unavailable: {exc}")
