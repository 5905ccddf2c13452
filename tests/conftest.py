"""Test configuration: force an 8-virtual-device CPU platform so sharding and
collective paths can be exercised without TPU hardware (SURVEY.md §4).

Note: this environment preloads a TPU PJRT plugin via sitecustomize that
overrides JAX_PLATFORMS, so we must switch platforms through jax.config (which
takes effect as long as no backend has been initialized yet — conftest runs
before any test imports touch devices).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the e2e tests compile the full train step;
# caching cuts re-runs from ~17 min to ~2 min.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
