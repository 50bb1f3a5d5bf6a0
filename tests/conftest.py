"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-device sharding tests use XLA's host-platform device-count override —
the standard fake-backend trick for exercising pjit/shard_map collectives
without TPU hardware.  Must run before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# persistent compilation cache: amortizes the (slow) CPU op compiles across
# test runs on this small host (disable with SBT_NO_JAX_CACHE=1)
if not os.environ.get("SBT_NO_JAX_CACHE"):
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
