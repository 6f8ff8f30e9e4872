"""Test configuration: force a virtual 8-device CPU mesh.

The environment boots an ``axon`` TPU backend from sitecustomize at
interpreter startup (before any conftest code), so setting JAX_PLATFORMS
here is too late — but backends initialize lazily, so
``jax.config.update('jax_platforms', 'cpu')`` before the first device op
reliably pins tests to the virtual CPU mesh.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = os.environ.get("LSDM_TEST_PLATFORM", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# Persistent compilation cache: the suite is compile-dominated (~1000 s cold);
# warm reruns skip recompilation entirely (VERDICT r01 weak-item 7).
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("LSDM_TEST_CACHE",
                                 os.path.expanduser("~/.cache/jax_comp_tests")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def cli_env() -> dict:
    """Environment for subprocess CLI tests: share the persistent compile
    cache so warm e2e reruns skip XLA compilation (the dominant cost)."""
    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = os.environ.get(
        "LSDM_TEST_CACHE", os.path.expanduser("~/.cache/jax_comp_tests"))
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.5"
    env["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "-1"
    return env


@pytest.fixture
def rng():
    return np.random.RandomState(0)
