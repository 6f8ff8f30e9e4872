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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
