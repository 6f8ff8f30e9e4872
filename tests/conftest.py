"""Test configuration: force a virtual 8-device CPU mesh.

Must run before jax is imported anywhere; pytest imports conftest first.
"""

import os

# Force CPU: the ambient environment may point JAX_PLATFORMS at a real TPU
# (axon), but tests must run hermetically on a virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = os.environ.get("LSDM_TEST_PLATFORM", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
