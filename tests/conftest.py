"""Test configuration: force an 8-device virtual CPU platform so multi-chip
sharding paths can be exercised without TPU hardware.

This must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep matmuls at full fp32 precision on CPU for golden-parity tests.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
