"""Test configuration: force an 8-device virtual CPU platform so multi-chip
sharding paths can be exercised without TPU hardware.

This must run before jax is imported anywhere.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the TPU plugin;
# golden-parity tests need deterministic f32 and 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep matmuls at full fp32 precision on CPU for golden-parity tests.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

# The container's sitecustomize imports jax and registers the TPU plugin
# before conftest runs, so env vars alone are not enough — override the
# platform through the config API as well.
import jax

jax.config.update("jax_platforms", "cpu")
# The suite is XLA-compile-bound on a 1-core CI box; skip XLA's expensive
# optimization passes — semantics (and golden-parity numerics) are
# unchanged, compiles are ~35% faster.
jax.config.update("jax_disable_most_optimizations", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
