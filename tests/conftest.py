"""Test configuration: run on CPU with 8 virtual devices so multi-chip
sharding tests (standing in for a v5e-8) work without TPU hardware."""

import os

# Belt: classic env vars (honored by plain jax installs).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Suspenders: this image's TPU plugin rewrites JAX_PLATFORMS to "axon,cpu",
# so force the CPU platform + 8 virtual devices through the config API
# before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)
