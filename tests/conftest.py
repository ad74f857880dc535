"""Test configuration: force an 8-device virtual CPU mesh so parallel code paths
(data-parallel pjit, vmapped TTO sharding) are exercised without TPU hardware.

NOTE: this environment pre-imports jax and registers a TPU backend via
sitecustomize, and exports JAX_PLATFORMS=axon — so env-var overrides at import
time are too late. jax.config.update works because the backend client is only
instantiated at first use.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
