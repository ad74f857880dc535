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
# persistent compilation cache: the suite runs on a 1-CPU host where XLA
# compiles (incl. interpret-mode Pallas programs) dominate wall time; repeat
# runs skip them entirely. Keyed by program+platform, so code changes simply
# miss and recompile. Directory is gitignored.
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
