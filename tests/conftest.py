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

# Model init: the product code jits the whole-model init so it lands in the
# TPU persistent compile cache (supnerf_tpu/models/initialization.py). On the
# 1-CPU CI host that trade inverts: the suite builds MANY distinct
# (model, img_size) configs in ONE process, and each jitted init pays a
# ~20-30 s cold compile, while EAGER flax init amortizes the op-by-op jit
# cache across configs (measured: 20.8 s for the first eager init, 2.7-7.6 s
# for each further config). Route the init module's jax.jit to identity here
# — tests-only; the TPU path and its committed compile cache are untouched.
from supnerf_tpu.models import initialization as _init_mod  # noqa: E402


class _EagerJitJax:
    """Proxy for the init module's `jax` global with jit as identity."""

    @staticmethod
    def jit(fn, *_args, **_kw):
        # accepts jax.jit's positional forms too (e.g. jit(fn, static_argnums))
        # so a future positional call in initialization.py doesn't raise a
        # tests-only TypeError
        return fn

    def __getattr__(self, name):
        return getattr(jax, name)


_init_mod.jax = _EagerJitJax()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
