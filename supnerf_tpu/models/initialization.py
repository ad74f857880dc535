"""Whole-model variable initialization.

flax.linen initializes only the sub-modules reached by the traced method, so a
model used through several entry points (encode_img / pose_update / field) needs
one init pass that touches all of them — this is what checkpoints store and what
trainers and test-time optimizers consume.

The init runs as ONE jitted program and the result is memoized per
(model, key, img_size): eager flax init dispatches the ResNet+MLP graph op by
op (~24 s on this 1-CPU host, measured for the TINY test model) and is re-paid
by every process and every test that builds a state; the jitted program lands
in the persistent compilation cache instead, and in-process repeats are free.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from supnerf_tpu.models.autorf import AutoRF, AutoRFMix
from supnerf_tpu.models.codenerf import CodeNeRF
from supnerf_tpu.models.supnerf import SUPNeRF


def make_init_fn(model, img_size: int):
    """The per-model-family init method: touches EVERY entry point (encoder /
    pose refiner / field) so one `model.init(key, method=init_fn)` yields the
    full variables dict. Shared by the cached jitted init below and by tests
    that eval_shape the published param count — one source of truth for which
    entry points the init covers."""
    latent = getattr(model, "latent_dim", 256)
    xyz = jnp.zeros((1, 1, 3), jnp.float32)
    code = jnp.zeros((latent,), jnp.float32)
    img = jnp.zeros((1, img_size, img_size, 3), jnp.float32)

    if isinstance(model, SUPNeRF):

        def init_fn(mdl):
            mdl.encode_img(img, True)
            mdl.pose_update(jnp.zeros((1, latent)), jnp.zeros((1, 16)))
            return mdl(xyz, xyz, code, code)

    elif isinstance(model, (AutoRF, AutoRFMix)):

        def init_fn(mdl):
            mdl.encode_img(img, True)
            return mdl(xyz, xyz, code, code)

    elif isinstance(model, CodeNeRF):

        def init_fn(mdl):
            return mdl(xyz, xyz, code, code)

    else:
        raise TypeError(f"Unknown model type: {type(model)}")

    return init_fn


@functools.lru_cache(maxsize=8)
def _init_variables_cached(model, key_bytes: bytes, img_size: int):
    init_fn = make_init_fn(model, img_size)
    key = jnp.asarray(np.frombuffer(key_bytes, np.uint32).copy())
    return jax.jit(lambda k: model.init(k, method=init_fn))(key)


def init_model_variables(model, key, img_size: int = 128):
    """Initialize ALL parameter/batch-stat collections of a model in one pass.

    Returns the full variables dict {'params': ..., 'batch_stats': ...} usable
    with every apply method of the model. Container dicts are fresh per call
    (callers may restructure them); the arrays are shared with the memo, which
    is safe because jax arrays are immutable.
    """
    if hasattr(key, "dtype") and jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        key_data = np.asarray(jax.random.key_data(key), np.uint32)
    else:
        key_data = np.asarray(key, np.uint32)   # raw (2,) uint32 PRNGKey
    try:
        cached = _init_variables_cached(model, key_data.tobytes(),
                                        int(img_size))
    except TypeError:
        # unhashable model (unexpected field type): fall back to uncached
        return _init_variables_cached.__wrapped__(model, key_data.tobytes(),
                                                  int(img_size))
    return jax.tree.map(lambda x: x, cached)


def param_count(variables) -> int:
    return sum(int(jnp.size(p)) for p in jax.tree.leaves(variables["params"]))
