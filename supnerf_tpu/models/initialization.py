"""Whole-model variable initialization.

flax.linen initializes only the sub-modules reached by the traced method, so a
model used through several entry points (encode_img / pose_update / field) needs
one init pass that touches all of them — this is what checkpoints store and what
trainers and test-time optimizers consume.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from supnerf_tpu.models.autorf import AutoRF, AutoRFMix
from supnerf_tpu.models.codenerf import CodeNeRF
from supnerf_tpu.models.supnerf import SUPNeRF


def init_model_variables(model, key, img_size: int = 128):
    """Initialize ALL parameter/batch-stat collections of a model in one pass.

    Returns the full variables dict {'params': ..., 'batch_stats': ...} usable
    with every apply method of the model.
    """
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

    return model.init(key, method=init_fn)


def param_count(variables) -> int:
    return sum(int(jnp.size(p)) for p in jax.tree.leaves(variables["params"]))
