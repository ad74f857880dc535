"""Probe: per-tensor optax AdamW vs a flat-vector AdamW on the 49M-param
SUPNeRF tree (the train step's optimizer slice, measured 7.7 ms/step in the
round-3 decomposition vs ~1.7 ms of pure HBM traffic).

Run on the idle real chip: python scripts/probe_opt_flat.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

from supnerf_tpu.data.synthetic import PUBLISHED_NET_HP
from supnerf_tpu.models import build_model, init_model_variables

N_ITERS = 20

model = build_model("supnerf", PUBLISHED_NET_HP)
variables = init_model_variables(model, jax.random.PRNGKey(0), img_size=128)
params = variables["params"]
grads = jax.tree.map(lambda a: jnp.full_like(a, 1e-6), params)
n = sum(x.size for x in jax.tree.leaves(params))
print(f"params: {n/1e6:.1f}M")


def timed(fn, carry, g, label):
    # grads passed as a jit ARG (closing 49M params into jit embeds them as
    # MLIR constants and exhausts the backend — CLAUDE.md gotcha)
    loop = jax.jit(lambda c, g_: jax.lax.fori_loop(
        0, N_ITERS, lambda i, c_: fn(i, c_, g_), c))
    out = jax.block_until_ready(loop(carry, g))
    t0 = time.perf_counter()
    jax.block_until_ready(loop(out, g))
    dt = (time.perf_counter() - t0) / N_ITERS
    print(f"{label:12s} {dt*1e3:7.2f} ms/step")


# (a) per-tensor optax adamw (the train step's tx_model configuration)
tx = optax.adamw(1e-4, weight_decay=1e-2)
opt0 = tx.init(params)


def body_tree(i, carry, g):
    p, o = carry
    upd, o = tx.update(g, o, p)
    return optax.apply_updates(p, upd), o


timed(body_tree, (params, opt0), grads, "optax-tree")

# (b) flat-vector adamw: identical math on one contiguous vector
flat, unravel = ravel_pytree(params)
gflat, _ = ravel_pytree(grads)
b1, b2, eps, lr, wd = 0.9, 0.999, 1e-8, 1e-4, 1e-2


def body_flat(i, carry, g):
    p, m, v, t = carry
    t = t + 1
    m = b1 * m + (1 - b1) * g
    v = b2 * v + (1 - b2) * g * g
    mh = m / (1 - b1 ** t)
    vh = v / (1 - b2 ** t)
    p = p - lr * (mh / (jnp.sqrt(vh) + eps) + wd * p)
    return p, m, v, t


timed(body_flat, (flat, jnp.zeros_like(flat), jnp.zeros_like(flat),
                  jnp.zeros((), jnp.int32)), gflat, "flat-vector")

# (c) flat + unravel back to the tree each step (what a real step would pay)


def body_flat_unravel(i, carry, g):
    p, m, v, t = body_flat(i, carry, g)
    tree = unravel(p)
    # keep a data dependency on the tree so unravel isn't DCE'd
    p = p + 0.0 * jax.tree.leaves(tree)[0].ravel()[0]
    return p, m, v, t


timed(body_flat_unravel, (flat, jnp.zeros_like(flat), jnp.zeros_like(flat),
                          jnp.zeros((), jnp.int32)), gflat, "flat+unravel")

# (d) the EXACT train-step optimizer (_make_optimizers: schedule + optional
# clip), grads as a jit arg — the profile script's opt_only closed grads into
# jit (MLIR constants), so its 7.7 ms may be a measurement artifact
from supnerf_tpu.training.train_step import TrainConfig, _make_optimizers

cfg = TrainConfig(latent_dim=256, field_impl="pallas")
tx_m, _ = _make_optimizers(cfg)
print(f"grad_clip={cfg.grad_clip}")
opt_m0 = tx_m.init(params)


def body_exact(i, carry, g):
    p, o = carry
    upd, o = tx_m.update(g, o, p)
    return optax.apply_updates(p, upd), o


timed(body_exact, (params, opt_m0), grads, "exact-tx")
