"""Sweep the fused TRAIN render kernel (field+compositing,
ops/pallas_render.field_composite_train_pallas) tile sizes on the real chip.

Isolates the render fwd+bwd exactly as the train step drives it (per-ray
loss cotangents on rgb/depth/acc; grads to weights + codes), at the
published batch-48 shape. The pre-fusion analog (field-only, compositing in
XLA) is scripts/sweep_train_tiles.py at 125.1 ms/step.

Usage: python scripts/sweep_train_render_tiles.py  (idle chip; ~3 min
compile per config through the tunnel, cached on re-runs).
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

from supnerf_tpu.data.synthetic import PUBLISHED_NET_HP
from supnerf_tpu.models import build_model, init_model_variables
from supnerf_tpu.ops.pallas_field import pack_decoder_params
from supnerf_tpu.ops.pallas_render import field_composite_train_pallas

B = int(os.environ.get("SWEEP_BATCH", "48"))
R, S = 1024, 64
N_ITERS = int(os.environ.get("SWEEP_ITERS", "5"))

model = build_model("supnerf", PUBLISHED_NET_HP)
variables = init_model_variables(model, jax.random.PRNGKey(0), img_size=128)
packed = pack_decoder_params(variables["params"]["decoder"], 3, 1)

key = jax.random.PRNGKey(1)
vd = jax.random.normal(key, (B, R, 3))
vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
z_vals = jnp.linspace(2.0, 6.0, S)[None, :] * jnp.ones((B, 1))
xyz = vd[:, :, None, :] * z_vals[:, None, :, None] * 0.3
sc = jax.random.normal(jax.random.fold_in(key, 2), (B, 256)) * 0.1
tc = jax.random.normal(jax.random.fold_in(key, 3), (B, 256)) * 0.1


def run_config(tf, tb):
    def loss(packed_, sc_, tc_):
        rgb, depth, acc = field_composite_train_pallas(
            packed_, xyz, vd, z_vals, sc_, tc_, tile_fwd=tf, tile_bwd=tb)
        return jnp.sum(rgb) * 1e-6 + jnp.sum(depth) * 1e-7 + jnp.sum(acc) * 1e-7

    grad_fn = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def loop(packed_, sc_, tc_):
        def body(i, carry):
            p, s, t = carry
            gp, gs, gt = grad_fn(p, s, t)
            p = jax.tree.map(lambda a, g: a - 0.0 * g, p, gp)
            return p, s - 0.0 * gs, t - 0.0 * gt

        return jax.lax.fori_loop(0, N_ITERS, body, (packed_, sc_, tc_))

    try:
        out = jax.block_until_ready(loop(packed, sc, tc))
        t0 = time.perf_counter()
        out = jax.block_until_ready(loop(*out[:1], sc, tc) if False
                                    else loop(packed, sc, tc))
        dt = (time.perf_counter() - t0) / N_ITERS
        pts = B * R * S
        print(f"tile {tf:5d}:{tb:5d}  {dt * 1e3:8.2f} ms/step  "
              f"{pts / dt / 1e6:7.2f} Mpt/s")
        return dt
    except Exception as e:  # noqa: BLE001 - report compile failures per config
        print(f"tile {tf:5d}:{tb:5d}  FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}")
        return None


if __name__ == "__main__":
    configs = [(1024, 2048), (2048, 1024), (2048, 2048), (4096, 1024)]
    for tf, tb in configs:
        run_config(tf, tb)
