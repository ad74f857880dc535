"""Sweep fused TRAIN field kernel tile sizes on the real chip.

The train backward runs at ~73% of the pallas chain ceiling (VALIDATION.md
round-3 decomposition). tile_bwd=512 was chosen by the round-2 sweep BEFORE
the bf16 activation stash (ecd317b) halved the stash's VMEM footprint —
this re-sweeps fwd/bwd tiles at the published batch-48 shape with the
current kernels. Isolates the field fwd+bwd (sum-loss cotangents, grads to
weights + codes + encodings, exactly the train-step gradient surface).

Usage: python scripts/sweep_train_tiles.py  (idle chip; ~3 min compile per
config through the tunnel, cached on re-runs).
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
from supnerf_tpu.ops.pallas_field import (
    field_train_pallas, pack_decoder_params,
)

B = int(os.environ.get("SWEEP_BATCH", "48"))
R, S = 1024, 64
N_ITERS = int(os.environ.get("SWEEP_ITERS", "5"))

model = build_model("supnerf", PUBLISHED_NET_HP)
variables = init_model_variables(model, jax.random.PRNGKey(0), img_size=128)
packed = pack_decoder_params(variables["params"]["decoder"], 3, 1)

key = jax.random.PRNGKey(1)
xyz = jax.random.normal(key, (B, R * S, 3))
vd = jax.random.normal(jax.random.fold_in(key, 1), (B, R * S, 3))
sc = jax.random.normal(jax.random.fold_in(key, 2), (B, 256)) * 0.1
tc = jax.random.normal(jax.random.fold_in(key, 3), (B, 256)) * 0.1

# 27.5 "256x256 matmul units"/point for fwd+bwd incl. weight grads
# (VALIDATION.md round-3 arithmetic); ceiling 104 TF/s measured.
UNITS = 27.5
FLOP_PER_POINT = UNITS * 2 * 256 * 256
CEIL_TFLOPS = 104.0


def run_config(tf, tb):
    def loss(packed_, sc_, tc_, xyz_, vd_):
        sig, rgb = field_train_pallas(
            packed_, xyz_, vd_, sc_, tc_, tile_fwd=tf, tile_bwd=tb)
        return jnp.sum(sig) * 1e-6 + jnp.sum(rgb) * 1e-6

    grad_fn = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def timed(packed_, sc_, tc_, xyz_, vd_):
        def body(i, acc):
            g, gs, gt = grad_fn(packed_, sc_, tc_,
                                xyz_ + acc * 1e-20, vd_)
            return acc + gs.mean() + gt.mean() + g["w_xyz"][0].mean()

        return jax.lax.fori_loop(0, N_ITERS, body, jnp.float32(0.0))

    try:
        w0 = float(timed(packed, sc + 0.01, tc, xyz, vd))
        t0 = time.perf_counter()
        v0 = float(timed(packed, sc, tc, xyz, vd))
        dt = time.perf_counter() - t0
        if not (v0 == v0 and w0 == w0):
            raise FloatingPointError("NaN result")
    except Exception as e:  # VMEM overflow -> report and continue
        print(f"tile_fwd={tf:5d} tile_bwd={tb:5d}  FAILED: "
              f"{type(e).__name__}: {str(e)[:200]}")
        return
    pts_per_sec = B * R * S * N_ITERS / dt
    tflops = pts_per_sec * FLOP_PER_POINT / 1e12
    print(f"tile_fwd={tf:5d} tile_bwd={tb:5d}  {dt/N_ITERS*1000:7.1f} ms/step"
          f"  {pts_per_sec/1e6:6.2f} Mpt/s  {tflops:6.1f} TF/s"
          f"  vs_ceiling={tflops/CEIL_TFLOPS:.3f}")


if __name__ == "__main__":
    configs = os.environ.get(
        "SWEEP_CONFIGS", "1024:512,1024:1024,2048:1024,2048:2048")
    for pair in configs.split(","):
        tf, tb = (int(x) for x in pair.split(":"))
        run_config(tf, tb)
