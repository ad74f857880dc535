"""Measure the TTO per-phase decomposition on the real chip (BASELINE.md
"TTO roofline" / VERDICT round-4 weak #2).

The 100-iteration TTO program is ONE jitted XLA program (tto/core.py
run_tto_batch), so phases cannot be timed inside it; instead this times
program VARIANTS at the bench protocol (16 objects, published shapes,
field_impl=pallas) and solves for the components:

  T(num_opts=100) - T(num_opts=50)  ->  per-iteration cost `a` (x2/50)
  T(100) - 100a                     ->  fixed overhead `b` (encoder, refiner,
                                        pose init, result pack, dispatch)
  T(n_lidar=256) - T(n_lidar=8)     ->  lidar metric render slope; x256/248
                                        gives the full lidar phase per iter
  loss-render forward per iter      ->  16*1024 rays / measured render rays/s
                                        (bench render stage, same kernel)
  loss-render backward              ->  2x forward by FLOPs (recompute +
                                        transposed chain; BASELINE.md)
  residual                          ->  a - lidar - 3x fwd = sampling + PE +
                                        Adam + compositing VJP + refiner
                                        replay per iter

Run on an idle chip: python scripts/profile_tto_phases.py
Env: PHASE_OBJECTS (default 16), PHASE_RENDER_RAYS_PER_SEC (default from
the latest BENCH artifact's render value, fallback 1.857e6).
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

import jax.numpy as jnp
import numpy as np

from supnerf_tpu.data.synthetic import PUBLISHED_NET_HP, make_object_batch
from supnerf_tpu.models import build_model, init_model_variables
from supnerf_tpu.tto.core import ObjectBatch, TTOConfig, run_tto_batch

B = int(os.environ.get("PHASE_OBJECTS", "16"))
RENDER_RAYS_PER_SEC = float(os.environ.get("PHASE_RENDER_RAYS_PER_SEC",
                                           "1.857e6"))

model = build_model("supnerf", PUBLISHED_NET_HP)
variables = init_model_variables(model, jax.random.PRNGKey(0), img_size=128)
raw, _ = make_object_batch(B, seed=0, in_img_sz=128, render_im_sz=32,
                           n_lidar=256)
batch = ObjectBatch(**{k: jnp.asarray(v) for k, v in raw.items()})
zeros = jnp.zeros(256)


def timed(cfg, tag):
    fn = jax.jit(lambda v, b, k: run_tto_batch(model, v, b, zeros, zeros,
                                               cfg, k))
    t0 = time.perf_counter()
    jax.block_until_ready(fn(variables, batch, jax.random.PRNGKey(0))["psnr"])
    print(f"  [{tag}] compile+warmup {time.perf_counter() - t0:.1f} s",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    jax.block_until_ready(fn(variables, batch, jax.random.PRNGKey(1))["psnr"])
    dt = time.perf_counter() - t0
    print(f"  [{tag}] timed {dt:.3f} s", file=sys.stderr, flush=True)
    return dt


base = TTOConfig(field_impl="pallas")
T_100 = timed(base, "num_opts=100 n_lidar=256")
T_50 = timed(dataclasses.replace(base, num_opts=50), "num_opts=50")
T_l8 = timed(dataclasses.replace(base, n_lidar=8), "n_lidar=8")

a = (T_100 - T_50) / 50                    # s per iteration (batch of B)
b = T_100 - 100 * a                        # fixed overhead per batch
lidar_slope = (T_100 - T_l8) / 100 / (256 - 8)
lidar = lidar_slope * 256                  # lidar metric render per iter
fwd = B * 1024 / RENDER_RAYS_PER_SEC       # loss render fwd per iter
bwd = 2 * fwd                              # recompute + transposed chain
residual = a - lidar - fwd - bwd           # sampling+PE+Adam+VJP+replay

obj_per_min = B / T_100 * 60
report = {
    "batch_objects": B,
    "T_100_s": round(T_100, 3),
    "tto_objects_per_min": round(obj_per_min, 1),
    "per_iter_ms_batch": round(a * 1e3, 2),
    "fixed_overhead_ms_batch": round(b * 1e3, 1),
    "phase_ms_per_iter": {
        "loss_render_fwd(est. from render stage)": round(fwd * 1e3, 2),
        "loss_render_bwd(2x fwd by FLOPs)": round(bwd * 1e3, 2),
        "lidar_metric_render(measured slope)": round(lidar * 1e3, 2),
        "residual(sampling+PE+Adam+composite VJP+replay)":
            round(residual * 1e3, 2),
    },
    "render_rays_per_sec_used": RENDER_RAYS_PER_SEC,
}
print(json.dumps(report, indent=2))
