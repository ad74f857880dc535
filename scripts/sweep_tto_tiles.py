"""Sweep the fused TTO render kernel tile sizes on the real chip.

The TTO loss render's backward (_render_bwd_kernel) has NO weight-grad
accumulators — a different VMEM budget from the train kernels whose sweep
chose the shared tile_bwd=512 default — and the train-render sweep showed
that freeing VMEM makes larger backward tiles both compile and win
(VALIDATION.md round 3). This measures the full device TTO loop
(bench.py's bench_tto protocol: encode + refine + 100 Adam iters at
16 objects x 1024 rays x 64 samples) with overridden tiles by wrapping
resolve_decoder_kernel_config.

Usage: python scripts/sweep_tto_tiles.py   (idle chip).
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

import supnerf_tpu.ops.pallas_field as pf
from supnerf_tpu.data.synthetic import PUBLISHED_NET_HP, make_object_batch
from supnerf_tpu.models import build_model, init_model_variables
from supnerf_tpu.tto.core import ObjectBatch, TTOConfig, run_tto_batch

B = int(os.environ.get("SWEEP_OBJECTS", "16"))

model = build_model("supnerf", PUBLISHED_NET_HP)
variables = init_model_variables(model, jax.random.PRNGKey(0), img_size=128)
raw, _ = make_object_batch(B, seed=0, in_img_sz=128, render_im_sz=32,
                           n_lidar=256)
batch = ObjectBatch(**{k: jnp.asarray(v) for k, v in raw.items()})
zeros = jnp.zeros(256)
cfg = TTOConfig(field_impl="pallas")

_orig_resolve = pf.resolve_decoder_kernel_config


def run_config(tf, tb):
    def patched(model_, variables_):
        packed, kw = _orig_resolve(model_, variables_)
        return packed, {**kw, "tile_fwd": tf, "tile_bwd": tb}

    pf.resolve_decoder_kernel_config = patched
    try:
        fn = jax.jit(lambda v, b, k: run_tto_batch(model, v, b, zeros, zeros,
                                                   cfg, k))
        jax.block_until_ready(fn(variables, batch, jax.random.PRNGKey(0)))
        t0 = time.perf_counter()
        jax.block_until_ready(fn(variables, batch, jax.random.PRNGKey(1)))
        dt = time.perf_counter() - t0
        print(f"tile {tf:5d}:{tb:5d}  {dt:7.3f} s/batch  "
              f"{B / dt * 60:7.1f} obj/min")
        return dt
    except Exception as e:  # noqa: BLE001 - report compile failures per config
        print(f"tile {tf:5d}:{tb:5d}  FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}")
        return None
    finally:
        pf.resolve_decoder_kernel_config = _orig_resolve


if __name__ == "__main__":
    for tf, tb in [(1024, 512), (1024, 1024), (1024, 2048), (2048, 1024)]:
        run_config(tf, tb)
