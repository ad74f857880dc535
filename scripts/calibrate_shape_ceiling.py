"""Measure the decoder's matmul SHAPE CEILING on the attached TPU.

Runs the published 9-layer chain (63->256, 3x 256->256 shape blocks,
encoding_shape, sigma 256->1, split viewdir 283->256, texture 256->256,
rgb 256->128->3) as a weights-in-VMEM Pallas kernel in three variants:

  A. pure bf16 matmuls (no bias/relu)        -> the MXU ceiling at these shapes
  B. + bias/relu/softplus, f32 activations   -> shows the VPU work hides
  C. the same chain in plain XLA             -> what jit alone achieves

The A number is the denominator behind `extra.vs_shape_ceiling` in bench.py
(BASELINE.md "Roofline note"): these K,N <= 256 widths cannot reach the
chip's nominal bf16 peak, so kernel quality must be judged against the
measured ceiling, not 197 TF/s. Round-2 v5e: A = 1.81M rays/s = 104 TFLOP/s.

All weights are passed as kernel operands (never closed into jit).
"""
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024
M = int(os.environ.get("CALIB_POINTS", 32 * 65536))
assert M % TILE == 0 and M > 0, "CALIB_POINTS must be a positive multiple of 1024"
N_ITER = int(os.environ.get("CALIB_ITERS", "20"))
FLOP_PER_POINT = 2 * (63 * 256 + 3 * 256 * 256 + 256 * 256 + 256
                      + 283 * 256 + 256 * 256 + 256 * 128 + 128 * 3)

key = jax.random.PRNGKey(0)
x0 = jax.random.normal(key, (M, 63), jnp.bfloat16)
dpe = jax.random.normal(key, (M, 27), jnp.bfloat16)
_SHAPES = {"w0": (63, 256), "w1": (256, 256), "w2": (256, 256),
           "w3": (256, 256), "w4": (256, 256), "wsg": (256, 1),
           "wva": (256, 256), "wvb": (27, 256), "w5": (256, 256),
           "w6": (256, 128), "w7": (128, 3)}
Ws = {k: jax.random.normal(key, s, jnp.bfloat16) * 0.1
      for k, s in _SHAPES.items()}
ORDER = list(Ws)


def chain_pure(x, d, *ws):
    f32 = jnp.float32
    mm = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=f32
    ).astype(jnp.bfloat16)
    w = dict(zip(ORDER, ws))
    y = mm(x, w["w0"])
    y = mm(y, w["w1"]); y = mm(y, w["w2"]); y = mm(y, w["w3"]); y = mm(y, w["w4"])
    sg = mm(y, w["wsg"])
    h = mm(y, w["wva"]) + mm(d, w["wvb"])
    h = mm(h, w["w5"]); h = mm(h, w["w6"])
    rgb = mm(h, w["w7"])
    return sg.astype(f32), rgb.astype(f32)


def chain_full(x, d, *ws):
    f32 = jnp.float32
    mm = lambda a, b: jax.lax.dot_general(
        a.astype(jnp.bfloat16), b, (((1,), (0,)), ((), ())),
        preferred_element_type=f32)
    relu = lambda v: jnp.maximum(v, 0)
    w = dict(zip(ORDER, ws))
    y = relu(mm(x, w["w0"]) + 0.01)
    y = relu(mm(y, w["w1"]) + 0.01); y = relu(mm(y, w["w2"]) + 0.01)
    y = relu(mm(y, w["w3"]) + 0.01); y = mm(y, w["w4"]) + 0.01
    sg = jax.nn.softplus(mm(y, w["wsg"]))
    h = relu(mm(y, w["wva"]) + mm(d.astype(f32), w["wvb"]) + 0.01)
    h = relu(mm(h, w["w5"]) + 0.01); h = relu(mm(h, w["w6"]) + 0.01)
    rgb = mm(h, w["w7"])
    return sg, rgb


def make_pallas(chain):
    def kernel(x_ref, d_ref, *rest):
        ws = [r[:] for r in rest[:-2]]
        sg, rgb = chain(x_ref[:], d_ref[:], *ws)
        rest[-2][:] = sg
        rest[-1][:] = rgb

    tile_spec = lambda d: pl.BlockSpec((TILE, d), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(M // TILE,),
        in_specs=[tile_spec(63), tile_spec(27)] + [full()] * len(ORDER),
        out_specs=[tile_spec(1), tile_spec(3)],
        out_shape=[jax.ShapeDtypeStruct((M, 1), jnp.float32),
                   jax.ShapeDtypeStruct((M, 3), jnp.float32)],
    )


def bench(name, fn):
    @jax.jit
    def loop(x, d, *ws):
        def body(i, acc):
            sg, rgb = fn(x * (1 + 1e-6 * i).astype(x.dtype), d, *ws)
            return acc + sg.mean() + rgb.mean()

        return jax.lax.fori_loop(0, N_ITER, body, jnp.float32(0.0))

    args = (x0, dpe) + tuple(Ws[k] for k in ORDER)
    jax.block_until_ready(loop(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(loop(*args))
    dt = time.perf_counter() - t0
    pts = M * N_ITER / dt
    print(f"{name}: {pts / 64:,.0f} rays/s-equiv, "
          f"{pts * FLOP_PER_POINT / 1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    variants = sys.argv[1:] or ["pure", "full", "xla"]
    if "pure" in variants:
        bench("A pallas pure-matmul bf16", lambda x, d, *w: make_pallas(chain_pure)(x, d, *w))
    if "full" in variants:
        bench("B pallas full-structure  ", lambda x, d, *w: make_pallas(chain_full)(x, d, *w))
    if "xla" in variants:
        bench("C xla chain              ", chain_full)
