"""Benchmark: renderer throughput (rays/sec/chip) on the TTO hot path.

Runs the published SUPNeRF decoder configuration (W=256, shape_blocks=3,
texture_blocks=1, PE 10/4) through the full per-iteration render:
stratified sampling -> PE -> conditioned MLP -> alpha compositing, batched
across objects exactly as the vmapped test-time optimizer executes it.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the north-star target of 50M rays/sec/chip
(BASELINE.json) — no throughput numbers exist for the reference itself.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

import jax.numpy as jnp


def bench_tto():
    """Full test-time-optimization throughput: objects/min through the
    published pipeline (encode + refine + 100 Adam iterations at 1024 rays x
    64 samples) as one jitted program per object batch."""
    import jax.numpy as jnp

    from supnerf_tpu.data.synthetic import make_object_batch
    from supnerf_tpu.models import build_model, init_model_variables
    from supnerf_tpu.tto.core import ObjectBatch, TTOConfig, run_tto_batch

    model = build_model("supnerf", {
        "shape_blocks": 3, "texture_blocks": 1, "latent_dim": 256,
        "pose_shortcut": 1, "pred_wlh": 0,
    })
    variables = init_model_variables(model, jax.random.PRNGKey(0), img_size=128)
    B = int(os.environ.get("BENCH_OBJECTS", "16"))
    cfg = TTOConfig()  # published defaults: 100 opts, 32^2 rays, 64 samples
    raw, _ = make_object_batch(B, seed=0, in_img_sz=128, render_im_sz=32,
                               n_lidar=256)
    batch = ObjectBatch(**{k: jnp.asarray(v) for k, v in raw.items()})
    zeros = jnp.zeros(256)
    fn = jax.jit(lambda v, b, k: run_tto_batch(model, v, b, zeros, zeros, cfg, k))
    jax.block_until_ready(fn(variables, batch, jax.random.PRNGKey(0)))
    t0 = time.perf_counter()
    out = fn(variables, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    obj_per_min = B / dt * 60
    print(json.dumps({
        "metric": "tto_objects_per_min_per_chip",
        "value": round(obj_per_min, 2),
        "unit": "objects/min",
        # the reference optimizes objects serially on GPU at roughly 6/min
        # (~10 s/object: 100 iters + per-iter eval renders; no published number)
        "vs_baseline": round(obj_per_min / 6.0, 2),
    }))


def main():
    # Default metric: full test-time-optimization throughput (the product-level
    # north star — the reference optimizes objects serially). Set
    # BENCH_METRIC=render for raw renderer rays/s.
    if os.environ.get("BENCH_METRIC", "tto").lower() == "tto":
        return bench_tto()
    from supnerf_tpu.models import build_model, init_model_variables
    from supnerf_tpu.render.renderer import render_rays_frustum

    model = build_model("supnerf", {
        "shape_blocks": 3, "texture_blocks": 1, "latent_dim": 256,
        "pose_shortcut": 1, "pred_wlh": 0,
        "field_dtype": os.environ.get("BENCH_DTYPE", "bfloat16"),
    })
    variables = init_model_variables(model, jax.random.PRNGKey(0), img_size=32)

    # TTO-iteration shape: render_im_sz=32 -> 1024 rays x 64 samples per object,
    # batched over B objects (the vmapped optimizer's inner render).
    B = int(os.environ.get("BENCH_OBJECTS", "32"))
    IM_SZ, N_SAMPLES = 32, 64
    K = jnp.asarray([[800.0, 0, 640], [0, 800, 360], [0, 0, 1]])
    roi = jnp.asarray([500.0, 200.0, 700.0, 400.0])
    cam = jnp.concatenate([jnp.eye(3), jnp.asarray([[0.0], [0.0], [-20.0]])], axis=1)
    diag = jnp.float32(5.3)

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    shapecodes = jax.random.normal(jax.random.PRNGKey(1), (B, 256)) * 0.1
    texturecodes = jax.random.normal(jax.random.PRNGKey(2), (B, 256)) * 0.1

    impl = os.environ.get("BENCH_IMPL", "pallas")  # pallas | xla
    if impl == "pallas":
        import jax.numpy as _jnp

        from supnerf_tpu.ops.pallas_field import make_pallas_field_fn

        dt = {"bfloat16": _jnp.bfloat16, "float32": _jnp.float32}[
            os.environ.get("BENCH_DTYPE", "bfloat16")]
        pallas_field = make_pallas_field_fn(variables, dtype=dt)

        def field_for(sc, tc):
            return lambda xyz, vd: pallas_field(xyz, vd, sc, tc)
    else:
        def field_for(sc, tc):
            return lambda xyz, vd: model.apply(variables, xyz, vd, sc, tc)

    def render_one(key, sc, tc):
        out = render_rays_frustum(
            field_for(sc, tc),
            key, cam, K, roi, diag,
            n_samples=N_SAMPLES, im_sz=IM_SZ, shapenet_obj_cood=True,
        )
        return out["rgb"], out["depth"], out["acc_trans"]

    n_iters = int(os.environ.get("BENCH_ITERS", "20"))

    # The host<->TPU dispatch round-trip dominates small calls in this
    # environment, so the timing loop runs INSIDE one jitted program.
    @jax.jit
    def timed_loop(keys, sc, tc):
        def body(i, acc):
            ks = jax.vmap(lambda k: jax.random.fold_in(k, i))(keys)
            rgb, depth, acc_t = jax.vmap(render_one)(ks, sc, tc)
            return acc + rgb.mean() + depth.mean() + acc_t.mean()

        return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

    # warmup / compile (different inputs from the timed call: the remote
    # execution layer in this environment can cache identical executions)
    jax.block_until_ready(timed_loop(keys, shapecodes + 0.01, texturecodes))
    t0 = time.perf_counter()
    jax.block_until_ready(timed_loop(keys, shapecodes, texturecodes))
    dt = time.perf_counter() - t0

    rays = B * IM_SZ * IM_SZ * n_iters
    rays_per_sec = rays / dt
    target = 50e6
    print(json.dumps({
        "metric": "render_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / target, 4),
    }))


if __name__ == "__main__":
    main()
