"""Benchmarks on the real TPU chip. Prints ONE JSON line.

Default (BENCH_METRIC=all): runs all three benchmarks and reports the
DECLARED north-star metric (render rays/sec/chip vs the 50M rays/s target in
BASELINE.json) as the primary, with the TTO and train-step throughputs in
"extra" — both product-level measures, reported every round so the scoreboard
is interpretable (the 50M target exceeds the v5e bf16 roofline for this
field; see BASELINE.md "Roofline note" for the arithmetic and the achievable
target the vs_roofline field tracks).

BENCH_METRIC=render|tto|train selects a single benchmark for iteration.

All timed loops run INSIDE one jitted program (lax.fori_loop / lax.scan):
dispatch round-trips through this environment's TPU tunnel cost ~0.4 s each
and would otherwise dominate.
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

# Declared north star (BASELINE.json) and the physically achievable ceiling:
# the published field costs ~56 MFLOP/ray forward (PE -> 6x256-wide MLP
# x 64 samples), so a 197 TFLOP/s bf16 v5e tops out near 3.5M rays/s forward
# — see BASELINE.md "Roofline note".
NORTH_STAR_RAYS_PER_SEC = 50e6
ROOFLINE_RAYS_PER_SEC = 3.5e6
# Measured ceiling of the published decoder's matmul SHAPES on this chip:
# a weights-in-VMEM Pallas kernel running only the 9-layer chain (no PE, no
# bias/relu) sustains 104 TFLOP/s = 1.81M rays/s — narrow K/N (<=256) layers
# cannot fill the MXU pipeline to the nominal 197 TF peak. This is a property
# of the model architecture, not the kernel; see VALIDATION.md round-2
# "Forward-path profile". Round 3's fused render kernel reaches ~1.0x of this
# number (slightly above is consistent: the per-ray direction-encoding path
# does strictly less per-point matmul work than the calibration chain —
# VALIDATION.md round-3).
SHAPE_CEILING_RAYS_PER_SEC = 1.81e6
# The reference optimizes objects serially on GPU at roughly 6 objects/min
# (~10 s/object: 100 iters + per-iter eval renders). No published number —
# this is the builder's estimate, labeled as such.
REFERENCE_TTO_OBJ_PER_MIN_EST = 6.0

from supnerf_tpu.data.synthetic import PUBLISHED_NET_HP as _PUBLISHED_HP


def bench_tto():
    """Full test-time-optimization throughput: objects/min through the
    published pipeline (encode + refine + 100 Adam iterations at 1024 rays x
    64 samples) as one jitted program per object batch."""
    from supnerf_tpu.data.synthetic import make_object_batch
    from supnerf_tpu.models import build_model, init_model_variables
    from supnerf_tpu.tto.core import ObjectBatch, TTOConfig, run_tto_batch

    model = build_model("supnerf", _PUBLISHED_HP)
    variables = init_model_variables(model, jax.random.PRNGKey(0), img_size=128)
    B = int(os.environ.get("BENCH_OBJECTS", "16"))
    # published defaults: 100 opts, 32^2 rays, 64 samples. BENCH_FIELD_IMPL
    # selects the hot-loop field: fused Pallas fwd+bwd kernels vs XLA autodiff.
    cfg = TTOConfig(field_impl=os.environ.get("BENCH_FIELD_IMPL", "pallas"))
    if os.environ.get("BENCH_AABB", "0") == "1":
        # demo-protocol variant: AABB-bounded per-ray sampling (reference
        # render_rays_v3) on the fused per-ray-z render kernel
        import dataclasses as _dc
        cfg = _dc.replace(cfg, use_aabb_render=True, adjust_scale=0.5)
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
    return B / dt * 60


def bench_tto_product():
    """PRODUCT-path TTO throughput: TTODriver.run() end to end — host prep,
    pose-error injection, dispatch pipeline, result fetch + bookkeeping,
    pickles — over a synthetic dataset (objects/min). The driver pipeline
    overlaps prep and bookkeeping with the device steps; this measures what
    a user actually gets vs bench_tto's device-only number."""
    import tempfile

    from supnerf_tpu.data.synthetic import SyntheticTTODataset, published_hparams
    from supnerf_tpu.models import build_model, init_model_variables
    from supnerf_tpu.tto.driver import TTODriver

    n_obj = int(os.environ.get("BENCH_PRODUCT_OBJECTS", "64"))
    bs = int(os.environ.get("BENCH_OBJECTS", "16"))

    hp = published_hparams()
    model = build_model("supnerf", _PUBLISHED_HP)
    variables = init_model_variables(model, jax.random.PRNGKey(0), img_size=128)
    import contextlib

    with tempfile.TemporaryDirectory() as tmp:
        drv = TTODriver(model, variables, np.zeros(256, np.float32),
                        np.zeros(256, np.float32), hp,
                        SyntheticTTODataset(bs, seed0=100), tmp,
                        batch_size=bs, reg_iters=3, add_pose_err=2,
                        save_freq=10 ** 9,
                        field_impl=os.environ.get("BENCH_FIELD_IMPL", "pallas"))
        # driver progress prints go to stderr: bench stdout is ONE JSON line
        with contextlib.redirect_stdout(sys.stderr):
            drv.run()     # warmup: compile + first dispatch
            drv.dataset = SyntheticTTODataset(n_obj, seed0=100)
            t0 = time.perf_counter()
            drv.run()
            dt = time.perf_counter() - t0
    return n_obj / dt * 60


def bench_render():
    """Raw renderer throughput at the TTO-iteration shape: stratified
    sampling -> PE -> conditioned MLP -> compositing, vmapped over objects."""
    from supnerf_tpu.models import build_model, init_model_variables
    from supnerf_tpu.render.renderer import render_rays_frustum

    model = build_model("supnerf", {
        **_PUBLISHED_HP,
        "field_dtype": os.environ.get("BENCH_DTYPE", "bfloat16"),
    })
    variables = init_model_variables(model, jax.random.PRNGKey(0), img_size=32)

    # TTO-iteration shape: render_im_sz=32 -> 1024 rays x 64 samples per
    # object, batched over B objects (the vmapped optimizer's inner render).
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
    dt_ = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        os.environ.get("BENCH_DTYPE", "bfloat16")]
    tile_m = int(os.environ.get("BENCH_TILE_M", "2048"))
    if impl == "pallas":
        # the fused field+compositing render kernel (the product forward
        # path: renderer composite_fn hooks / TTODriver._composite_for)
        from supnerf_tpu.ops.pallas_field import pack_decoder_params
        from supnerf_tpu.ops.pallas_render import make_composite_fn

        packed = pack_decoder_params(variables["params"]["decoder"], 3, 1)
        kern_kw = dict(shape_blocks=3, texture_blocks=1, dtype=dt_,
                       tile_fwd=tile_m)

        def composite_for(sc, tc):
            return make_composite_fn(packed, kern_kw, sc, tc)
    else:
        def composite_for(sc, tc):
            return None

    def field_for(sc, tc):
        return lambda xyz, vd: model.apply(variables, xyz, vd, sc, tc)

    def render_one(key, sc, tc):
        out = render_rays_frustum(
            field_for(sc, tc),
            key, cam, K, roi, diag,
            n_samples=N_SAMPLES, im_sz=IM_SZ, shapenet_obj_cood=True,
            composite_fn=composite_for(sc, tc),
        )
        return out["rgb"], out["depth"], out["acc_trans"]

    n_iters = int(os.environ.get("BENCH_ITERS", "20"))

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
    return B * IM_SZ * IM_SZ * n_iters / dt


def bench_train():
    """Unified training step at the published batch-48 shape (48 x 1024 rays
    x 64 samples + 128 px encoder input), n steps inside one jitted
    fori_loop. Returns (steps/s, point-evals/s)."""
    from supnerf_tpu.models import build_model
    from supnerf_tpu.training import (
        TrainBatch, TrainConfig, init_train_state, make_train_step,
    )

    B = int(os.environ.get("BENCH_TRAIN_BATCH", "48"))
    R, S, IMG = 1024, 64, 128
    n_iters = int(os.environ.get("BENCH_TRAIN_ITERS", "5"))

    model = build_model("supnerf", _PUBLISHED_HP)
    cfg = TrainConfig(latent_dim=256,
                      field_impl=os.environ.get("BENCH_FIELD_IMPL", "pallas"))
    state = init_train_state(model, jax.random.PRNGKey(0), n_instances=B,
                             cfg=cfg, img_size=IMG)
    step = make_train_step(model, cfg, donate=False)

    from supnerf_tpu.data.synthetic import make_random_train_batch

    batch = TrainBatch(**{k: jnp.asarray(v) for k, v in
                          make_random_train_batch(B, R, S, IMG).items()})

    @jax.jit
    def loop(state, batch, key):
        def body(i, st):
            st2, _ = step(st, batch, jax.random.fold_in(key, i))
            return st2

        return jax.lax.fori_loop(0, n_iters, body, state)

    jax.block_until_ready(loop(state, batch, jax.random.PRNGKey(0)).niter)
    t0 = time.perf_counter()
    out = loop(state, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(out.niter)
    dt = time.perf_counter() - t0
    steps_per_sec = n_iters / dt
    return steps_per_sec, steps_per_sec * B * R * S


def main():
    mode = os.environ.get("BENCH_METRIC", "all").lower()
    if mode == "tto":
        v = bench_tto()
        print(json.dumps({
            "metric": "tto_objects_per_min_per_chip", "value": round(v, 2),
            "unit": "objects/min",
            "vs_baseline": round(v / REFERENCE_TTO_OBJ_PER_MIN_EST, 2),
            "extra": {"baseline_is_builder_estimate": True}}))
        return
    if mode == "render":
        v = bench_render()
        print(json.dumps({
            "metric": "render_rays_per_sec_per_chip", "value": round(v, 1),
            "unit": "rays/s",
            "vs_baseline": round(v / NORTH_STAR_RAYS_PER_SEC, 4),
            "extra": {"vs_roofline": round(v / ROOFLINE_RAYS_PER_SEC, 4),
                      "vs_shape_ceiling": round(
                          v / SHAPE_CEILING_RAYS_PER_SEC, 4)}}))
        return
    if mode == "train":
        sps, peps = bench_train()
        print(json.dumps({
            "metric": "train_steps_per_sec_per_chip", "value": round(sps, 3),
            "unit": "steps/s", "vs_baseline": None,
            "extra": {"train_point_evals_per_sec": round(peps, 1),
                      "batch": int(os.environ.get("BENCH_TRAIN_BATCH", "48"))}}))
        return

    if mode == "product":
        v = bench_tto_product()
        print(json.dumps({
            "metric": "tto_product_objects_per_min_per_chip",
            "value": round(v, 2), "unit": "objects/min",
            "vs_baseline": round(v / REFERENCE_TTO_OBJ_PER_MIN_EST, 2),
            "extra": {"baseline_is_builder_estimate": True}}))
        return

    # default: all four, one line, north-star primary
    rays = bench_render()
    tto = bench_tto()
    prod = bench_tto_product()
    sps, peps = bench_train()
    print(json.dumps({
        "metric": "render_rays_per_sec_per_chip",
        "value": round(rays, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays / NORTH_STAR_RAYS_PER_SEC, 4),
        "extra": {
            "vs_roofline": round(rays / ROOFLINE_RAYS_PER_SEC, 4),
            "vs_shape_ceiling": round(rays / SHAPE_CEILING_RAYS_PER_SEC, 4),
            "tto_objects_per_min_per_chip": round(tto, 2),
            "tto_product_objects_per_min_per_chip": round(prod, 2),
            "tto_vs_serial_reference_estimate": round(
                tto / REFERENCE_TTO_OBJ_PER_MIN_EST, 2),
            "train_steps_per_sec_per_chip": round(sps, 3),
            "train_point_evals_per_sec": round(peps, 1),
        },
    }))


if __name__ == "__main__":
    main()
