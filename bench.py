"""Benchmarks on the real TPU chip. Prints ONE JSON line.

Default (BENCH_METRIC=all): runs every stage in a TIME-BOXED subprocess under
a global self-deadline (BENCH_DEADLINE_S, default 900 s) and always prints the
one JSON line with whatever completed — a stage that hangs or compiles too
slowly forfeits only itself, never the whole scoreboard (round 3's official
bench was rc=124/parsed=null because one slow stage starved the single final
print; see VERDICT round 3 "what's weak" #1).

Stages, in scoreboard-value order:
  render         raw renderer rays/s at the TTO-iteration shape (the primary)
  tto            device-only TTO objects/min (one jitted program per batch)
  train          isolated jitted train step at the published batch 48
  product        TTODriver.run() end-to-end objects/min (host prep + dispatch
                 pipeline + fetch + bookkeeping)
  train_product  UnifiedTrainer.training_epoch end-to-end steps/s (real
                 per-sample ray prep feeding the chip; grouped 5-step
                 dispatches on this 1-core host)
  scene          demo-protocol multi-object compositor frames/s

BENCH_METRIC=<stage> runs a single stage in-process and prints its own line.
BENCH_SMOKE=1 forces the CPU platform and tiny shapes in every stage — the
bench-contract smoke the test suite runs (tests/test_bench_smoke.py).

All timed device loops run INSIDE one jitted program (lax.fori_loop/scan):
dispatch round-trips through this environment's TPU tunnel cost ~0.4 s each
and would otherwise dominate. The TTO and product stages share ONE compiled
TTO program (identical TTODriver config), so a cold cache pays that compile
once; the persistent compilation cache in .jax_cache/ is committed so the
driver's end-of-round run starts warm.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

SMOKE = os.environ.get("BENCH_SMOKE", "0") == "1"
# the committed .jax_cache holds ONLY TPU executables (they reload in seconds
# and are portable); CPU smoke compiles go to the gitignored .jax_cache_cpu —
# CPU AOT entries are machine-feature-specific and must never be committed
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    ".jax_cache_cpu" if SMOKE else ".jax_cache"))
if SMOKE:
    # contract smoke: tiny shapes on the host CPU (works because the remote
    # TPU backend is only instantiated at first device use)
    jax.config.update("jax_platforms", "cpu")

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
# TTO roofline from the measured matmul-shape chain ceiling (BASELINE.md "TTO
# roofline"): the ceiling is per POINT through the 9-layer decoder chain
# (1.81M rays/s x 64 samples = 115.8M point-fwd/s). One published TTO
# iteration costs, in forward-equivalents: loss render 1024 rays x 64 samples
# x (1 fwd + 2 bwd: recompute 9 + transposed 9 layers), plus the per-iter
# lidar-depth metric render 256 rays x 64 forward-only. Encoder + 3 refiner
# steps are <1% of the 100-iteration total and excluded.
_TTO_FWD_EQUIV_PTS_PER_OBJ = 100 * (1024 * 64 * 3 + 256 * 64)     # 21.3M
TTO_CEILING_OBJ_PER_MIN = (SHAPE_CEILING_RAYS_PER_SEC * 64
                           / _TTO_FWD_EQUIV_PTS_PER_OBJ * 60)     # ~326.4

from supnerf_tpu.data.synthetic import PUBLISHED_NET_HP as _PUBLISHED_HP

_T0 = time.monotonic()


def _t(label: str):
    """Stage-phase timestamp on stderr (stdout carries only the JSON line)."""
    print(f"[bench +{time.monotonic() - _T0:7.1f}s] {label}", file=sys.stderr,
          flush=True)

_SMOKE_NET_HP = {
    "shape_blocks": 1, "texture_blocks": 1, "pose_blocks": 1,
    "regress_blocks": 1, "latent_dim": 32, "num_xyz_freq": 10,
    "num_dir_freq": 4, "pose_shortcut": 1, "pred_wlh": 0,
}


def _net_hp():
    return _SMOKE_NET_HP if SMOKE else _PUBLISHED_HP


def _field_impl():
    # the fused kernels only run compiled on accelerators; the CPU smoke
    # exercises the XLA-autodiff path (kernel parity has its own test files)
    if SMOKE:
        return "flax"
    return os.environ.get("BENCH_FIELD_IMPL", "pallas")


def _bench_hparams():
    """Shared TTO/train protocol hparams: published values, or tiny smoke
    shapes. ONE source for the tto and product stages so they compile the
    SAME XLA program (same TTOConfig + batch shapes -> one cold compile)."""
    from supnerf_tpu.data.synthetic import published_hparams

    hp = published_hparams()
    if SMOKE:
        hp["net_hyperparams"] = dict(_SMOKE_NET_HP)
        hp.update(n_rays=64, n_samples=8, in_img_sz=32, render_im_sz=8)
        hp["optimize"]["num_opts"] = 4
    return hp


def _make_tto_driver(save_dir, n_objects, bs):
    """The TTODriver both TTO stages use — identical model/config so the
    device program (driver._tto) is compiled once across the two stages."""
    from supnerf_tpu.data.synthetic import SyntheticTTODataset
    from supnerf_tpu.models import build_model, init_model_variables
    from supnerf_tpu.tto.driver import TTODriver

    hp = _bench_hparams()
    latent = hp["net_hyperparams"]["latent_dim"]
    model = build_model("supnerf", hp["net_hyperparams"])
    variables = init_model_variables(model, jax.random.PRNGKey(0),
                                     img_size=hp["in_img_sz"])
    n_lidar = 8 if SMOKE else 256
    drv = TTODriver(model, variables, np.zeros(latent, np.float32),
                    np.zeros(latent, np.float32), hp,
                    SyntheticTTODataset(n_objects, seed0=100), save_dir,
                    batch_size=bs, reg_iters=3, add_pose_err=2,
                    save_freq=10 ** 9, field_impl=_field_impl())
    if n_lidar != drv.cfg.n_lidar:
        import dataclasses

        drv.cfg = dataclasses.replace(drv.cfg, n_lidar=n_lidar)
    return drv


def _bench_tto_device(drv):
    """DEVICE-only TTO throughput on a prepped batch: timed dispatch to
    completion, no host bookkeeping (the product leg measures that)."""
    B = drv.batch_size
    _t("tto: host prep")
    prepped, _ = drv._prep_batch(list(range(B)))
    stacked = {k: np.stack([r[k] for r in prepped]) for k in prepped[0]}
    from supnerf_tpu.tto.core import ObjectBatch

    batch = ObjectBatch(**{k: jnp.asarray(v) for k, v in stacked.items()})
    # warmup/compile with a different key (the remote execution layer can
    # cache identical executions)
    _t("tto: trace+compile (warmup call)")
    out = drv._tto(drv.variables, batch, jax.random.PRNGKey(0))
    jax.block_until_ready(out[0])
    _t("tto: timed run")
    t0 = time.perf_counter()
    out = drv._tto(drv.variables, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(out[0])
    dt = time.perf_counter() - t0
    _t("tto: done")
    return B / dt * 60


def _bench_tto_product(drv, warm: bool):
    """PRODUCT-path TTO throughput: TTODriver.run() end to end — host prep,
    pose-error injection, dispatch pipeline, result fetch + bookkeeping,
    pickles — over a synthetic dataset (objects/min). The driver pipeline
    overlaps prep and bookkeeping with the device steps; this measures what
    a user actually gets vs the device-only number."""
    import contextlib

    from supnerf_tpu.data.synthetic import SyntheticTTODataset
    from supnerf_tpu.utils.profiling import PhaseTimer

    n_obj = int(os.environ.get("BENCH_PRODUCT_OBJECTS", "4" if SMOKE else "64"))
    # driver progress prints go to stderr: bench stdout is ONE JSON line
    with contextlib.redirect_stdout(sys.stderr):
        if not warm:
            _t("product: warmup run")
            drv.run()     # compile + first dispatch + host-path imports
        _t("product: timed run")
        drv.dataset = SyntheticTTODataset(n_obj, seed0=100)
        drv.timer = PhaseTimer()    # phase report covers ONLY the timed run
        t0 = time.perf_counter()
        drv.run()
        dt = time.perf_counter() - t0
    _t("product: done")
    return n_obj / dt * 60


def bench_tto():
    import tempfile

    B = int(os.environ.get("BENCH_OBJECTS", "2" if SMOKE else "16"))
    with tempfile.TemporaryDirectory() as tmp:
        return _bench_tto_device(_make_tto_driver(tmp, B, B))


def bench_tto_product():
    import contextlib
    import tempfile

    bs = int(os.environ.get("BENCH_OBJECTS", "2" if SMOKE else "16"))
    with tempfile.TemporaryDirectory() as tmp:
        drv = _make_tto_driver(tmp, bs, bs)
        with contextlib.redirect_stdout(sys.stderr):
            drv.run()     # warmup: compile + first dispatch
        return _bench_tto_product(drv, warm=True)


def bench_tto_pair(emit=None):
    """tto AND product in ONE process: the model init, the program trace, and
    the compile are shared — a separate subprocess per leg re-paid ~6 min of
    per-process setup (backend init + init compiles + tracing the 100-iter
    vmapped TTO program on this 1-CPU host) for the same numbers.
    emit(json_line) is called with the device leg's metric as soon as it
    completes, so a stage timeout mid-product still scores the first leg."""
    import contextlib
    import tempfile

    B = int(os.environ.get("BENCH_OBJECTS", "2" if SMOKE else "16"))
    with tempfile.TemporaryDirectory() as tmp:
        drv = _make_tto_driver(tmp, B, B)
        tto_v = _bench_tto_device(drv)
        if emit is not None:
            emit(json.dumps({
                "metric": "tto_objects_per_min_per_chip",
                "value": round(tto_v, 2), "unit": "objects/min",
                "vs_baseline": round(tto_v / REFERENCE_TTO_OBJ_PER_MIN_EST, 2),
                "extra": {"baseline_is_builder_estimate": True,
                          "tto_vs_ceiling": round(
                              tto_v / TTO_CEILING_OBJ_PER_MIN, 4)}}))
        # the device program is warm; one small product run warms the
        # host-side bookkeeping paths (pickle/imports) before timing
        from supnerf_tpu.data.synthetic import SyntheticTTODataset

        drv.dataset = SyntheticTTODataset(B, seed0=100)
        with contextlib.redirect_stdout(sys.stderr):
            drv.run()
        prod_v = _bench_tto_product(drv, warm=True)
        print(drv.timer.report(), file=sys.stderr)
    return tto_v, prod_v


def bench_render():
    """Raw renderer throughput at the TTO-iteration shape: stratified
    sampling -> PE -> conditioned MLP -> compositing, vmapped over objects."""
    from supnerf_tpu.models import build_model, init_model_variables
    from supnerf_tpu.render.renderer import render_rays_frustum

    net_hp = _net_hp()
    latent = net_hp["latent_dim"]
    model = build_model("supnerf", {
        **net_hp,
        "field_dtype": os.environ.get("BENCH_DTYPE", "bfloat16"),
    })
    variables = init_model_variables(model, jax.random.PRNGKey(0), img_size=32)

    # TTO-iteration shape: render_im_sz=32 -> 1024 rays x 64 samples per
    # object, batched over B objects (the vmapped optimizer's inner render).
    B = int(os.environ.get("BENCH_OBJECTS", "2" if SMOKE else "32"))
    IM_SZ, N_SAMPLES = (8, 8) if SMOKE else (32, 64)
    K = jnp.asarray([[800.0, 0, 640], [0, 800, 360], [0, 0, 1]])
    roi = jnp.asarray([500.0, 200.0, 700.0, 400.0])
    cam = jnp.concatenate([jnp.eye(3), jnp.asarray([[0.0], [0.0], [-20.0]])], axis=1)
    diag = jnp.float32(5.3)

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    shapecodes = jax.random.normal(jax.random.PRNGKey(1), (B, latent)) * 0.1
    texturecodes = jax.random.normal(jax.random.PRNGKey(2), (B, latent)) * 0.1

    impl = "xla" if SMOKE else os.environ.get("BENCH_IMPL", "pallas")
    dt_ = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        os.environ.get("BENCH_DTYPE", "bfloat16")]
    tile_m = int(os.environ.get("BENCH_TILE_M", "2048"))
    if impl == "pallas":
        # the fused field+compositing render kernel (the product forward
        # path: renderer composite_fn hooks / TTODriver._composite_for)
        from supnerf_tpu.ops.pallas_field import pack_decoder_params
        from supnerf_tpu.ops.pallas_render import make_composite_fn

        packed = pack_decoder_params(variables["params"]["decoder"],
                                     net_hp["shape_blocks"],
                                     net_hp["texture_blocks"])
        kern_kw = dict(shape_blocks=net_hp["shape_blocks"],
                       texture_blocks=net_hp["texture_blocks"], dtype=dt_,
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

    n_iters = int(os.environ.get("BENCH_ITERS", "2" if SMOKE else "20"))

    @jax.jit
    def timed_loop(keys, sc, tc):
        def body(i, acc):
            ks = jax.vmap(lambda k: jax.random.fold_in(k, i))(keys)
            rgb, depth, acc_t = jax.vmap(render_one)(ks, sc, tc)
            return acc + rgb.mean() + depth.mean() + acc_t.mean()

        return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

    # warmup / compile (different inputs from the timed call: the remote
    # execution layer in this environment can cache identical executions)
    _t("render: trace+compile (warmup call)")
    jax.block_until_ready(timed_loop(keys, shapecodes + 0.01, texturecodes))
    _t("render: timed run")
    t0 = time.perf_counter()
    jax.block_until_ready(timed_loop(keys, shapecodes, texturecodes))
    dt = time.perf_counter() - t0
    _t("render: done")
    return B * IM_SZ * IM_SZ * n_iters / dt


def bench_train():
    """ISOLATED unified training step at the published batch-48 shape (48 x
    1024 rays x 64 samples + 128 px encoder input), n steps inside one jitted
    fori_loop with a pre-built static batch. Returns (steps/s, point-evals/s).
    The train_product stage measures the same step through the real epoch
    loop instead."""
    from supnerf_tpu.models import build_model
    from supnerf_tpu.training import (
        TrainBatch, TrainConfig, init_train_state, make_train_step,
    )

    B = int(os.environ.get("BENCH_TRAIN_BATCH", "2" if SMOKE else "48"))
    R, S, IMG = (32, 8, 32) if SMOKE else (1024, 64, 128)
    n_iters = int(os.environ.get("BENCH_TRAIN_ITERS", "2" if SMOKE else "5"))

    net_hp = _net_hp()
    model = build_model("supnerf", net_hp)
    cfg = TrainConfig(latent_dim=net_hp["latent_dim"],
                      field_impl=_field_impl())
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

    _t("train: trace+compile (warmup call)")
    jax.block_until_ready(loop(state, batch, jax.random.PRNGKey(0)).niter)
    _t("train: timed run")
    t0 = time.perf_counter()
    out = loop(state, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(out.niter)
    dt = time.perf_counter() - t0
    _t("train: done")
    steps_per_sec = n_iters / dt
    return steps_per_sec, steps_per_sec * B * R * S


def bench_train_product():
    """PRODUCT-path training throughput: UnifiedTrainer.training_epoch over a
    synthetic dataset at the published batch 48 with REAL per-sample ray prep
    feeding the chip — what a user's train run actually sustains, vs
    bench_train's isolated-step number (reference: the dataloader-worker ray
    prep this replaces, /root/reference/src/data_nuscenes.py:615-658). The
    trainer auto-selects the epoch shape: on this 1-core host that is the
    serial grouped loop (steps_per_dispatch=5, one lax.scan program per 5
    steps); on multi-core hosts it is threaded per-step prefetch through
    PrefetchBatcher workers."""
    import contextlib
    import tempfile

    from supnerf_tpu.data.synthetic import CyclingDataset, SyntheticTTODataset
    from supnerf_tpu.models import build_model
    from supnerf_tpu.training.trainer import UnifiedTrainer

    B = int(os.environ.get("BENCH_TRAIN_BATCH", "2" if SMOKE else "48"))
    # 40 steps ~= 8 groups of 5: long enough that the steady-state pipeline
    # (prep overlapped under the K-step device programs) dominates the one
    # unavoidable pipeline-fill prep; a 10-step epoch was ~1/4 startup and
    # under-read the sustained rate by ~25%
    steps = int(os.environ.get("BENCH_TRAIN_EPOCH_STEPS", "2" if SMOKE else "40"))
    n_base = 2 if SMOKE else 48    # distinct synthetic objects (memory-bounded)
    workers = int(os.environ.get("BENCH_TRAIN_WORKERS", "8"))

    hp = _bench_hparams()
    model = build_model("supnerf", hp["net_hyperparams"])
    _t("train_product: building synthetic dataset")
    ds = CyclingDataset(SyntheticTTODataset(n_base, seed0=500), B * steps)

    with tempfile.TemporaryDirectory() as tmp, \
            contextlib.redirect_stdout(sys.stderr):
        trainer = UnifiedTrainer(model, hp, ds, tmp, batch_size=B,
                                 field_impl=_field_impl(), log_writer=False,
                                 check_iter=10 ** 9, seed=0)
        _t("train_product: warmup epoch (trace+compile)")
        trainer.training_epoch(num_workers=workers)   # warmup epoch: compile
        trainer.nepoch = 1
        _t("train_product: timed epoch")
        t0 = time.perf_counter()
        trainer.training_epoch(num_workers=workers)
        dt = time.perf_counter() - t0
    _t("train_product: done")
    # product-path decomposition: producer (prep/upload) vs main thread
    # (wait/dispatch/metric flush) seconds over the timed epoch
    print("train_product phases: " + json.dumps(
        {k: round(v, 3) for k, v in sorted(trainer.epoch_phases.items())}),
        file=sys.stderr)
    return steps / dt


def bench_scene():
    """Scene-compositor throughput: the demo's multi-object novel-view frame
    render (reference scripts/demo.py:425-579 vis_scene — per-object AABB
    rays, batched multi-object field queries, cross-object z-merge
    compositing). N_OBJ objects, a demo-scale window, n_frames frames with
    per-frame object manipulation, all inside ONE jitted fori_loop.
    Returns (frames/s, object-ray queries/s)."""
    from supnerf_tpu.models import build_model, init_model_variables
    from supnerf_tpu.render.compositor import render_scene_window

    net_hp = _net_hp()
    latent = net_hp["latent_dim"]
    model = build_model("supnerf", net_hp)
    variables = init_model_variables(model, jax.random.PRNGKey(0), img_size=32)

    N_OBJ = 2 if SMOKE else 6
    WIN_W, WIN_H = (8, 8) if SMOKE else (256, 128)
    N_SAMPLES = 8 if SMOKE else 64
    n_frames = int(os.environ.get("BENCH_SCENE_FRAMES", "2" if SMOKE else "10"))

    K = jnp.asarray([[400.0, 0, WIN_W / 2], [0, 400.0, WIN_H / 2], [0, 0, 1]])
    window = jnp.asarray([0.0, 0.0, float(WIN_W), float(WIN_H)])
    xs = jnp.linspace(-6.0, 6.0, N_OBJ)
    obj_poses = jnp.stack([
        jnp.concatenate([jnp.eye(3), jnp.asarray([[float(x)], [1.0], [18.0]])],
                        axis=1) for x in xs])
    obj_wlh = jnp.tile(jnp.asarray([1.9, 4.6, 1.7]), (N_OBJ, 1))
    sc = jax.random.normal(jax.random.PRNGKey(1), (N_OBJ, latent)) * 0.1
    tc = jax.random.normal(jax.random.PRNGKey(2), (N_OBJ, latent)) * 0.1

    def render_frame(v_args, dx, key):
        poses = obj_poses.at[:, 0, 3].add(dx)
        rgb, depth = render_scene_window(
            lambda x, d, s, t: model.apply(v_args, x, d, s, t),
            key, poses, obj_wlh, sc, tc, K, window, (WIN_W, WIN_H),
            n_samples=N_SAMPLES, adjust_scale=0.5,
            chunk=64 if SMOKE else 1024)
        return rgb, depth

    @jax.jit
    def timed_loop(v_args, key):
        def body(i, acc):
            rgb, depth = render_frame(
                v_args, 0.2 * i, jax.random.fold_in(key, i))
            return acc + rgb.mean() + depth.mean()

        return jax.lax.fori_loop(0, n_frames, body, jnp.float32(0.0))

    _t("scene: trace+compile (warmup call)")
    jax.block_until_ready(timed_loop(variables, jax.random.PRNGKey(3)))
    _t("scene: timed run")
    t0 = time.perf_counter()
    jax.block_until_ready(timed_loop(variables, jax.random.PRNGKey(4)))
    dt = time.perf_counter() - t0
    _t("scene: done")
    fps = n_frames / dt
    return fps, fps * WIN_W * WIN_H * N_OBJ


def bench_train_pair(emit=None):
    """train AND train_product in ONE process (shared backend init and
    disk-cached init programs; see bench_tto_pair)."""
    sps, peps = bench_train()
    if emit is not None:
        emit(json.dumps({
            "metric": "train_steps_per_sec_per_chip", "value": round(sps, 3),
            "unit": "steps/s", "vs_baseline": None,
            "extra": {"train_point_evals_per_sec": round(peps, 1)}}))
    prod = bench_train_product()
    return sps, peps, prod


# --------------------------------------------------------------- orchestrator

STAGES = ("render", "tto_pair", "train_pair", "scene")
# fraction of the global deadline each stage may consume at most. Paired
# stages (tto+product, train+train_product) share one subprocess because the
# per-process setup (backend init + init compiles + tracing the big programs
# on this 1-CPU host) costs minutes and dwarfs the timed runs. Healthy
# warm-cache stage walls measured on-chip: render 134-257 s, tto_pair
# 150-275 s, train_pair 152-296 s — the caps bound a SICK stage (slow tunnel
# session, server recompile) so it cannot starve the stages after it, and a
# killed pair child still yields its first leg's metric (partial stdout).
_STAGE_CAP_FRAC = {"render": 0.33, "tto": 0.45, "train": 0.40,
                   "product": 0.55, "train_product": 0.55,
                   "tto_pair": 0.45, "train_pair": 0.45, "scene": 0.25}
_RESERVE_S = 20.0      # always left for assembling + printing the JSON line
_MIN_STAGE_S = 45.0


def _run_stage_subprocess(stage: str, timeout_s: float):
    """Run one stage as `BENCH_METRIC=<stage> python bench.py` and return its
    parsed JSON dict, or None on timeout/failure. Isolation means a hung or
    crashed stage cannot eat the global deadline's final print."""
    import subprocess

    env = dict(os.environ)
    env["BENCH_METRIC"] = stage
    # deterministic hashing: with randomized Python hashing, dict/set
    # iteration order perturbs the serialized HLO across processes, which
    # changes the persistent-compile-cache key and forces 2-10 min
    # recompiles of UNCHANGED programs through the TPU tunnel (observed:
    # byte-identical code producing distinct jit_loop cache entries)
    env.setdefault("PYTHONHASHSEED", "0")
    def last_json(text):
        for line in reversed((text or "").strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                try:
                    return json.loads(line)
                except json.JSONDecodeError:
                    continue
        return None

    try:
        proc = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired as e:
        # pair stages print their first leg's JSON line as soon as it
        # completes — salvage it so a mid-stage kill still scores the leg
        out = e.stdout
        parsed = last_json(out.decode() if isinstance(out, bytes) else out)
        return parsed, "timeout" if parsed is None else "timeout (partial)"
    if proc.returncode != 0:
        tail = (proc.stderr or "").strip().splitlines()[-3:]
        return None, f"rc={proc.returncode}: {' | '.join(tail)[-300:]}"
    parsed = last_json(proc.stdout)
    return parsed, None if parsed is not None else "no JSON line on stdout"


def _assemble(results: dict, failures: dict, skipped: list,
              stage_seconds: dict, deadline: float):
    """One scoreboard line from whatever completed. Primary = render rays/s;
    if the render stage is missing, fall back down the value order so the
    line still carries a number."""
    extra = {
        "stages_timed_out": sorted(k for k, v in failures.items()
                                   if v.startswith("timeout")),
        "stages_failed": {k: v for k, v in failures.items()
                          if not v.startswith("timeout")},
        "stages_skipped": skipped,
        "stage_seconds": {k: round(v, 1) for k, v in stage_seconds.items()},
        "deadline_s": deadline,
        "smoke": SMOKE,
    }
    if "tto_pair" in results:
        r = results["tto_pair"]
        extra["tto_objects_per_min_per_chip"] = r["value"]
        extra["tto_vs_serial_reference_estimate"] = r["vs_baseline"]
        extra["tto_vs_ceiling"] = r["extra"].get("tto_vs_ceiling")
        prod = r["extra"].get("tto_product_objects_per_min_per_chip")
        if prod is not None:    # absent when only the device leg survived
            extra["tto_product_objects_per_min_per_chip"] = prod
    if "tto" in results:
        extra["tto_objects_per_min_per_chip"] = results["tto"]["value"]
        extra["tto_vs_serial_reference_estimate"] = results["tto"]["vs_baseline"]
        extra["tto_vs_ceiling"] = results["tto"]["extra"].get("tto_vs_ceiling")
    if "product" in results:
        extra["tto_product_objects_per_min_per_chip"] = results["product"]["value"]
    if "train_pair" in results:
        r = results["train_pair"]
        extra["train_steps_per_sec_per_chip"] = r["value"]
        extra["train_point_evals_per_sec"] = \
            r["extra"]["train_point_evals_per_sec"]
        prod = r["extra"].get("train_product_steps_per_sec_per_chip")
        if prod is not None:
            extra["train_product_steps_per_sec_per_chip"] = prod
    if "train" in results:
        extra["train_steps_per_sec_per_chip"] = results["train"]["value"]
        extra["train_point_evals_per_sec"] = \
            results["train"]["extra"]["train_point_evals_per_sec"]
    if "train_product" in results:
        extra["train_product_steps_per_sec_per_chip"] = \
            results["train_product"]["value"]
    if "scene" in results:
        extra["scene_frames_per_sec"] = results["scene"]["value"]
        extra["scene_obj_ray_queries_per_sec"] = \
            results["scene"]["extra"]["scene_obj_ray_queries_per_sec"]

    if "render" in results:
        r = results["render"]
        extra["vs_roofline"] = r["extra"]["vs_roofline"]
        extra["vs_shape_ceiling"] = r["extra"]["vs_shape_ceiling"]
        return {"metric": "render_rays_per_sec_per_chip", "value": r["value"],
                "unit": "rays/s", "vs_baseline": r["vs_baseline"],
                "extra": extra}
    for stage in ("tto_pair", "tto", "train_pair", "train", "product",
                  "train_product", "scene"):
        if stage in results:
            r = results[stage]
            return {"metric": r["metric"], "value": r["value"],
                    "unit": r["unit"], "vs_baseline": r.get("vs_baseline"),
                    "extra": extra}
    return {"metric": "bench_incomplete", "value": 0.0, "unit": "none",
            "vs_baseline": None, "extra": extra}


def _cache_entries():
    d = jax.config.jax_compilation_cache_dir
    try:
        return set(os.listdir(d))
    except OSError:
        return set()


def run_all():
    deadline = float(os.environ.get("BENCH_DEADLINE_S",
                                    "240" if SMOKE else "900"))
    stages = [s.strip() for s in
              os.environ.get("BENCH_STAGES", ",".join(STAGES)).split(",")
              if s.strip()]
    cache_before = _cache_entries()
    t_start = time.monotonic()
    results, failures, skipped, stage_seconds = {}, {}, [], {}
    for stage in stages:
        remaining = deadline - (time.monotonic() - t_start) - _RESERVE_S
        budget = min(remaining, _STAGE_CAP_FRAC.get(stage, 0.4) * deadline)
        if budget < _MIN_STAGE_S:
            skipped.append(stage)
            continue
        t0 = time.monotonic()
        parsed, err = _run_stage_subprocess(stage, budget)
        stage_seconds[stage] = time.monotonic() - t0
        if parsed is not None:
            results[stage] = parsed
        if err is not None:
            failures[stage] = err
            print(f"stage {stage}: {err}", file=sys.stderr)
    line = _assemble(results, failures, skipped, stage_seconds, deadline)
    # recompile sentinel: new persistent-cache entries mean the committed
    # .jax_cache did not cover every program this run compiled (a cache-key
    # shift — e.g. source line moves — silently costs minutes per program
    # through the TPU tunnel; round 3's bench died of exactly this)
    line["extra"]["programs_recompiled"] = \
        len(_cache_entries() - cache_before)
    print(json.dumps(line))


def main():
    mode = os.environ.get("BENCH_METRIC", "all").lower()
    if mode == "tto":
        v = bench_tto()
        print(json.dumps({
            "metric": "tto_objects_per_min_per_chip", "value": round(v, 2),
            "unit": "objects/min",
            "vs_baseline": round(v / REFERENCE_TTO_OBJ_PER_MIN_EST, 2),
            "extra": {"baseline_is_builder_estimate": True,
                      "tto_vs_ceiling": round(
                          v / TTO_CEILING_OBJ_PER_MIN, 4)}}))
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
                      "batch": int(os.environ.get(
                          "BENCH_TRAIN_BATCH", "2" if SMOKE else "48"))}}))
        return
    if mode == "product":
        v = bench_tto_product()
        print(json.dumps({
            "metric": "tto_product_objects_per_min_per_chip",
            "value": round(v, 2), "unit": "objects/min",
            "vs_baseline": round(v / REFERENCE_TTO_OBJ_PER_MIN_EST, 2),
            "extra": {"baseline_is_builder_estimate": True}}))
        return
    if mode == "scene":
        fps, qps = bench_scene()
        print(json.dumps({
            "metric": "scene_frames_per_sec", "value": round(fps, 3),
            "unit": "frames/s", "vs_baseline": None,
            "extra": {"scene_obj_ray_queries_per_sec": round(qps, 1),
                      "n_objects": 2 if SMOKE else 6,
                      "window": "8x8" if SMOKE else "256x128"}}))
        return
    if mode == "train_product":
        v = bench_train_product()
        print(json.dumps({
            "metric": "train_product_steps_per_sec_per_chip",
            "value": round(v, 3), "unit": "steps/s", "vs_baseline": None,
            "extra": {"batch": int(os.environ.get(
                "BENCH_TRAIN_BATCH", "2" if SMOKE else "48"))}}))
        return
    if mode == "tto_pair":
        tto_v, prod_v = bench_tto_pair(emit=lambda l: print(l, flush=True))
        print(json.dumps({
            "metric": "tto_objects_per_min_per_chip",
            "value": round(tto_v, 2), "unit": "objects/min",
            "vs_baseline": round(tto_v / REFERENCE_TTO_OBJ_PER_MIN_EST, 2),
            "extra": {
                "tto_product_objects_per_min_per_chip": round(prod_v, 2),
                "baseline_is_builder_estimate": True,
                "tto_vs_ceiling": round(
                    tto_v / TTO_CEILING_OBJ_PER_MIN, 4)}}))
        return
    if mode == "train_pair":
        sps, peps, prod = bench_train_pair(emit=lambda l: print(l, flush=True))
        print(json.dumps({
            "metric": "train_steps_per_sec_per_chip", "value": round(sps, 3),
            "unit": "steps/s", "vs_baseline": None,
            "extra": {"train_point_evals_per_sec": round(peps, 1),
                      "train_product_steps_per_sec_per_chip": round(prod, 3),
                      "batch": int(os.environ.get(
                          "BENCH_TRAIN_BATCH", "2" if SMOKE else "48"))}}))
        return
    run_all()


if __name__ == "__main__":
    main()
