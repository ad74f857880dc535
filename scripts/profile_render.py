"""Decompose the TTO-iteration render time on the real TPU: sampling+PE vs
field MLP vs compositing vs full pipeline, pallas vs xla. Each phase is timed
as one jitted fori_loop (dispatch round-trips would otherwise dominate).

Usage: python scripts/profile_render.py [phases...]
Phases: sample field_pallas field_xla composite full_pallas full_xla
(default: all). Prints one line per phase: name, ms/iter, rays/s.
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

from supnerf_tpu.models import build_model, init_model_variables
from supnerf_tpu.models.nerf_mlp import positional_encoding
from supnerf_tpu.ops.pallas_field import field_forward_pallas, pack_decoder_params
from supnerf_tpu.ops.volume_render import volume_render
from supnerf_tpu.render.renderer import render_rays_frustum

B = int(os.environ.get("BENCH_OBJECTS", "32"))
IM_SZ, S = 32, 64
R = IM_SZ * IM_SZ
N_ITERS = int(os.environ.get("BENCH_ITERS", "20"))
RAYS_PER_ITER = B * R

HP = {"shape_blocks": 3, "texture_blocks": 1, "latent_dim": 256,
      "pose_shortcut": 1, "pred_wlh": 0, "field_dtype": "bfloat16"}

model = build_model("supnerf", HP)
variables = init_model_variables(model, jax.random.PRNGKey(0), img_size=32)
K = jnp.asarray([[800.0, 0, 640], [0, 800, 360], [0, 0, 1]])
roi = jnp.asarray([500.0, 200.0, 700.0, 400.0])
cam = jnp.concatenate([jnp.eye(3), jnp.asarray([[0.0], [0.0], [-20.0]])], axis=1)
diag = jnp.float32(5.3)
keys = jax.random.split(jax.random.PRNGKey(0), B)
sc = jax.random.normal(jax.random.PRNGKey(1), (B, 256)) * 0.1
tc = jax.random.normal(jax.random.PRNGKey(2), (B, 256)) * 0.1
xyz = jax.random.normal(jax.random.PRNGKey(3), (B, R, S, 3)) * 0.4
vd = jax.random.normal(jax.random.PRNGKey(4), (B, R, S, 3))
sig0 = jax.random.normal(jax.random.PRNGKey(5), (B, R, S))
rgb0 = jax.random.uniform(jax.random.PRNGKey(6), (B, R, S, 3))
zv = jnp.broadcast_to(jnp.linspace(14.0, 25.0, S), (B, R, S))

# params are passed as jitted-function ARGUMENTS everywhere below — closing
# them into a jitted loop would embed them as MLIR constants (see CLAUDE.md)
packed = pack_decoder_params(variables["params"]["decoder"], 3, 1)


def pallas_field(pk, x, v, s, t):
    return field_forward_pallas(pk, x, v, s, t, dtype=jnp.bfloat16)


def timed(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / N_ITERS
    print(f"{name:16s} {dt * 1e3:8.2f} ms/iter   "
          f"{RAYS_PER_ITER / dt / 1e6:7.3f} M rays/s")
    return out


def loop(body):
    @jax.jit
    def f(*args):
        def step(i, acc):
            return acc + body(i, *args)

        return jax.lax.fori_loop(0, N_ITERS, step, jnp.float32(0.0))

    return f


# ---- phase: ray gen + stratified sampling + PE (no MLP) --------------------
def sample_body(i, keys):
    from supnerf_tpu.render.renderer import (
        frustum_near_far, get_rays, sample_from_rays)

    def one(key):
        rays_o, viewdir = get_rays(K, cam, roi, (IM_SZ, IM_SZ))
        near, far = frustum_near_far(cam, diag)
        xyz_, vds_, z_ = sample_from_rays(
            jax.random.fold_in(key, i), rays_o, viewdir, near, far, S)
        xpe = positional_encoding(xyz_ / diag, 10)
        dpe = positional_encoding(vds_, 4)
        return xpe.mean() + dpe.mean() + z_.mean()

    return jax.vmap(one)(keys).mean()


# ---- phase: field MLP only --------------------------------------------------
def field_body_pallas(i, pk, xyz, vd, sc, tc):
    def one(x, v, s, t):
        sg, rg = pallas_field(pk, x + i * 1e-6, v, s, t)
        return sg.mean() + rg.mean()

    return jax.vmap(one)(xyz, vd, sc, tc).mean()


def field_body_xla(i, vars_, xyz, vd, sc, tc):
    def one(x, v, s, t):
        sg, rg = model.apply(vars_, x + i * 1e-6, v, s, t)
        return sg.mean() + rg.mean()

    return jax.vmap(one)(xyz, vd, sc, tc).mean()


# ---- phase: compositing only ------------------------------------------------
def composite_body(i, sig0, rgb0, zv):
    rgb, depth, acc = volume_render(sig0 + i * 1e-6, rgb0, zv)
    return rgb.mean() + depth.mean() + acc.mean()


# ---- phase: full render ------------------------------------------------------
def full_body(field_for):
    def body(i, params, keys, sc, tc):
        def one(key, s, t):
            out = render_rays_frustum(
                field_for(params, s, t), jax.random.fold_in(key, i), cam, K,
                roi, diag, n_samples=S, im_sz=IM_SZ, shapenet_obj_cood=True)
            return out["rgb"].mean() + out["depth"].mean() + out["acc_trans"].mean()

        return jax.vmap(one)(keys, sc, tc).mean()

    return body


phases = sys.argv[1:] or ["sample", "field_pallas", "field_xla", "composite",
                          "full_pallas", "full_xla"]
for ph in phases:
    if ph == "sample":
        timed("sample+pe", loop(sample_body), keys)
    elif ph == "field_pallas":
        timed("field pallas", loop(field_body_pallas), packed, xyz, vd, sc, tc)
    elif ph == "field_xla":
        timed("field xla", loop(field_body_xla), variables, xyz, vd, sc, tc)
    elif ph == "composite":
        timed("composite", loop(composite_body), sig0, rgb0, zv)
    elif ph == "full_pallas":
        timed("full pallas", loop(full_body(
            lambda pk, s, t: (lambda x, v: pallas_field(pk, x, v, s, t)))),
            packed, keys, sc, tc)
    elif ph == "full_xla":
        timed("full xla", loop(full_body(
            lambda vars_, s, t: (lambda x, v: model.apply(vars_, x, v, s, t)))),
            variables, keys, sc, tc)
