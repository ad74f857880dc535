"""Round-3 render-path stage isolation on the real TPU.

Measures where the gap between the full render path (~1.45-1.49M rays/s,
BENCH_r02) and the matmul shape ceiling (1.81M rays/s) goes, by ablating one
stage at a time. Variants (PROFILE_VARIANTS=comma list, default all):

  base    : sampling -> f32 PE -> pallas field -> XLA compositing (current path)
  pe_bf16 : same but xpe/dpe streamed to the kernel in bf16 (numerically
            identical: the kernel casts operands to bf16 at the first matmul
            anyway; streaming bf16 halves the PE's HBM write+read traffic)
  nocomp  : pe_bf16 minus XLA compositing (outputs summed raw) — upper bound
            on what fusing compositing into the kernel can recover
  nosamp  : pe_bf16 with sampling+PE hoisted OUT of the timed loop (per-iter
            work = kernel + compositing only) — isolates sampling+PE cost
  chain   : kernel only on prebuilt encodings (the shape-ceiling check)

Each variant runs the same 20-iteration jitted fori_loop at the bench shape
(32 objects x 1024 rays x 64 samples). A loop-carried dependency (xyz
perturbed by acc*1e-30) defeats XLA loop-invariant hoisting in the ablated
variants.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from supnerf_tpu.geometry.rays import get_rays, sample_from_rays
from supnerf_tpu.models import build_model, init_model_variables
from supnerf_tpu.models.nerf_mlp import positional_encoding
from supnerf_tpu.ops.pallas_field import (
    _fwd_pallas_call,
    _precast_weights,
    conditioned_latents,
    flatten_weights,
    pack_decoder_params,
)
from supnerf_tpu.ops.volume_render import volume_render
from supnerf_tpu.render.renderer import apply_obj_coord_transform, frustum_near_far

B = int(os.environ.get("BENCH_OBJECTS", "32"))
IM_SZ, S = 32, 64
R = IM_SZ * IM_SZ
N_ITERS = int(os.environ.get("BENCH_ITERS", "20"))
TILE_M = 1024

HP = {"shape_blocks": 3, "texture_blocks": 1, "latent_dim": 256,
      "pose_shortcut": 1, "pred_wlh": 0}

model = build_model("supnerf", HP)
variables = init_model_variables(model, jax.random.PRNGKey(0), img_size=32)
packed = pack_decoder_params(variables["params"]["decoder"], 3, 1)
WT = _precast_weights(flatten_weights(packed), jnp.bfloat16)

K = jnp.asarray([[800.0, 0, 640], [0, 800, 360], [0, 0, 1]])
roi = jnp.asarray([500.0, 200.0, 700.0, 400.0])
cam = jnp.concatenate([jnp.eye(3), jnp.asarray([[0.0], [0.0], [-20.0]])], axis=1)
diag = jnp.float32(5.3)

keys = jax.random.split(jax.random.PRNGKey(0), B)
shapecodes = jax.random.normal(jax.random.PRNGKey(1), (B, 256)) * 0.1
texturecodes = jax.random.normal(jax.random.PRNGKey(2), (B, 256)) * 0.1


def kernel_call(xpe, dpe, zs, zt):
    return _fwd_pallas_call(WT, xpe, dpe, zs, zt, shape_blocks=3,
                            texture_blocks=1, tile_m=TILE_M,
                            dtype=jnp.bfloat16, interpret=False)


def sample_and_pe(key, pe_dtype):
    rays_o, viewdir = get_rays(K, cam, roi, (IM_SZ, IM_SZ))
    near, far = frustum_near_far(cam, diag)
    xyz, vds, z_vals = sample_from_rays(key, rays_o, viewdir, near, far, S)
    xyz = xyz / diag
    xyz, vds = apply_obj_coord_transform(xyz, vds, True)
    xpe = positional_encoding(xyz.reshape(-1, 3), 10).astype(pe_dtype)
    dpe = positional_encoding(vds.reshape(-1, 3), 4).astype(pe_dtype)
    return xpe, dpe, z_vals


def render_one(key, sc, tc, eps, pe_dtype, compose):
    zs, zt = conditioned_latents(packed, sc, tc)
    xpe, dpe, z_vals = sample_and_pe(key, pe_dtype)
    xpe = xpe + eps.astype(pe_dtype)
    sigma, rgb = kernel_call(xpe, dpe, zs, zt)
    if not compose:
        return sigma.sum() + rgb.sum()
    rgb_o, depth, acc = volume_render(
        sigma.reshape(R, S, 1), rgb.reshape(R, S, 3), z_vals[None, :])
    return rgb_o.mean() + depth.mean() + acc.mean()


def timed(fn, *args):
    f = jax.jit(fn)
    jax.block_until_ready(f(*[a + 0.01 if a.dtype == jnp.float32 and a.ndim > 1
                              else a for a in args]))
    t0 = time.perf_counter()
    jax.block_until_ready(f(*args))
    dt = time.perf_counter() - t0
    return B * R * N_ITERS / dt


def loop_full(pe_dtype, compose):
    def fn(keys, sc, tc):
        def body(i, acc):
            ks = jax.vmap(lambda k: jax.random.fold_in(k, i))(keys)
            eps = acc * 1e-30
            out = jax.vmap(lambda k, s, t: render_one(
                k, s, t, eps, pe_dtype, compose))(ks, sc, tc)
            return acc + out.mean()
        return jax.lax.fori_loop(0, N_ITERS, body, jnp.float32(0.0))
    return fn


def loop_nosamp():
    """Sampling+PE hoisted: per-iter work = kernel + compositing."""
    def fn(keys, sc, tc):
        zs, zt = jax.vmap(lambda s, t: conditioned_latents(packed, s, t))(
            sc, tc)
        xpe, dpe, z_vals = jax.vmap(
            lambda k: sample_and_pe(k, jnp.bfloat16))(keys)

        def body(i, acc):
            eps = (acc * 1e-30).astype(jnp.bfloat16)

            def one(xp, dp, zs1, zt1):
                sigma, rgb = kernel_call(xp + eps, dp, zs1, zt1)
                rgb_o, depth, at = volume_render(
                    sigma.reshape(R, S, 1), rgb.reshape(R, S, 3),
                    z_vals[0][None, :])
                return rgb_o.mean() + depth.mean() + at.mean()

            return acc + jax.vmap(one)(xpe, dpe, zs, zt).mean()
        return jax.lax.fori_loop(0, N_ITERS, body, jnp.float32(0.0))
    return fn


def loop_chain():
    """Kernel only on prebuilt bf16 encodings."""
    def fn(keys, sc, tc):
        zs, zt = jax.vmap(lambda s, t: conditioned_latents(packed, s, t))(
            sc, tc)
        xpe, dpe, _ = jax.vmap(lambda k: sample_and_pe(k, jnp.bfloat16))(keys)

        def body(i, acc):
            eps = (acc * 1e-30).astype(jnp.bfloat16)

            def one(xp, dp, zs1, zt1):
                sigma, rgb = kernel_call(xp + eps, dp, zs1, zt1)
                return sigma.sum() + rgb.sum()

            return acc + jax.vmap(one)(xpe, dpe, zs, zt).mean()
        return jax.lax.fori_loop(0, N_ITERS, body, jnp.float32(0.0))
    return fn


def loop_fused(pe_in_kernel=False, tile_m=TILE_M, compose_dtype=jnp.float32):
    """Fused field+compositing kernel (ops/pallas_render): field chain AND
    compositing in one kernel, (TILE_R, 128) writeback. pe_in_kernel=True
    additionally streams raw f32 points and computes the PE in-kernel via
    split first-layer matmuls."""
    from supnerf_tpu.ops.pallas_render import field_composite_pallas

    def fn(keys, sc, tc):
        def body(i, acc):
            ks = jax.vmap(lambda k: jax.random.fold_in(k, i))(keys)
            eps = acc * 1e-30

            def one(key, sc1, tc1):
                rays_o, viewdir = get_rays(K, cam, roi, (IM_SZ, IM_SZ))
                near, far = frustum_near_far(cam, diag)
                xyz, vds, z_vals = sample_from_rays(key, rays_o, viewdir,
                                                    near, far, S)
                xyz = xyz / diag + eps
                xyz, vds = apply_obj_coord_transform(xyz, vds, True)
                rgb, depth, at = field_composite_pallas(
                    packed, xyz, vds, z_vals, sc1, tc1, tile_m=tile_m,
                    dtype=jnp.bfloat16, pe_in_kernel=pe_in_kernel,
                    compose_dtype=compose_dtype)
                return rgb.mean() + depth.mean() + at.mean()

            return acc + jax.vmap(one)(ks, sc, tc).mean()
        return jax.lax.fori_loop(0, N_ITERS, body, jnp.float32(0.0))
    return fn


VARIANTS = {
    "base": lambda: timed(loop_full(jnp.float32, True), keys, shapecodes, texturecodes),
    "fused": lambda: timed(loop_fused(False), keys, shapecodes, texturecodes),
    "fused_raw": lambda: timed(loop_fused(True), keys, shapecodes, texturecodes),
    "fused_bf16c": lambda: timed(loop_fused(False, compose_dtype=jnp.bfloat16),
                                 keys, shapecodes, texturecodes),
    "fused_t512": lambda: timed(loop_fused(False, tile_m=512),
                                keys, shapecodes, texturecodes),
    "fused_t2048": lambda: timed(loop_fused(False, tile_m=2048),
                                 keys, shapecodes, texturecodes),
    "pe_bf16": lambda: timed(loop_full(jnp.bfloat16, True), keys, shapecodes, texturecodes),
    "nocomp": lambda: timed(loop_full(jnp.bfloat16, False), keys, shapecodes, texturecodes),
    "nosamp": lambda: timed(loop_nosamp(), keys, shapecodes, texturecodes),
    "chain": lambda: timed(loop_chain(), keys, shapecodes, texturecodes),
}

if __name__ == "__main__":
    sel = os.environ.get("PROFILE_VARIANTS", "base,pe_bf16,nocomp,nosamp,chain")
    results = {}
    for name in sel.split(","):
        t0 = time.time()
        rays = VARIANTS[name]()
        results[name] = rays
        print(json.dumps({"variant": name, "rays_per_sec": round(rays),
                          "vs_shape_ceiling": round(rays / 1.81e6, 4),
                          "wall_incl_compile_s": round(time.time() - t0, 1)}),
              flush=True)
