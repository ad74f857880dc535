"""Fused Pallas TPU kernel for the conditioned NeRF field (the hot op).

Evaluates the whole CodeNeRF-style decoder chain — positional-encoded points
through 9 dense layers to (sigma, rgb) — inside ONE kernel per ray tile, with
all weights resident in VMEM across the tile loop. This removes the per-layer
HBM round-trips of the XLA path (each (M, 256) activation is ~1 MB per 1k
points) and keeps the MXU fed with (TILE_M, K) x (K, 256) matmuls.

Design notes (published config: W=256, shape_blocks=3, texture_blocks=1):
  - The per-object latent projections (z_shape (3, 256), z_texture (1, 256))
    are computed once per object OUTSIDE the kernel and broadcast-added inside.
  - The viewdir concat is algebraically split: concat([y, dpe]) @ W_vd ==
    y @ W_vd[:256] + dpe @ W_vd[256:], avoiding an in-kernel concat.
  - Positional encodings are computed by XLA (cheap, fusable) and streamed as
    (M, d_xyz) / (M, d_dir) tiles.
  - Matmuls run in the requested dtype (bfloat16 by default) with float32
    accumulation (preferred_element_type).
  - field_forward_pallas is the forward-only entry (inference renders).
    field_apply_pallas is the DIFFERENTIABLE entry for the TTO hot loop: a
    jax.custom_vjp whose backward is a second fused kernel that replays the
    forward chain tile-by-tile from STREAMED positional encodings (no HBM
    activation stash, no in-kernel transcendentals) and emits gradients
    w.r.t. the raw points (-> pose via xyz/viewdir, PE chain rule via the
    streamed sin/cos columns + a ladder matmul) and the per-object
    conditioned latents (-> shape/texture codes). Decoder WEIGHTS get zero
    cotangents — TTO freezes the network (reference
    optimizer_nuscenes.py:1762 optimizes only codes+pose), so their gradient
    graph is dead code XLA removes; do NOT use field_apply_pallas where
    decoder weights must train.
  - Parity with the flax decoder (values and grads) is tested in interpret
    mode on CPU and on-device on TPU.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from supnerf_tpu.models.nerf_mlp import (
    positional_encoding,
    positional_encoding_doubling,
)


def pack_decoder_params(decoder_params: dict, shape_blocks: int = 3,
                        texture_blocks: int = 1) -> dict:
    """Flatten flax CodeNeRFDecoder params into the kernel's operand dict.
    decoder_params: variables['params']['decoder'] (or the decoder scope)."""
    p = decoder_params

    def kb(name):
        return p[name]["kernel"], p[name]["bias"]

    packed = {
        "w_xyz": kb("encoding_xyz"),
        "w_shape": [kb(f"shape_layer_{j + 1}") for j in range(shape_blocks)],
        "w_shape_latent": [kb(f"shape_latent_layer_{j + 1}") for j in range(shape_blocks)],
        "w_enc_shape": kb("encoding_shape"),
        "w_sigma": kb("sigma"),
        "w_vd": kb("encoding_viewdir"),
        "w_texture": [kb(f"texture_layer_{j + 1}") for j in range(texture_blocks)],
        "w_texture_latent": [kb(f"texture_latent_layer_{j + 1}") for j in range(texture_blocks)],
        "w_rgb1": kb("rgb_hidden"),
        "w_rgb2": kb("rgb_out"),
    }
    return packed


def conditioned_latents(packed: dict, shapecode, texturecode):
    """Per-object latent projections z_j = relu(code @ Wz + bz): returns
    (z_shape (n_shape, W), z_texture (n_tex, W))."""
    zs = jnp.stack([
        jax.nn.relu(shapecode @ k + b) for k, b in packed["w_shape_latent"]
    ])
    zt = jnp.stack([
        jax.nn.relu(texturecode @ k + b) for k, b in packed["w_texture_latent"]
    ])
    return zs, zt


def _check_block_counts(zs, zt, shape_blocks: int, texture_blocks: int):
    """Static sanity check: the packed params' block counts must match the
    kernel's static configuration — an out-of-range block index inside the
    kernel CLAMPS silently (wrong values, no error) instead of raising."""
    if zs.shape[-2] != shape_blocks or zt.shape[-2] != texture_blocks:
        raise ValueError(
            f"packed decoder has {zs.shape[-2]} shape / {zt.shape[-2]} texture "
            f"blocks but the kernel was configured for {shape_blocks}/"
            f"{texture_blocks} — pass matching shape_blocks/texture_blocks")


def _pe_for_dtype(dtype):
    """XLA-side forward PE selector: the doubling-recurrence variant when the
    kernel casts operands to bf16 anyway (measured max abs deviation ~3e-4 at
    degree 10, an order below bf16 eps; 10x fewer VPU transcendentals —
    VALIDATION.md round 3), exact sin/cos otherwise so the f32 interpret-mode
    gradient-parity tests stay exact."""
    return (positional_encoding_doubling
            if np.dtype(dtype) == np.dtype(jnp.bfloat16)
            else positional_encoding)


def _pe_rank2(x, degree: int):
    """In-kernel positional encoding, rank-2 only (Mosaic-friendly):
    [x, sin(2^i x)..., cos(2^i x)...] with the (freq-major, coord-minor)
    layout of models.nerf_mlp.positional_encoding. x: (m, D) -> (m, D(2L+1))."""
    xx = jnp.concatenate([x * (2.0 ** i) for i in range(degree)], axis=1)
    return jnp.concatenate([x, jnp.sin(xx), jnp.cos(xx)], axis=1)


def _field_chain_to_heads(n_shape: int, n_tex: int, dtype, xpe, dpe,
                          zs_ref, zt_ref,
                          wxyz_ref, bxyz_ref, wsh_ref, bsh_ref,
                          wes_ref, bes_ref, wsg_ref, bsg_ref,
                          wvd_a_ref, wvd_b_ref, bvd_ref,
                          wtx_ref, btx_ref, wr1_ref, br1_ref,
                          dir_term=None):
    """The fused decoder chain up to the heads: (sigma (m, 1), hh (m, W2))
    with hh the rgb-hidden activation — callers apply their own rgb head
    (plain (W2, 3) in _field_chain; 128-wide padded payload in the fused
    render kernel, ops/pallas_render.py).

    dir_term, if given, is a precomputed (m, W) viewdir contribution
    (dpe @ Wvd_b already applied; dpe/wvd_b_ref are then ignored) — used by
    the fused render kernel's per-RAY direction-encoding path."""
    f32 = jnp.float32
    # Mosaic requires 32-bit matmul accumulation. Activations are STORED in
    # f32 between layers: bf16 storage was measured ~20% slower on v5e (the
    # per-layer casts cost more VPU time than the saved VMEM bandwidth);
    # operands are cast to the compute dtype at each matmul.
    act = f32

    def mm(x, w):
        return jax.lax.dot_general(
            x.astype(dtype), w.astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )

    def cast(x):
        return x.astype(act)

    y = jnp.maximum(mm(xpe, wxyz_ref[:]) + cast(bxyz_ref[:]), 0)
    for j in range(n_shape):
        y = y + cast(zs_ref[j][None, :])
        y = jnp.maximum(mm(y, wsh_ref[j]) + cast(bsh_ref[j][None, :]), 0)
    y = mm(y, wes_ref[:]) + cast(bes_ref[:])
    sigma = jax.nn.softplus(mm(y, wsg_ref[:]) + bsg_ref[:])
    dterm = mm(dpe, wvd_b_ref[:]) if dir_term is None else cast(dir_term)
    h = mm(y, wvd_a_ref[:]) + dterm + cast(bvd_ref[:])
    h = jnp.maximum(h, 0)
    for j in range(n_tex):
        h = h + cast(zt_ref[j][None, :])
        h = jnp.maximum(mm(h, wtx_ref[j]) + cast(btx_ref[j][None, :]), 0)
    hh = jnp.maximum(mm(h, wr1_ref[:]) + cast(br1_ref[:]), 0)
    return sigma, hh


def _field_chain(n_shape: int, n_tex: int, dtype, xpe, dpe, zs_ref, zt_ref,
                 wxyz_ref, bxyz_ref, wsh_ref, bsh_ref,
                 wes_ref, bes_ref, wsg_ref, bsg_ref,
                 wvd_a_ref, wvd_b_ref, bvd_ref,
                 wtx_ref, btx_ref, wr1_ref, br1_ref, wr2_ref, br2_ref):
    """The fused decoder chain on in-VMEM values xpe/dpe -> (sigma, rgb)."""
    f32 = jnp.float32
    sigma, hh = _field_chain_to_heads(
        n_shape, n_tex, dtype, xpe, dpe, zs_ref, zt_ref,
        wxyz_ref, bxyz_ref, wsh_ref, bsh_ref, wes_ref, bes_ref, wsg_ref,
        bsg_ref, wvd_a_ref, wvd_b_ref, bvd_ref, wtx_ref, btx_ref,
        wr1_ref, br1_ref)
    rgb = jax.lax.dot_general(
        hh.astype(dtype), wr2_ref[:].astype(dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32) + br2_ref[:]
    return sigma, rgb


def _field_kernel(n_shape: int, n_tex: int, dtype,
                  xpe_ref, dpe_ref, zs_ref, zt_ref,
                  wxyz_ref, bxyz_ref, wsh_ref, bsh_ref,
                  wes_ref, bes_ref, wsg_ref, bsg_ref,
                  wvd_a_ref, wvd_b_ref, bvd_ref,
                  wtx_ref, btx_ref, wr1_ref, br1_ref, wr2_ref, br2_ref,
                  sigma_ref, rgb_ref):
    sigma, rgb = _field_chain(
        n_shape, n_tex, dtype, xpe_ref[:], dpe_ref[:], zs_ref, zt_ref,
        wxyz_ref, bxyz_ref, wsh_ref, bsh_ref, wes_ref, bes_ref, wsg_ref,
        bsg_ref, wvd_a_ref, wvd_b_ref, bvd_ref, wtx_ref, btx_ref,
        wr1_ref, br1_ref, wr2_ref, br2_ref)
    sigma_ref[:] = sigma
    rgb_ref[:] = rgb


def _field_kernel_raw(n_shape: int, n_tex: int, dtype, l_xyz: int, l_dir: int,
                      xyz_ref, vd_ref, zs_ref, zt_ref,
                      wxyz_ref, bxyz_ref, wsh_ref, bsh_ref,
                      wes_ref, bes_ref, wsg_ref, bsg_ref,
                      wvd_a_ref, wvd_b_ref, bvd_ref,
                      wtx_ref, btx_ref, wr1_ref, br1_ref, wr2_ref, br2_ref,
                      sigma_ref, rgb_ref):
    """Forward kernel over RAW points: the positional encodings are computed
    in-kernel, so HBM streams only (m, 3) xyz/viewdir instead of (m, 63+27)
    encodings — ~15x less input traffic for the published PE degrees."""
    xpe = _pe_rank2(xyz_ref[:], l_xyz)
    dpe = _pe_rank2(vd_ref[:], l_dir)
    sigma, rgb = _field_chain(
        n_shape, n_tex, dtype, xpe, dpe, zs_ref, zt_ref,
        wxyz_ref, bxyz_ref, wsh_ref, bsh_ref, wes_ref, bes_ref, wsg_ref,
        bsg_ref, wvd_a_ref, wvd_b_ref, bvd_ref, wtx_ref, btx_ref,
        wr1_ref, br1_ref, wr2_ref, br2_ref)
    sigma_ref[:] = sigma
    rgb_ref[:] = rgb


def flatten_weights(packed: dict):
    """packed dict -> the 17-tuple of kernel weight operands (stacked blocks,
    viewdir matmul split at W rows)."""
    W = packed["w_xyz"][0].shape[1]
    w_vd, b_vd = packed["w_vd"]
    return (
        packed["w_xyz"][0], packed["w_xyz"][1],
        jnp.stack([k for k, _ in packed["w_shape"]]),
        jnp.stack([b for _, b in packed["w_shape"]]),
        packed["w_enc_shape"][0], packed["w_enc_shape"][1],
        packed["w_sigma"][0], packed["w_sigma"][1],
        w_vd[:W], w_vd[W:], b_vd,
        jnp.stack([k for k, _ in packed["w_texture"]]),
        jnp.stack([b for _, b in packed["w_texture"]]),
        packed["w_rgb1"][0], packed["w_rgb1"][1],
        packed["w_rgb2"][0], packed["w_rgb2"][1],
    )


def _fwd_pallas_call(wt: tuple, xpe, dpe, zs, zt, *, shape_blocks: int,
                     texture_blocks: int, tile_m: int, dtype, interpret: bool):
    """Run the forward kernel over unpadded (M, d) encodings; returns
    (sigma (M, 1), rgb (M, 3)) in float32.

    The encodings are streamed to the kernel in the COMPUTE dtype: the kernel
    casts matmul operands to `dtype` anyway, so pre-casting in XLA is
    bit-identical and halves the PE's HBM write+read traffic in bf16 (the
    dominant off-chip stream of the forward path: ~180 B/point vs ~360)."""
    M = xpe.shape[0]
    xpe = xpe.astype(dtype)
    dpe = dpe.astype(dtype)
    pad = (-M) % tile_m
    if pad:
        xpe = jnp.pad(xpe, ((0, pad), (0, 0)))
        dpe = jnp.pad(dpe, ((0, pad), (0, 0)))
    Mp = M + pad
    d_xyz, d_dir = xpe.shape[-1], dpe.shape[-1]

    grid = (Mp // tile_m,)
    tile_spec = lambda d: pl.BlockSpec((tile_m, d), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    kernel = functools.partial(_field_kernel, shape_blocks, texture_blocks, dtype)
    sigma, rgb = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile_spec(d_xyz), tile_spec(d_dir)] + [full()] * 19,
        out_specs=[
            pl.BlockSpec((tile_m, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Mp, 3), jnp.float32),
        ],
        interpret=interpret,
    )(xpe, dpe, zs, zt, *wt)
    return sigma[:M], rgb[:M]


def _fwd_pallas_call_raw(wt: tuple, xyz, vd, zs, zt, *, shape_blocks: int,
                         texture_blocks: int, num_xyz_freq: int,
                         num_dir_freq: int, tile_m: int, dtype,
                         interpret: bool):
    """Forward kernel over raw (M, 3) points with in-kernel PE."""
    M = xyz.shape[0]
    pad = (-M) % tile_m
    if pad:
        xyz = jnp.pad(xyz, ((0, pad), (0, 0)))
        vd = jnp.pad(vd, ((0, pad), (0, 0)))
    Mp = M + pad

    grid = (Mp // tile_m,)
    tile_spec = lambda d: pl.BlockSpec((tile_m, d), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    kernel = functools.partial(_field_kernel_raw, shape_blocks, texture_blocks,
                               dtype, num_xyz_freq, num_dir_freq)
    sigma, rgb = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile_spec(3), tile_spec(3)] + [full()] * 19,
        out_specs=[
            pl.BlockSpec((tile_m, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Mp, 3), jnp.float32),
        ],
        interpret=interpret,
    )(xyz, vd, zs, zt, *wt)
    return sigma[:M], rgb[:M]


@functools.partial(jax.jit, static_argnames=("shape_blocks", "texture_blocks",
                                             "num_xyz_freq", "num_dir_freq",
                                             "tile_m", "dtype", "interpret",
                                             "pe_in_kernel"))
def field_forward_pallas(packed: dict, xyz, viewdir, shapecode, texturecode, *,
                         shape_blocks: int = 3, texture_blocks: int = 1,
                         num_xyz_freq: int = 10, num_dir_freq: int = 4,
                         tile_m: int = 1024, dtype: Any = jnp.bfloat16,
                         interpret: bool = False, pe_in_kernel: bool = False):
    """Evaluate the field for one object (forward only; see
    make_pallas_field_fn on the pe_in_kernel default).

    xyz/viewdir: (..., 3); shapecode/texturecode: (latent,).
    Returns (sigmas (..., 1), rgbs (..., 3)) in float32.
    """
    lead_shape = xyz.shape[:-1]
    zs, zt = conditioned_latents(packed, shapecode, texturecode)
    _check_block_counts(zs, zt, shape_blocks, texture_blocks)
    wt = _precast_weights(flatten_weights(packed), dtype)
    if pe_in_kernel:
        sigma, rgb = _fwd_pallas_call_raw(
            wt, xyz.reshape(-1, 3), viewdir.reshape(-1, 3),
            zs, zt, shape_blocks=shape_blocks, texture_blocks=texture_blocks,
            num_xyz_freq=num_xyz_freq, num_dir_freq=num_dir_freq,
            tile_m=tile_m, dtype=dtype, interpret=interpret)
    else:
        pe = _pe_for_dtype(dtype)
        xpe = pe(xyz.reshape(-1, 3), num_xyz_freq)
        dpe = pe(viewdir.reshape(-1, 3), num_dir_freq)
        sigma, rgb = _fwd_pallas_call(
            wt, xpe, dpe, zs, zt,
            shape_blocks=shape_blocks, texture_blocks=texture_blocks,
            tile_m=tile_m, dtype=dtype, interpret=interpret)
    return sigma.reshape(*lead_shape, 1), rgb.reshape(*lead_shape, 3)


# --------------------------------------------------------------------------
# Differentiable path: fused backward kernel (recompute-in-backward) + vjp
# --------------------------------------------------------------------------

def _freq_ladder(degree: int):
    """(3, 3*degree) selector F with F[c, i*3 + c] = 2^i, so x @ F equals the
    freq-major concat([x * 2^i for i]) layout of positional_encoding."""
    f = np.zeros((3, 3 * degree), np.float32)
    for i in range(degree):
        for c in range(3):
            f[c, i * 3 + c] = 2.0 ** i
    return jnp.asarray(f)


def _pe_bwd_from_streamed(pe_vals, g_pe, degree: int, ft_ref, mm):
    """Backward of the positional encoding USING THE STREAMED ENCODING for
    the sin/cos values: pe_vals = [x, sin(xx), cos(xx)] (m, 3(2L+1)) is the
    same tensor the forward consumed, so no transcendental is ever computed
    in-kernel (the round-2/3 profiles showed Mosaic's narrow-lane sin/cos +
    concat constructions cost ~0.8x of a full forward pass — VALIDATION.md).
    The frequency-ladder transpose is one small (m, 3L) @ (3L, 3) matmul.
    g_pe (m, 3(2L+1)) -> dx (m, 3)."""
    D = 3
    LD = degree * D
    f32 = jnp.float32
    sin_xx = pe_vals[:, D:D + LD].astype(f32)
    cos_xx = pe_vals[:, D + LD:].astype(f32)
    d_xx = cos_xx * g_pe[:, D:D + LD] - sin_xx * g_pe[:, D + LD:]
    return g_pe[:, :D] + mm(d_xx, ft_ref[:])


def _field_bwd_kernel(n_shape: int, n_tex: int, dtype, l_xyz: int, l_dir: int,
                      xpe_ref, dpe_ref, fxt_ref, fdt_ref, zs_ref, zt_ref,
                      wxyz_ref, bxyz_ref, wsh_ref, bsh_ref,
                      wes_ref, bes_ref, wsg_ref, bsg_ref,
                      wvd_a_ref, wvd_b_ref, bvd_ref,
                      wtx_ref, btx_ref, wr1_ref, br1_ref, wr2_ref, br2_ref,
                      dsig_ref, drgb_ref,
                      dxyz_ref, dvd_ref, dzs_ref, dzt_ref):
    """Recompute the forward chain for this tile from the STREAMED positional
    encodings (keeping only relu outputs as masks, all in VMEM — no HBM
    activation stash), then run the transposed chain to produce gradients
    w.r.t. the raw points (-> pose) and the conditioned latents (-> codes).
    The PE chain rule reuses the streamed sin/cos columns plus a ladder
    matmul (_pe_bwd_from_streamed) — no in-kernel transcendentals, which cost
    ~0.8x of a forward pass in Mosaic's narrow-lane form and capped the
    round-2 backward at ~54%% of the shape ceiling. Weight gradients are NOT
    computed (frozen-decoder TTO semantics)."""
    f32 = jnp.float32

    def mm(x, w):      # x @ w
        return jax.lax.dot_general(
            x.astype(dtype), w.astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32)

    def mm_t(g, w):    # g @ w.T  (contract g dim1 with w dim1)
        return jax.lax.dot_general(
            g.astype(dtype), w.astype(dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32)

    def cast(x):
        return x.astype(f32)

    # ---- forward recompute (store relu outputs; mask(x) == x > 0) ----------
    xpe = xpe_ref[:]
    dpe = dpe_ref[:]

    # relu outputs survive only as sign masks in the transposed chain, so
    # the stash keeps them in the matmul dtype (sign-preserving; halves the
    # VMEM the stash pins — same reasoning as _field_train_bwd_kernel)
    stash = lambda t: t.astype(dtype)
    y0 = stash(jnp.maximum(mm(xpe, wxyz_ref[:]) + cast(bxyz_ref[:]), 0))
    ys = []
    y = y0
    for j in range(n_shape):
        y = stash(jnp.maximum(mm(cast(y) + cast(zs_ref[j][None, :]),
                                 wsh_ref[j]) + cast(bsh_ref[j][None, :]), 0))
        ys.append(y)
    e = mm(cast(y), wes_ref[:]) + cast(bes_ref[:])
    sig_gate = jax.nn.sigmoid(mm(e, wsg_ref[:]) + cast(bsg_ref[:]))  # (m, 1)
    v = stash(jnp.maximum(mm(e, wvd_a_ref[:]) + mm(dpe, wvd_b_ref[:])
                          + cast(bvd_ref[:]), 0))
    hs = []
    h = v
    for j in range(n_tex):
        h = stash(jnp.maximum(mm(cast(h) + cast(zt_ref[j][None, :]),
                                 wtx_ref[j]) + cast(btx_ref[j][None, :]), 0))
        hs.append(h)
    hh = stash(jnp.maximum(mm(cast(h), wr1_ref[:]) + cast(br1_ref[:]), 0))

    # ---- transposed chain ---------------------------------------------------
    g_hh = jnp.where(cast(hh) > 0, mm_t(cast(drgb_ref[:]), wr2_ref[:]), 0.0)
    g = mm_t(g_hh, wr1_ref[:])
    dzt_rows = [None] * n_tex
    for j in reversed(range(n_tex)):
        g = jnp.where(cast(hs[j]) > 0, g, 0.0)
        g = mm_t(g, wtx_ref[j])
        dzt_rows[j] = jnp.sum(g, axis=0)
    g_v = jnp.where(cast(v) > 0, g, 0.0)
    dvd_ref[:] = _pe_bwd_from_streamed(dpe, mm_t(g_v, wvd_b_ref[:]), l_dir,
                                       fdt_ref, mm)
    g_sig = cast(dsig_ref[:]) * sig_gate                       # (m, 1)
    g_e = mm_t(g_v, wvd_a_ref[:]) + mm_t(g_sig, wsg_ref[:])
    g = mm_t(g_e, wes_ref[:])
    dzs_rows = [None] * n_shape
    for j in reversed(range(n_shape)):
        g = jnp.where(cast(ys[j]) > 0, g, 0.0)
        g = mm_t(g, wsh_ref[j])
        dzs_rows[j] = jnp.sum(g, axis=0)
    g = jnp.where(cast(y0) > 0, g, 0.0)
    dxyz_ref[:] = _pe_bwd_from_streamed(xpe, mm_t(g, wxyz_ref[:]), l_xyz,
                                        fxt_ref, mm)
    dzs_ref[:] = jnp.stack(dzs_rows)[None]
    dzt_ref[:] = jnp.stack(dzt_rows)[None]


def _bwd_pallas_call(wt: tuple, xpe, dpe, zs, zt, dsig, drgb, *,
                     shape_blocks: int, texture_blocks: int,
                     num_xyz_freq: int, num_dir_freq: int, tile_m: int,
                     dtype, interpret: bool):
    M = xpe.shape[0]
    xpe = xpe.astype(dtype)
    dpe = dpe.astype(dtype)
    pad = (-M) % tile_m
    if pad:
        pad2 = ((0, pad), (0, 0))
        xpe, dpe = jnp.pad(xpe, pad2), jnp.pad(dpe, pad2)
        dsig, drgb = jnp.pad(dsig, pad2), jnp.pad(drgb, pad2)
    Mp = M + pad
    W = wt[0].shape[1]
    d_xyz, d_dir = xpe.shape[-1], dpe.shape[-1]
    n_tiles = Mp // tile_m

    tile_spec = lambda d: pl.BlockSpec((tile_m, d), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    part_spec = lambda n: pl.BlockSpec((1, n, W), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)

    kernel = functools.partial(_field_bwd_kernel, shape_blocks, texture_blocks,
                               dtype, num_xyz_freq, num_dir_freq)
    dxyz, dvd, dzs_p, dzt_p = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[tile_spec(d_xyz), tile_spec(d_dir)] + [full()] * 21
                 + [tile_spec(1), tile_spec(3)],
        out_specs=[tile_spec(3), tile_spec(3),
                   part_spec(shape_blocks), part_spec(texture_blocks)],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, 3), jnp.float32),
            jax.ShapeDtypeStruct((Mp, 3), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, shape_blocks, W), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, texture_blocks, W), jnp.float32),
        ],
        interpret=interpret,
    )(xpe, dpe, _freq_ladder(num_xyz_freq).T, _freq_ladder(num_dir_freq).T,
      zs, zt, *wt, dsig, drgb)
    return dxyz[:M], dvd[:M], dzs_p.sum(axis=0), dzt_p.sum(axis=0)


# weight-tuple indices that are MATRICES (pre-cast to the compute dtype once
# in XLA, so the kernels skip a per-tile VPU cast of every weight); biases and
# latents stay float32 — they are added to float32 accumulators.
_MAT_IDX = frozenset({0, 2, 4, 6, 8, 9, 11, 13, 15})


def _precast_weights(wt: tuple, dtype):
    return tuple(w.astype(dtype) if i in _MAT_IDX else w
                 for i, w in enumerate(wt))


@functools.lru_cache(maxsize=None)
def _make_field_core(shape_blocks: int, texture_blocks: int, num_xyz_freq: int,
                     num_dir_freq: int, tile_fwd: int, tile_bwd: int, dtype,
                     interpret: bool):
    """custom_vjp core over (xyz, vd, zs, zt, weights-tuple) -> (sigma, rgb).
    Cotangents: points + latents real; weights ZERO (frozen decoder).

    The primal computes the positional encodings in XLA (in-kernel PE loses
    ~35% forward throughput to narrow-lane VPU ops — see VALIDATION.md
    round-2) and runs the xpe-input kernel; only the raw points are saved as
    residuals. The backward RE-ENCODES them in XLA (cheap, fused) and streams
    the encodings to the backward kernel, which replays the forward chain
    from them and applies the PE chain rule via the streamed sin/cos columns
    (_pe_bwd_from_streamed) — no transcendental ever runs inside a kernel,
    and dxyz/dvd come out directly."""

    @jax.custom_vjp
    def core(xyz, vd, zs, zt, wt):
        pe = _pe_for_dtype(dtype)
        xpe = pe(xyz, num_xyz_freq)
        dpe = pe(vd, num_dir_freq)
        return _fwd_pallas_call(
            wt, xpe, dpe, zs, zt, shape_blocks=shape_blocks,
            texture_blocks=texture_blocks, tile_m=tile_fwd, dtype=dtype,
            interpret=interpret)

    def core_fwd(xyz, vd, zs, zt, wt):
        return core(xyz, vd, zs, zt, wt), (xyz, vd, zs, zt, wt)

    def core_bwd(res, cts):
        xyz, vd, zs, zt, wt = res
        dsig, drgb = cts
        pe = _pe_for_dtype(dtype)
        dxyz, dvd, dzs, dzt = _bwd_pallas_call(
            wt, pe(xyz, num_xyz_freq), pe(vd, num_dir_freq), zs, zt,
            dsig, drgb, shape_blocks=shape_blocks,
            texture_blocks=texture_blocks, num_xyz_freq=num_xyz_freq,
            num_dir_freq=num_dir_freq, tile_m=tile_bwd, dtype=dtype,
            interpret=interpret)
        return dxyz, dvd, dzs, dzt, jax.tree.map(jnp.zeros_like, wt)

    core.defvjp(core_fwd, core_bwd)
    return core


def field_apply_pallas(packed: dict, xyz, viewdir, shapecode, texturecode, *,
                       shape_blocks: int = 3, texture_blocks: int = 1,
                       num_xyz_freq: int = 10, num_dir_freq: int = 4,
                       tile_fwd: int = 1024, tile_bwd: int = 512,
                       dtype: Any = jnp.bfloat16, interpret: bool = False):
    """Differentiable fused field for the TTO hot loop.

    BOTH passes compute the positional encodings in XLA (cheap, fused; no
    transcendental ever runs inside a kernel — see _make_field_core): the
    forward streams them to the xpe-input kernel, and the backward RE-ENCODES
    the raw-point residuals in XLA, streams the encodings to the backward
    kernel, which replays the forward chain in-VMEM and applies the PE chain
    rule via the streamed sin/cos columns (_pe_bwd_from_streamed), so
    gradients flow to xyz/viewdir (-> pose) and to shapecode/texturecode
    (through the conditioned latent projections) with no HBM activation
    stash. Decoder weights receive ZERO cotangent —
    use only where the decoder is frozen (test-time optimization; reference
    optimizer_nuscenes.py:1762 optimizes codes+pose only)."""
    lead_shape = xyz.shape[:-1]
    zs, zt = conditioned_latents(packed, shapecode, texturecode)
    _check_block_counts(zs, zt, shape_blocks, texture_blocks)
    core = _make_field_core(shape_blocks, texture_blocks, num_xyz_freq,
                            num_dir_freq, tile_fwd, tile_bwd, dtype, interpret)
    wt = _precast_weights(flatten_weights(packed), dtype)
    sigma, rgb = core(xyz.reshape(-1, 3), viewdir.reshape(-1, 3), zs, zt, wt)
    return sigma.reshape(*lead_shape, 1), rgb.reshape(*lead_shape, 3)


def resolve_decoder_kernel_config(model, variables):
    """Shared gating + packing for the fused-kernel call sites (the TTO core
    and the train step): validates the decoder scope, packs its params, and
    returns (packed, kwargs) with the static kernel configuration — blocks,
    PE degrees, compute dtype, tile sizes, and interpret mode (CPU tests run
    the kernels in f32 interpret mode; the per-object tile fit for training
    shrinks tiles further as needed)."""
    # decoder_kernel_compatible checks every layer pack_decoder_params will
    # index (distinguishing the CodeNeRF conditioned-latent structure from
    # raw AutoRF's feature-averaging decoder, rejecting partial checkpoints,
    # and rejecting zero block counts — the backward kernels jnp.stack
    # per-block gradient rows, undefined for zero blocks) so incompatibility
    # surfaces as this ValueError rather than a KeyError mid-packing
    if not decoder_kernel_compatible(model, variables):
        raise ValueError(
            "field_impl='pallas' needs a CodeNeRF-style decoder scope with "
            ">=1 shape/texture blocks and the full layer set "
            "(SUPNeRF / AutoRFMix / CodeNeRF)")
    dec = variables["params"]["decoder"]
    n_sb = getattr(model, "shape_blocks", 3)
    n_tb = getattr(model, "texture_blocks", 1)
    packed = pack_decoder_params(dec, n_sb, n_tb)
    interp = jax.default_backend() == "cpu"
    kwargs = dict(
        shape_blocks=n_sb, texture_blocks=n_tb,
        num_xyz_freq=getattr(model, "num_xyz_freq", 10),
        num_dir_freq=getattr(model, "num_dir_freq", 4),
        dtype=jnp.float32 if interp else jnp.bfloat16,
        # fwd kernels (per-point field and per-ray render alike) are
        # VMEM-light; 2048 measured equal-or-better than 1024 on every
        # swept path (train render, TTO loop, bench_render) — see the
        # round-3 sweep tables in VALIDATION.md
        tile_fwd=128 if interp else 2048,
        # bwd default is the FIELD-kernel optimum (weight-grad accumulators
        # resident; 1024 OOMs). The render-backward call sites override to
        # 1024 where the sweep shows it fits and wins (train_step, tto/core)
        tile_bwd=128 if interp else 512,
        interpret=interp)
    return packed, kwargs


def decoder_kernel_compatible(model, variables) -> bool:
    """Cheap structural check (dict lookups only — no packing) that the
    decoder scope has EVERY layer pack_decoder_params will index: the
    CodeNeRF conditioned-latent structure with >=1 shape/texture blocks.
    True iff resolve_decoder_kernel_config would succeed end-to-end."""
    dec = variables["params"].get("decoder")
    if dec is None:
        return False
    n_sb = getattr(model, "shape_blocks", 3)
    n_tb = getattr(model, "texture_blocks", 1)
    if n_sb < 1 or n_tb < 1:
        return False
    required = (["encoding_xyz", "encoding_shape", "sigma",
                 "encoding_viewdir", "rgb_hidden", "rgb_out"]
                + [f"shape_layer_{j + 1}" for j in range(n_sb)]
                + [f"shape_latent_layer_{j + 1}" for j in range(n_sb)]
                + [f"texture_layer_{j + 1}" for j in range(n_tb)]
                + [f"texture_latent_layer_{j + 1}" for j in range(n_tb)])
    return all(k in dec for k in required)


def resolve_field_impl(requested: str, model, variables) -> str:
    """Resolve the 'auto' field implementation: 'pallas' when running on an
    accelerator backend AND the decoder is kernel-compatible
    (decoder_kernel_compatible — the exact layer set the kernels pack), else
    'flax' (XLA autodiff; on CPU the kernels would run in interpret mode,
    which is only meant for tests). Explicit 'flax'/'pallas' pass through
    untouched, including their error behavior."""
    if requested != "auto":
        return requested
    if jax.default_backend() == "cpu":
        return "flax"
    return "pallas" if decoder_kernel_compatible(model, variables) else "flax"


def resolve_field_impl_cfg(cfg, model, variables):
    """dataclasses.replace(cfg, field_impl=<resolved>) when cfg.field_impl
    is 'auto'; cfg unchanged otherwise. The single helper behind every
    'auto' call site (TTO core/driver, multiview, trainer) so the
    resolution policy cannot diverge between them."""
    if cfg.field_impl != "auto":
        return cfg
    import dataclasses

    return dataclasses.replace(
        cfg, field_impl=resolve_field_impl("auto", model, variables))


# --------------------------------------------------------------------------
# Training path: fused fwd+bwd WITH weight gradients (object-batched call)
# --------------------------------------------------------------------------

def conditioned_latents_batched(packed: dict, shapecodes, texturecodes):
    """Per-object latent projections for a code BATCH: (B, latent) ->
    (zs (B, n_shape, W), zt (B, n_tex, W))."""
    zs = jnp.stack([
        jax.nn.relu(shapecodes @ k + b) for k, b in packed["w_shape_latent"]
    ], axis=1)
    zt = jnp.stack([
        jax.nn.relu(texturecodes @ k + b) for k, b in packed["w_texture_latent"]
    ], axis=1)
    return zs, zt


def _field_train_fwd_kernel(n_shape: int, n_tex: int, dtype,
                            xpe_ref, dpe_ref, zs_ref, zt_ref,
                            wxyz_ref, bxyz_ref, wsh_ref, bsh_ref,
                            wes_ref, bes_ref, wsg_ref, bsg_ref,
                            wvd_a_ref, wvd_b_ref, bvd_ref,
                            wtx_ref, btx_ref, wr1_ref, br1_ref, wr2_ref, br2_ref,
                            sigma_ref, rgb_ref):
    """Forward kernel with PER-OBJECT latent blocks: zs_ref/zt_ref are
    (1, n, W) blocks selected by the tile's object index."""
    sigma, rgb = _field_chain(
        n_shape, n_tex, dtype, xpe_ref[:], dpe_ref[:],
        zs_ref[0], zt_ref[0],
        wxyz_ref, bxyz_ref, wsh_ref, bsh_ref, wes_ref, bes_ref, wsg_ref,
        bsg_ref, wvd_a_ref, wvd_b_ref, bvd_ref, wtx_ref, btx_ref,
        wr1_ref, br1_ref, wr2_ref, br2_ref)
    sigma_ref[:] = sigma
    rgb_ref[:] = rgb


def _field_train_bwd_kernel(n_shape: int, n_tex: int, dtype,
                            tiles_per_obj: int,
                            xpe_ref, dpe_ref, zs_ref, zt_ref,
                            wxyz_ref, bxyz_ref, wsh_ref, bsh_ref,
                            wes_ref, bes_ref, wsg_ref, bsg_ref,
                            wvd_a_ref, wvd_b_ref, bvd_ref,
                            wtx_ref, btx_ref, wr1_ref, br1_ref, wr2_ref, br2_ref,
                            dsig_ref, drgb_ref,
                            dxpe_ref, ddpe_ref, dzs_ref, dzt_ref,
                            dwxyz_ref, dbxyz_ref, dwsh_ref, dbsh_ref,
                            dwes_ref, dbes_ref, dwsg_ref, dbsg_ref,
                            dwvd_a_ref, dwvd_b_ref, dbvd_ref,
                            dwtx_ref, dbtx_ref, dwr1_ref, dbr1_ref,
                            dwr2_ref, dbr2_ref):
    """Training backward: recompute the forward in-VMEM, then the transposed
    chain, emitting gradients for EVERYTHING — the positional encodings, the
    per-object latents (accumulated per object across its tiles), and all
    decoder weights/biases (accumulated across the whole sequential grid into
    constant-index output blocks; initialized on the first tile)."""
    f32 = jnp.float32
    i = pl.program_id(0)

    def mm(x, w):
        return jax.lax.dot_general(
            x.astype(dtype), w.astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32)

    def mm_t(g, w):    # g @ w.T
        return jax.lax.dot_general(
            g.astype(dtype), w.astype(dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32)

    def mm_xg(x, g):   # x.T @ g  (weight gradient; contract tile rows)
        return jax.lax.dot_general(
            x.astype(dtype), g.astype(dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    def cast(x):
        return x.astype(f32)

    # ---- forward recompute -------------------------------------------------
    # The stash (relu outputs + e) is kept in the MATMUL dtype: every use —
    # weight-grad/transposed matmuls and the relu sign masks — consumes the
    # dtype-cast value anyway, so a bf16 stash is numerically equivalent
    # (double-rounding of the +latent sums is sub-bf16-ulp) and halves the
    # VMEM the stash pins across the backward, which is what capped tile_bwd
    # at 512 (VALIDATION.md round-2 tile sweep). Layer INPUTS
    # (a_j = y_{j-1} + zs_j) are recomputed from the stash at weight-grad
    # time instead of being stored.
    xpe = xpe_ref[:]
    dpe = dpe_ref[:]
    zs = cast(zs_ref[0])
    zt = cast(zt_ref[0])
    stash = lambda x: x.astype(dtype)
    y0 = stash(jnp.maximum(mm(xpe, wxyz_ref[:]) + cast(bxyz_ref[:]), 0))
    ys = []            # relu outputs (stash; also the masks)
    y = y0
    for j in range(n_shape):
        a = cast(y) + zs[j][None, :]
        y = stash(jnp.maximum(mm(a, wsh_ref[j]) + cast(bsh_ref[j][None, :]), 0))
        ys.append(y)
    e = stash(mm(y, wes_ref[:]) + cast(bes_ref[:]))
    sig_gate = jax.nn.sigmoid(mm(e, wsg_ref[:]) + cast(bsg_ref[:]))
    v = stash(jnp.maximum(mm(e, wvd_a_ref[:]) + mm(dpe, wvd_b_ref[:])
                          + cast(bvd_ref[:]), 0))
    hs = []
    h = v
    for j in range(n_tex):
        b = cast(h) + zt[j][None, :]
        h = stash(jnp.maximum(mm(b, wtx_ref[j]) + cast(btx_ref[j][None, :]), 0))
        hs.append(h)
    hh = stash(jnp.maximum(mm(h, wr1_ref[:]) + cast(br1_ref[:]), 0))

    # ---- transposed chain + weight grads ------------------------------------
    first = i == 0
    obj_first = (i % tiles_per_obj) == 0

    def acc(ref, val, init):
        @pl.when(init)
        def _():
            ref[:] = jnp.zeros_like(ref)

        ref[:] += val

    drgb = cast(drgb_ref[:])
    acc(dwr2_ref, mm_xg(hh, drgb), first)
    acc(dbr2_ref, jnp.sum(drgb, axis=0)[None], first)
    g_hh = jnp.where(cast(hh) > 0, mm_t(drgb, wr2_ref[:]), 0.0)
    acc(dwr1_ref, mm_xg(hs[-1], g_hh), first)
    acc(dbr1_ref, jnp.sum(g_hh, axis=0)[None], first)
    g = mm_t(g_hh, wr1_ref[:])
    dzt_rows = [None] * n_tex
    dwtx_rows = [None] * n_tex
    dbtx_rows = [None] * n_tex
    for j in reversed(range(n_tex)):
        g = jnp.where(cast(hs[j]) > 0, g, 0.0)
        b_j = cast(hs[j - 1] if j else v) + zt[j][None, :]
        dwtx_rows[j] = mm_xg(b_j, g)
        dbtx_rows[j] = jnp.sum(g, axis=0)
        g = mm_t(g, wtx_ref[j])
        dzt_rows[j] = jnp.sum(g, axis=0)
    acc(dwtx_ref, jnp.stack(dwtx_rows), first)
    acc(dbtx_ref, jnp.stack(dbtx_rows), first)
    acc(dzt_ref, jnp.stack(dzt_rows)[None], obj_first)
    g_v = jnp.where(cast(v) > 0, g, 0.0)
    acc(dwvd_b_ref, mm_xg(dpe, g_v), first)
    acc(dbvd_ref, jnp.sum(g_v, axis=0)[None], first)
    ddpe_ref[:] = mm_t(g_v, wvd_b_ref[:])
    g_sig = cast(dsig_ref[:]) * sig_gate
    acc(dwsg_ref, mm_xg(e, g_sig), first)
    acc(dbsg_ref, jnp.sum(g_sig, axis=0)[None], first)
    acc(dwvd_a_ref, mm_xg(e, g_v), first)
    g_e = mm_t(g_v, wvd_a_ref[:]) + mm_t(g_sig, wsg_ref[:])
    acc(dwes_ref, mm_xg(ys[-1], g_e), first)
    acc(dbes_ref, jnp.sum(g_e, axis=0)[None], first)
    g = mm_t(g_e, wes_ref[:])
    dzs_rows = [None] * n_shape
    dwsh_rows = [None] * n_shape
    dbsh_rows = [None] * n_shape
    for j in reversed(range(n_shape)):
        g = jnp.where(cast(ys[j]) > 0, g, 0.0)
        a_j = cast(ys[j - 1] if j else y0) + zs[j][None, :]
        dwsh_rows[j] = mm_xg(a_j, g)
        dbsh_rows[j] = jnp.sum(g, axis=0)
        g = mm_t(g, wsh_ref[j])
        dzs_rows[j] = jnp.sum(g, axis=0)
    acc(dwsh_ref, jnp.stack(dwsh_rows), first)
    acc(dbsh_ref, jnp.stack(dbsh_rows), first)
    acc(dzs_ref, jnp.stack(dzs_rows)[None], obj_first)
    g = jnp.where(cast(y0) > 0, g, 0.0)
    acc(dwxyz_ref, mm_xg(xpe, g), first)
    acc(dbxyz_ref, jnp.sum(g, axis=0)[None], first)
    dxpe_ref[:] = mm_t(g, wxyz_ref[:])


def _train_fwd_call(wt, xpe, dpe, zs, zt, *, shape_blocks, texture_blocks,
                    tile_m, tiles_per_obj, dtype, interpret):
    M = xpe.shape[0]
    d_xyz, d_dir = xpe.shape[-1], dpe.shape[-1]
    tile_spec = lambda d: pl.BlockSpec((tile_m, d), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)
    obj_spec = lambda n, W: pl.BlockSpec(
        (1, n, W), lambda i: (i // tiles_per_obj, 0, 0),
        memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    W = wt[0].shape[1]

    kernel = functools.partial(_field_train_fwd_kernel, shape_blocks,
                               texture_blocks, dtype)
    sigma, rgb = pl.pallas_call(
        kernel,
        grid=(M // tile_m,),
        in_specs=[tile_spec(d_xyz), tile_spec(d_dir),
                  obj_spec(shape_blocks, W), obj_spec(texture_blocks, W)]
                 + [full()] * 17,
        out_specs=[
            pl.BlockSpec((tile_m, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
            jax.ShapeDtypeStruct((M, 3), jnp.float32),
        ],
        interpret=interpret,
    )(xpe, dpe, zs, zt, *wt)
    return sigma, rgb


def _train_bwd_call(wt, xpe, dpe, zs, zt, dsig, drgb, *, shape_blocks,
                    texture_blocks, tile_m, tiles_per_obj, dtype, interpret):
    M = xpe.shape[0]
    B = zs.shape[0]
    d_xyz, d_dir = xpe.shape[-1], dpe.shape[-1]
    W = wt[0].shape[1]
    W2 = wt[13].shape[1]  # rgb hidden width

    tile_spec = lambda d: pl.BlockSpec((tile_m, d), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)
    obj_spec = lambda n: pl.BlockSpec(
        (1, n, W), lambda i: (i // tiles_per_obj, 0, 0),
        memory_space=pltpu.VMEM)
    const = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # whole-array output
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    kernel = functools.partial(_field_train_bwd_kernel, shape_blocks,
                               texture_blocks, dtype, tiles_per_obj)
    sds = jax.ShapeDtypeStruct
    outs = pl.pallas_call(
        kernel,
        grid=(M // tile_m,),
        in_specs=[tile_spec(d_xyz), tile_spec(d_dir),
                  obj_spec(shape_blocks), obj_spec(texture_blocks)]
                 + [full()] * 17 + [tile_spec(1), tile_spec(3)],
        out_specs=[tile_spec(d_xyz), tile_spec(d_dir),
                   obj_spec(shape_blocks), obj_spec(texture_blocks)]
                  + [const()] * 17,
        out_shape=[
            sds((M, d_xyz), jnp.float32), sds((M, d_dir), jnp.float32),
            sds((B, shape_blocks, W), jnp.float32),
            sds((B, texture_blocks, W), jnp.float32),
            sds((d_xyz, W), jnp.float32), sds((1, W), jnp.float32),
            sds((shape_blocks, W, W), jnp.float32),
            sds((shape_blocks, W), jnp.float32),
            sds((W, W), jnp.float32), sds((1, W), jnp.float32),
            sds((W, 1), jnp.float32), sds((1, 1), jnp.float32),
            sds((W, W), jnp.float32), sds((d_dir, W), jnp.float32),
            sds((1, W), jnp.float32),
            sds((texture_blocks, W, W), jnp.float32),
            sds((texture_blocks, W), jnp.float32),
            sds((W, W2), jnp.float32), sds((1, W2), jnp.float32),
            sds((W2, 3), jnp.float32), sds((1, 3), jnp.float32),
        ],
        interpret=interpret,
    )(xpe, dpe, zs, zt, *wt, dsig, drgb)
    dxpe, ddpe, dzs, dzt = outs[:4]
    (dwxyz, dbxyz, dwsh, dbsh, dwes, dbes, dwsg, dbsg,
     dwvd_a, dwvd_b, dbvd, dwtx, dbtx, dwr1, dbr1, dwr2, dbr2) = outs[4:]
    dwt = (dwxyz, dbxyz[0], dwsh, dbsh, dwes, dbes[0], dwsg, dbsg[0],
           dwvd_a, dwvd_b, dbvd[0], dwtx, dbtx, dwr1, dbr1[0], dwr2, dbr2[0])
    return dxpe, ddpe, dzs, dzt, dwt


@functools.lru_cache(maxsize=None)
def _make_train_field_core(shape_blocks: int, texture_blocks: int,
                           tile_fwd: int, tile_bwd: int, tiles_fwd: int,
                           tiles_bwd: int, dtype, interpret: bool):
    @jax.custom_vjp
    def core(xpe, dpe, zs, zt, wt):
        return _train_fwd_call(
            wt, xpe, dpe, zs, zt, shape_blocks=shape_blocks,
            texture_blocks=texture_blocks, tile_m=tile_fwd,
            tiles_per_obj=tiles_fwd, dtype=dtype, interpret=interpret)

    def core_fwd(xpe, dpe, zs, zt, wt):
        return core(xpe, dpe, zs, zt, wt), (xpe, dpe, zs, zt, wt)

    def core_bwd(res, cts):
        xpe, dpe, zs, zt, wt = res
        dsig, drgb = cts
        dxpe, ddpe, dzs, dzt, dwt = _train_bwd_call(
            wt, xpe, dpe, zs, zt, dsig, drgb, shape_blocks=shape_blocks,
            texture_blocks=texture_blocks, tile_m=tile_bwd,
            tiles_per_obj=tiles_bwd, dtype=dtype, interpret=interpret)
        return dxpe, ddpe, dzs, dzt, dwt

    core.defvjp(core_fwd, core_bwd)
    return core


def field_train_pallas(packed: dict, xyz, viewdir, shapecodes, texturecodes, *,
                       shape_blocks: int = 3, texture_blocks: int = 1,
                       num_xyz_freq: int = 10, num_dir_freq: int = 4,
                       tile_fwd: int = 1024, tile_bwd: int = 512,
                       dtype: Any = jnp.bfloat16, interpret: bool = False):
    """Fused fwd+bwd field for TRAINING: one kernel over the whole
    (B, R, S) point batch with per-object latents selected by tile, and a
    backward that also produces all decoder weight/bias gradients (accumulated
    in-VMEM across the sequential grid — no HBM activation stash, no XLA
    rematerialization).

    xyz/viewdir: (B, ..., 3); shapecodes/texturecodes: (B, latent).
    Returns (sigmas (B, ..., 1), rgbs (B, ..., 3)). The per-object point
    count must be divisible by the tile sizes (tiles are shrunk to fit)."""
    B = xyz.shape[0]
    lead_shape = xyz.shape[:-1]
    per_obj = int(np.prod(xyz.shape[1:-1])) if xyz.ndim > 2 else 1
    # Classic sin/cos PE here, NOT the doubling recurrence: inside the train
    # step's grad graph XLA materializes the recurrence's ~2*degree chained
    # (m, 3) intermediates as separate while-body temps, each padded 42.7x by
    # the (8, 128) tile (3 -> 128 lanes) — ~30 GB at the published batch 48,
    # an instant HBM OOM (measured round 3). Classic PE's two (m, 3*degree)
    # arrays tile fine, and PE is <2% of the train step (VALIDATION.md train
    # decomposition), so the doubling variant's VPU savings are irrelevant
    # here — it stays on the forward render/TTO paths where it was measured
    # to win and where XLA fuses the intermediates away.
    xpe = positional_encoding(xyz.reshape(-1, 3), num_xyz_freq)
    dpe = positional_encoding(viewdir.reshape(-1, 3), num_dir_freq)
    zs, zt = conditioned_latents_batched(packed, shapecodes, texturecodes)
    _check_block_counts(zs, zt, shape_blocks, texture_blocks)

    def fit_tile(t):
        t = min(t, per_obj)
        while per_obj % t:
            t //= 2
        return max(t, 1)

    tf, tb = fit_tile(tile_fwd), fit_tile(tile_bwd)
    core = _make_train_field_core(
        shape_blocks, texture_blocks, tf, tb, per_obj // tf, per_obj // tb,
        dtype, interpret)
    wt = _precast_weights(flatten_weights(packed), dtype)
    sigma, rgb = core(xpe, dpe, zs, zt, wt)
    return sigma.reshape(*lead_shape, 1), rgb.reshape(*lead_shape, 3)


def make_pallas_field_fn(variables, *, decoder_scope: str = "decoder",
                         shape_blocks: int = 3, texture_blocks: int = 1,
                         num_xyz_freq: int = 10, num_dir_freq: int = 4,
                         dtype: Any = jnp.bfloat16, interpret: bool = False,
                         pe_in_kernel: bool = False):
    """Build a field closure (xyz, viewdir, shapecode, texturecode) ->
    (sigma, rgb) backed by the fused kernel, from a model's variables.

    pe_in_kernel defaults to False for the forward path: computing the PE
    in-kernel saves ~15x input HBM traffic but the narrow lane concats cost
    more VPU time than the bandwidth saved at the forward path's arithmetic
    intensity (measured 0.95M vs 1.56M rays/s on v5e)."""
    packed = pack_decoder_params(
        variables["params"][decoder_scope], shape_blocks, texture_blocks)

    def field_fn(xyz, viewdir, shapecode, texturecode):
        return field_forward_pallas(
            packed, xyz, viewdir, shapecode, texturecode,
            shape_blocks=shape_blocks, texture_blocks=texture_blocks,
            num_xyz_freq=num_xyz_freq, num_dir_freq=num_dir_freq,
            dtype=dtype, interpret=interpret, pe_in_kernel=pe_in_kernel)

    return field_fn
