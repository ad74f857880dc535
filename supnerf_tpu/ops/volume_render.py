"""Volume rendering (alpha compositing) in pure jnp.

Numerical contract follows the reference compositors
(/root/reference/src/utils.py: volume_rendering :187, volume_rendering2 :202,
volume_rendering_batch :220; /root/reference/src/renderer.py: volume_rendering3
:355, volume_render_batch :67):

  deltas_i = z_{i+1} - z_i, last delta = 1e10
  alpha_i  = 1 - exp(-relu(sigma_i) * delta_i)
  T_i      = prod_{j<i} (1 - alpha_j + 1e-10)   (accumulated transmittance)
  w_i      = alpha_i * T_i
  rgb      = sum_i w_i rgb_i  (+ (1 - sum w) for white background)
  depth    = sum_i w_i z_i
  acc_trans = T_{S-1} = prod_{j<S-1} (1 - alpha_j + 1e-10)

acc_trans is the EXCLUSIVE cumprod's last element — it deliberately excludes
the last sample's factor, exactly as the reference (accum_trans[..., :-1][-1]
after prepending ones): the last delta is 1e10, so including it would saturate
acc_trans to ~0 for any positive terminal density and kill the occupancy
loss's silhouette gradient.

One batched implementation serves all reference variants; the cumulative
product uses jnp.cumprod (an O(log S) associative scan on TPU). Do NOT rewrite
it as exp(cumsum(log(trans))): with the 1e10 last delta, trans saturates at
1e-10 and that formulation's reverse-mode (1/trans factors) overflows to
inf*0 = NaN under XLA fusion — jit'd gradients NaN while eager ones don't.
All functions are batched over arbitrary leading dimensions: sigmas (..., S) or
(..., S, 1), rgbs (..., S, 3), z_vals (..., S).
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS_TRANS = 1e-10
_LAST_DELTA = 1e10


def composite_weights(sigmas, z_vals):
    """Per-sample compositing weights and final transmittance.

    sigmas: (..., S); z_vals: (..., S) (broadcastable).
    Returns (weights (..., S), acc_trans (...,)) where acc_trans is the
    transmittance BEFORE the last sample (exclusive cumprod's last element,
    the reference's acc_trans_rays — see module docstring).
    """
    deltas = z_vals[..., 1:] - z_vals[..., :-1]
    deltas = jnp.concatenate(
        [deltas, jnp.full_like(deltas[..., :1], _LAST_DELTA)], axis=-1
    )
    deltas = jnp.broadcast_to(deltas, sigmas.shape)
    alphas = 1.0 - jnp.exp(-jnp.maximum(sigmas, 0.0) * deltas)
    # maximum() blocks XLA from reassociating to (1+eps)-alphas, which would
    # constant-fold the 1e-10 floor away (same guard as ops/pallas_render.py).
    trans = jnp.maximum(1.0 - alphas, 0.0) + _EPS_TRANS
    # T_i = prod_{j<i} trans_j  (exclusive cumprod), T_0 = 1
    accum_trans_incl = jnp.cumprod(trans, axis=-1)  # T after including sample i
    accum_trans = jnp.concatenate(
        [jnp.ones_like(accum_trans_incl[..., :1]), accum_trans_incl[..., :-1]], axis=-1
    )
    weights = alphas * accum_trans
    return weights, accum_trans[..., -1]


def volume_render(sigmas, rgbs, z_vals, white_bkgd: bool = False):
    """Composite rgb/depth along the sample axis.

    sigmas: (..., S) or (..., S, 1); rgbs: (..., S, 3); z_vals: (..., S) or
    broadcastable (e.g. (S,) shared across rays, the reference's training path).
    Returns (rgb (..., 3), depth (...,), acc_trans (...,)).
    """
    if sigmas.shape[-1] == 1 and sigmas.ndim == rgbs.ndim:
        sigmas = sigmas[..., 0]
    z_vals = jnp.broadcast_to(z_vals, sigmas.shape)
    weights, acc_trans = composite_weights(sigmas, z_vals)
    rgb = jnp.sum(weights[..., None] * rgbs, axis=-2)
    depth = jnp.sum(weights * z_vals, axis=-1)
    if white_bkgd:
        pix_alpha = jnp.sum(weights, axis=-1)
        rgb = rgb + (1.0 - pix_alpha)[..., None]
    return rgb, depth, acc_trans


def rgb_loss_masked(rgb_rays, rgb_tgt, occ_pixels, axis=None):
    """Occupancy-weighted white-background RGB loss
    (reference trainer_unified_nuscenes.py:130-131 / optimizer_nuscenes.py:729).

    occ_pixels: (..., 1) in {-1, 0, 1}; axis: axes to reduce (None = all)."""
    w = jnp.abs(occ_pixels)
    num = jnp.sum((rgb_rays - rgb_tgt) ** 2 * w, axis=axis)
    den = jnp.sum(w, axis=axis) + 1e-9
    return num / den


def occupancy_loss(acc_trans, occ_pixels, axis=None):
    """Silhouette loss pushing transmittance to 0 on fg, 1 on bg
    (reference trainer_unified_nuscenes.py:138-140)."""
    w = jnp.abs(occ_pixels)
    per = jnp.exp(-occ_pixels * (0.5 - acc_trans[..., None])) * w
    num = jnp.sum(per, axis=axis)
    den = jnp.sum(w, axis=axis) + 1e-9
    return num / den


def masked_psnr(rgb_rays, rgb_tgt, occ_pixels, axis=None):
    """PSNR over foreground pixels only (mask_rgb = occ>0), the reference's
    evaluation metric (optimizer_nuscenes.py:740-744)."""
    mask = jnp.maximum(occ_pixels, 0.0)
    mse = jnp.sum((rgb_rays - rgb_tgt) ** 2 * mask, axis=axis) / (jnp.sum(mask, axis=axis) + 1e-9)
    return -10.0 * jnp.log(mse) / jnp.log(10.0)
