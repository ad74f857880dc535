"""Optional test-time-optimization regularizers.

Equivalents of the reference's obj-size and symmetry losses
(/root/reference/src/optimizer_nuscenes.py: loss_obj_sz :1412-1433 with
generate_obj_sz_reg_samples utils.py:725-758, loss_sym :1435-1448), keyed and
jit-friendly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def obj_sz_reg_samples(key, obj_sz, obj_diag, shapenet_obj_cood: bool = True,
                       tau: float = 0.05, samples_per_plane: int = 100):
    """Random samples just inside/outside the six box-limit planes in the
    normalized object frame. Returns (samples_out (3, 2P, 3),
    samples_in (3, 2P, 3)) stacked per axis."""
    lim = jnp.asarray(obj_sz) / obj_diag
    if shapenet_obj_cood:
        lim = lim[jnp.array([1, 0, 2])]
    kx, ky, kz = jax.random.split(key, 3)
    P = samples_per_plane
    X = jax.random.uniform(kx, (P,), minval=-lim[0], maxval=lim[0])
    Y = jax.random.uniform(ky, (P,), minval=-lim[1], maxval=lim[1])
    Z = jax.random.uniform(kz, (P,), minval=-lim[2], maxval=lim[2])

    def planes(axis, delta):
        lo = {0: (jnp.full((P,), -lim[0] + delta), Y, Z),
              1: (X, jnp.full((P,), -lim[1] + delta), Z),
              2: (X, Y, jnp.full((P,), -lim[2] + delta))}[axis]
        hi = {0: (jnp.full((P,), lim[0] - delta), Y, Z),
              1: (X, jnp.full((P,), lim[1] - delta), Z),
              2: (X, Y, jnp.full((P,), lim[2] - delta))}[axis]
        return jnp.concatenate([jnp.stack(lo, -1), jnp.stack(hi, -1)], axis=0)

    out = jnp.stack([planes(a, -tau) for a in range(3)])
    inn = jnp.stack([planes(a, tau) for a in range(3)])
    return out, inn


def obj_sz_loss(field_fn, key, obj_sz, obj_diag, shapenet_obj_cood: bool = True,
                tau: float = 0.05, samples_per_plane: int = 100):
    """Penalize density just outside the box limits and reward density just
    inside: sum(max_sigma_out^2) + sum((max_sigma_in - 1)^2), /6."""
    s_out, s_in = obj_sz_reg_samples(key, obj_sz, obj_diag, shapenet_obj_cood,
                                     tau, samples_per_plane)
    ones = jnp.ones_like(s_out)
    sig_out, _ = field_fn(s_out, ones)
    sig_in, _ = field_fn(s_in, jnp.ones_like(s_in))
    so = jnp.max(sig_out[..., 0], axis=1)
    si = jnp.max(sig_in[..., 0], axis=1)
    return (jnp.sum(so ** 2) + jnp.sum((si - 1.0) ** 2)) / 6.0


def sym_loss(field_fn, xyz, viewdir, sigmas, shapenet_obj_cood: bool = True):
    """Density symmetry across the object's lateral axis: MSE between sigma at
    the sampled points and at their mirrored positions."""
    axis = 0 if shapenet_obj_cood else 1
    flip = jnp.ones(3).at[axis].set(-1.0)
    sig_sym, _ = field_fn(xyz * flip, viewdir * flip)
    return jnp.mean((sigmas - sig_sym) ** 2)
