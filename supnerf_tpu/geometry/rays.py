"""Ray generation, stratified sampling, and ray-AABB intersection in pure jnp.

Functional equivalents of the reference ray utilities
(/root/reference/src/utils.py: get_rays :107, get_rays_specified :138,
sample_from_rays :154, sample_from_rays_v2 :170, ray_box_intersection :236;
/root/reference/src/renderer.py: sample_from_ray :27, prepare_sampled_rays :91),
re-designed with static shapes so the whole chain jits and vmaps on TPU.

Camera convention (nuScenes-style): pixel ray direction in camera frame is
[(u-cx)/fx, (v-cy)/fy, 1]; c2w rotates it into the object ("world") frame.
All outputs are float32, fixed shape; ragged cases are handled with masks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ray_dirs_from_uv(K, c2w, u, v):
    """Rays through pixel coordinates (u, v): any matching shapes (...,).

    K: (3, 3), c2w: (3, 4). Returns (rays_o, viewdir) each (..., 3); viewdir
    is unit-norm in the object frame, rays_o is the camera center.
    """
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    dirs = jnp.stack([(u - cx) / fx, (v - cy) / fy, jnp.ones_like(u)], axis=-1)
    rays_d = dirs @ c2w[:3, :3].T
    viewdir = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.broadcast_to(c2w[:3, 3], viewdir.shape)
    return rays_o, viewdir


def get_rays(K, c2w, roi, uv_steps):
    """Ray grid over an ROI. uv_steps=(nu, nv) is STATIC (shapes are compiled).

    Pixel sample locations span [roi_min, roi_max - 1] inclusive, matching the
    reference's linspace endpoints (utils.py:122-126). roi entries may be traced.
    Returns (rays_o, viewdir), each (nv*nu, 3), row-major over (v, u).
    """
    nu, nv = int(uv_steps[0]), int(uv_steps[1])
    roi = jnp.asarray(roi, dtype=jnp.float32)
    u_lin = jnp.linspace(0.0, 1.0, nu) * (roi[2] - 1 - roi[0]) + roi[0]
    v_lin = jnp.linspace(0.0, 1.0, nv) * (roi[3] - 1 - roi[1]) + roi[1]
    u, v = jnp.meshgrid(u_lin, v_lin, indexing="xy")
    rays_o, viewdir = ray_dirs_from_uv(K, c2w, u, v)
    return rays_o.reshape(-1, 3), viewdir.reshape(-1, 3)


def get_rays_specified(K, c2w, x_vec, y_vec):
    """Rays through explicit pixel coordinates (used for sparse lidar-pixel depth
    eval, reference utils.py:138). x_vec/y_vec: (N,). Returns ((N,3), (N,3))."""
    u = jnp.asarray(x_vec, dtype=jnp.float32)
    v = jnp.asarray(y_vec, dtype=jnp.float32)
    return ray_dirs_from_uv(K, c2w, u, v)


def sample_from_rays(key, rays_o, viewdir, near, far, n_samples: int, z_fixed: bool = False):
    """Stratified depth sampling with a jitter vector SHARED across rays, matching
    the reference distribution (utils.py:154-167: a single (n_samples,) z_vals
    vector perturbs every ray identically).

    rays_o/viewdir: (R, 3); near/far scalars. Returns (xyz (R,S,3),
    viewdir (R,S,3), z_vals (S,)).
    """
    near = jnp.asarray(near, dtype=jnp.float32)
    far = jnp.asarray(far, dtype=jnp.float32)
    if z_fixed:
        z_vals = jnp.linspace(0.0, 1.0, n_samples) * (far - near) + near
    else:
        dist = (far - near) / (2 * n_samples)
        base = jnp.linspace(0.0, 1.0, n_samples) * (far - near - 2 * dist) + near + dist
        jitter = jax.random.uniform(key, (n_samples,)) * (far - near) / (2 * n_samples)
        z_vals = base + jitter
    xyz = rays_o[:, None, :] + viewdir[:, None, :] * z_vals[None, :, None]
    vd = jnp.broadcast_to(viewdir[:, None, :], xyz.shape)
    return xyz, vd, z_vals


def sample_z_stratified(key, near, far, n_samples: int):
    """Per-ray stratified sampling between per-ray (near, far), matching
    NeRFRenderer.sample_from_ray (renderer.py:27-41). near/far: (R, 1) or (R,).
    Returns z (R, S)."""
    near = jnp.reshape(jnp.asarray(near, jnp.float32), (-1, 1))
    far = jnp.reshape(jnp.asarray(far, jnp.float32), (-1, 1))
    step = 1.0 / n_samples
    z_steps = jnp.arange(n_samples, dtype=jnp.float32) * step  # (S,)
    z_steps = z_steps[None, :] + jax.random.uniform(key, (near.shape[0], n_samples)) * step
    return near * (1 - z_steps) + far * z_steps


def ray_box_intersection(rays_o, viewdir, aabb_min=None, aabb_max=None):
    """Slab-method ray/AABB intersection with fixed-shape outputs.

    rays_o/viewdir: (..., 3) in the box frame. aabb_min/max: broadcastable
    (..., 3), default the unit cube [-1, 1]^3.
    Returns (t_near, t_far, hit): each (...,); hit requires t_far > t_near and
    t_far > 0 (box in front of the origin), matching reference utils.py:236-280
    but without boolean gather (mask instead, for static shapes).

    NOT safe under reverse-mode AD: the slab test's 1/viewdir relies on inf
    semantics for axis-parallel rays, and its VJP produces 0*inf = NaN for
    grazing rays (the true d(bound)/d(dir) ~ 1/d^2 diverges there anyway).
    Callers optimizing through ray geometry must stop_gradient the bounds —
    the reference does the equivalent by intersecting on detached numpy rays
    (renderer.py:426); see render.renderer.render_rays_aabb.
    """
    if aabb_min is None:
        aabb_min = -jnp.ones_like(rays_o)
    if aabb_max is None:
        aabb_max = jnp.ones_like(rays_o)
    inv_d = 1.0 / viewdir
    t_min = (aabb_min - rays_o) * inv_d
    t_max = (aabb_max - rays_o) * inv_d
    t0 = jnp.minimum(t_min, t_max)
    t1 = jnp.maximum(t_min, t_max)
    t_near = jnp.max(t0, axis=-1)
    t_far = jnp.min(t1, axis=-1)
    hit = (t_far > t_near) & (t_far > 0)
    return t_near, t_far, hit


def aabb_ray_bounds(rays_o, viewdir, obj_sz):
    """Per-ray (near, far) bounds from the object's wlh box, in units of
    obj_diag/2 (the NeRFRenderer.prepare_sampled_rays convention,
    renderer.py:91-117). Non-hit rays get bounds (-1, -1), which the stratified
    sampler then collapses to degenerate samples the compositor zeroes out.

    rays_o: (R, 3) in metric object frame; obj_sz: (3,) = (w, l, h).
    Returns (bounds (R, 2), hit (R,), rays_o_n (R, 3) normalized origins).
    """
    obj_sz = jnp.asarray(obj_sz, jnp.float32)
    obj_diag = jnp.linalg.norm(obj_sz)
    w, l, h = obj_sz[0], obj_sz[1], obj_sz[2]
    half = jnp.stack([l, w, h]) / obj_diag
    rays_o_n = rays_o / (obj_diag / 2)
    t_near, t_far, hit = ray_box_intersection(rays_o_n, viewdir, -half, half)
    bounds = jnp.stack(
        [jnp.where(hit, t_near, -1.0), jnp.where(hit, t_far, -1.0)], axis=-1
    )
    return bounds, hit, rays_o_n
