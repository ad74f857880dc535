"""SO(3) conversions in pure jnp (replaces the reference's pytorch3d.transforms usage,
e.g. /root/reference/src/optimizer_nuscenes.py:11 and trainer_unified_nuscenes.py:12).

All functions are batched over leading dimensions, jit/vmap friendly, float32.
Conventions follow pytorch3d.transforms.rotation_conversions semantics:
  - rotation matrices act on column vectors (R @ x)
  - axis-angle vectors have magnitude = rotation angle in radians
  - euler orders are intrinsic, string like 'XYZ'
"""
from __future__ import annotations

import jax.numpy as jnp


def hat(v):
    """Skew-symmetric matrix of (..., 3) vectors."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def axis_angle_to_matrix(axis_angle):
    """Rodrigues formula, (..., 3) -> (..., 3, 3). Safe at angle -> 0."""
    angle = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    # Taylor-safe sin(a)/a and (1-cos(a))/a^2
    small = angle < 1e-6
    a = jnp.where(small, jnp.ones_like(angle), angle)
    sin_a = jnp.sin(a) / a
    cos_t = (1.0 - jnp.cos(a)) / (a * a)
    sin_a = jnp.where(small, 1.0 - angle**2 / 6.0, sin_a)
    cos_t = jnp.where(small, 0.5 - angle**2 / 24.0, cos_t)
    K = hat(axis_angle)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis_angle.dtype), K.shape)
    return eye + sin_a[..., None] * K + cos_t[..., None] * (K @ K)


def matrix_to_quaternion(matrix):
    """(..., 3, 3) -> (..., 4) wxyz unit quaternion with w >= 0 branch-free selection."""
    m = matrix
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # four candidate quaternions, one per largest diagonal-ish term
    def _sqrt_pos(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    qw = _sqrt_pos(1.0 + m00 + m11 + m22)
    qx = _sqrt_pos(1.0 + m00 - m11 - m22)
    qy = _sqrt_pos(1.0 - m00 + m11 - m22)
    qz = _sqrt_pos(1.0 - m00 - m11 + m22)

    cand_w = jnp.stack([qw * qw, m21 - m12, m02 - m20, m10 - m01], axis=-1) / (2.0 * qw[..., None])
    cand_x = jnp.stack([m21 - m12, qx * qx, m01 + m10, m02 + m20], axis=-1) / (2.0 * qx[..., None])
    cand_y = jnp.stack([m02 - m20, m01 + m10, qy * qy, m12 + m21], axis=-1) / (2.0 * qy[..., None])
    cand_z = jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz * qz], axis=-1) / (2.0 * qz[..., None])

    traces = jnp.stack([qw, qx, qy, qz], axis=-1)
    best = jnp.argmax(traces, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # (..., 4cand, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    # canonical sign: w >= 0
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quaternion_to_axis_angle(quat):
    """(..., 4) wxyz -> (..., 3)."""
    w = quat[..., 0]
    v = quat[..., 1:]
    norm_v = jnp.linalg.norm(v, axis=-1)
    angle = 2.0 * jnp.arctan2(norm_v, w)
    small = norm_v < 1e-9
    scale = jnp.where(small, 2.0, angle / jnp.where(small, 1.0, norm_v))
    return v * scale[..., None]


def matrix_to_axis_angle(matrix):
    """(..., 3, 3) -> (..., 3); angle in [0, pi]."""
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


def quaternion_to_matrix(quat):
    """(..., 4) wxyz -> (..., 3, 3)."""
    q = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - z * w)
    r02 = 2 * (x * z + y * w)
    r10 = 2 * (x * y + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (x * z - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def _axis_rot(angle, axis):
    c, s = jnp.cos(angle), jnp.sin(angle)
    one = jnp.ones_like(angle)
    zero = jnp.zeros_like(angle)
    if axis == "X":
        rows = ([one, zero, zero], [zero, c, -s], [zero, s, c])
    elif axis == "Y":
        rows = ([c, zero, s], [zero, one, zero], [-s, zero, c])
    elif axis == "Z":
        rows = ([c, -s, zero], [s, c, zero], [zero, zero, one])
    else:
        raise ValueError(axis)
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def euler_angles_to_matrix(euler, convention: str = "XYZ"):
    """(..., 3) intrinsic euler -> (..., 3, 3), matching pytorch3d semantics
    (R = R_axis0(e0) @ R_axis1(e1) @ R_axis2(e2))."""
    mats = [_axis_rot(euler[..., i], ax) for i, ax in enumerate(convention)]
    return mats[0] @ mats[1] @ mats[2]


def matrix_to_euler_angles(matrix, convention: str = "XYZ"):
    """(..., 3, 3) -> (..., 3) intrinsic euler. Only 'XYZ' supported (the only
    convention the reference config can request, utils euler_rot path)."""
    if convention != "XYZ":
        raise NotImplementedError(convention)
    # R = Rx(a) Ry(b) Rz(c)
    # R[0,2] = sin(b); R[1,2] = -sin(a)cos(b); R[2,2]=cos(a)cos(b)
    # R[0,1] = -cos(b)sin(c); R[0,0]=cos(b)cos(c)
    b = jnp.arcsin(jnp.clip(matrix[..., 0, 2], -1.0, 1.0))
    a = jnp.arctan2(-matrix[..., 1, 2], matrix[..., 2, 2])
    c = jnp.arctan2(-matrix[..., 0, 1], matrix[..., 0, 0])
    return jnp.stack([a, b, c], axis=-1)


def rot_dist(R1, R2):
    """Geodesic distance on SO(3): (..., 3, 3) x 2 -> (...,) radians.
    Mirrors reference utils.rot_dist (/root/reference/src/utils.py:713) including the
    trace clamp to [-1, 3]."""
    R_diff = R1 @ jnp.swapaxes(R2, -1, -2)
    trace = jnp.trace(R_diff, axis1=-2, axis2=-1)
    trace = jnp.clip(trace, -1.0, 3.0)
    return jnp.arccos((trace - 1.0) / 2.0)
