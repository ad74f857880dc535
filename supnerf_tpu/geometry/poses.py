"""Random pose generation (explicit PRNG keys) and pose error metrics.

Equivalents of the reference's pose utilities
(/root/reference/src/utils.py: get_random_pose :1260, get_random_pose2 :1300,
calc_pose_err :675), batched-first and keyed so that vmapped test-time
optimization can draw independent initial poses per object on device.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from supnerf_tpu.geometry.rotations import axis_angle_to_matrix, rot_dist

# Canonical "unit" orientations used by the test-time random initializer: an
# object whose +x faces the camera, per frame convention.
_R_UNIT_NUSC = jnp.array([[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]], jnp.float32)
_R_UNIT_KITTI = jnp.array([[0.0, 0.0, -1.0], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0]], jnp.float32)


def _yaw_nusc(yaw):
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    z = jnp.zeros_like(yaw)
    o = jnp.ones_like(yaw)
    return jnp.stack(
        [jnp.stack([c, -s, z], -1), jnp.stack([s, c, z], -1), jnp.stack([z, z, o], -1)], -2
    )


def _yaw_kitti(yaw):
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    z = jnp.zeros_like(yaw)
    o = jnp.ones_like(yaw)
    return jnp.stack(
        [jnp.stack([c, z, s], -1), jnp.stack([z, o, z], -1), jnp.stack([-s, z, c], -1)], -2
    )


def uv_depth_to_xyz(K, u, v, Z):
    """Back-project pixel (u, v) at depth Z through intrinsics K: (..., ) -> (..., 3)."""
    K_inv = jnp.linalg.inv(K)
    pts = jnp.stack([u * Z, v * Z, Z], axis=-1)
    return pts @ K_inv.T


def get_random_pose2(key, K, roi, yaw_lim=jnp.pi, angle_lim=jnp.pi / 9, trans_lim=0.4,
                     depth_fix=20.0, is_kitti: bool = False):
    """Random object-pose initialization for test-time optimization
    (reference utils.py:1300-1351): uv jittered around the ROI center by
    ±trans_lim of the roi dims, depth fixed at depth_fix, yaw uniform in
    ±yaw_lim about a camera-facing unit orientation, plus a small random
    rotation with per-axis angles in ±angle_lim.

    K: (3, 3); roi: (4,). Returns (3, 4) object pose in camera frame.
    vmap over keys (and rois) for a batch.
    """
    k_xy, k_yaw, k_rot = jax.random.split(key, 3)
    roi = jnp.asarray(roi, jnp.float32)
    roi_c = (roi[2:4] + roi[0:2]) / 2
    roi_wh = roi[2:4] - roi[0:2]
    v_xy = (jax.random.uniform(k_xy, (2,)) * 2 - 1) * roi_wh * trans_lim
    u = roi_c[0] + v_xy[0]
    v = roi_c[1] + v_xy[1]
    T = uv_depth_to_xyz(K, u, v, jnp.asarray(depth_fix, jnp.float32))

    yaw = (jax.random.uniform(k_yaw, ()) * 2 - 1) * yaw_lim
    rotvec = (jax.random.uniform(k_rot, (3,)) * 2 - 1) * angle_lim
    R_rand = axis_angle_to_matrix(rotvec)
    if is_kitti:
        R = _R_UNIT_KITTI @ R_rand @ _yaw_kitti(yaw)
    else:
        R = _R_UNIT_NUSC @ R_rand @ _yaw_nusc(yaw)
    return jnp.concatenate([R, T[:, None]], axis=-1)


def get_random_pose(key, tgt_pose, K, roi, yaw_lim=jnp.pi / 2, angle_lim=jnp.pi / 9,
                    trans_lim=0.3, depth_lim=0.3):
    """Training-time pose perturbation around a GT pose (reference
    utils.py:1260-1297): uv shifted by ±trans_lim of the roi dims, depth scaled
    by (1 ± depth_lim), rotation right-multiplied by a random small rotation and
    a yaw in ±yaw_lim (nuScenes frame). tgt_pose: (3, 4). Returns (3, 4)."""
    k_xy, k_z, k_yaw, k_rot = jax.random.split(key, 4)
    roi = jnp.asarray(roi, jnp.float32)
    tgt_T = tgt_pose[:, 3]
    tgt_uv = tgt_T[:2] / tgt_T[2]
    tgt_uv = K[:2, :2] @ tgt_uv + K[:2, 2]
    roi_wh = roi[2:4] - roi[0:2]
    v_xy = (jax.random.uniform(k_xy, (2,)) * 2 - 1) * roi_wh * trans_lim
    v_z = 1.0 + (jax.random.uniform(k_z, ()) * 2 - 1) * depth_lim
    u = tgt_uv[0] + v_xy[0]
    v = tgt_uv[1] + v_xy[1]
    Z = tgt_T[2] * v_z
    T = uv_depth_to_xyz(K, u, v, Z)

    yaw = (jax.random.uniform(k_yaw, ()) * 2 - 1) * yaw_lim
    rotvec = (jax.random.uniform(k_rot, (3,)) * 2 - 1) * angle_lim
    R = tgt_pose[:, :3] @ axis_angle_to_matrix(rotvec) @ _yaw_nusc(yaw)
    return jnp.concatenate([R, T[:, None]], axis=-1)


def calc_pose_err(est_poses, tgt_poses):
    """Rotation geodesic error (rad) and translation L2 error (m) for batched
    (..., 3, 4) poses, matching reference utils.py:675-683."""
    err_R = rot_dist(est_poses[..., :, :3], tgt_poses[..., :, :3])
    err_T = jnp.sqrt(jnp.sum((est_poses[..., :, 3] - tgt_poses[..., :, 3]) ** 2, axis=-1))
    return err_R, err_T
