"""Feed-forward projected-box pose refinement (the SUP-NeRF pose stream).

Equivalent of the reference's iterative refiner
(/root/reference/src/optimizer_nuscenes.py: fw_pose_update :451,
fw_pose_one_step :509; same math as trainer pose_regress
trainer_unified_nuscenes.py:150-195), as pure jnp over batched poses with the
iteration unrolled by lax.scan so the whole refinement jits into one program.

Delta semantics (reference :530-549): network output delta (6,) maps to
  rot:   axis-angle increment = delta[:3] * 2*pi
  uv:    projected-center shift = delta[3:5] * max(roi_w, roi_h)
  depth: ratio = delta[5] + 1
applied as rot_vec += d_rot; (u, v) shifted in pixels; Z scaled; T re-lifted
through K^-1.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from supnerf_tpu.geometry.boxes import corners_of_box, normalize_by_roi, view_points
from supnerf_tpu.geometry.rotations import axis_angle_to_matrix, matrix_to_axis_angle


def project_box_corners_normalized(pose, wlh, roi, K, box_fac: float = 1.0,
                                   is_kitti: bool = False):
    """Project box corners and normalize to the ROI frame.
    pose (3,4), wlh (3,), roi (4,), K (3,3) -> (uv_norm (16,), dim scalar)."""
    corners = corners_of_box(pose, wlh, is_kitti=is_kitti, scale=box_fac)
    uv = view_points(corners, K, normalize=True)
    uv_norm, dim = normalize_by_roi(uv[:2][None], roi[None], need_square=True)
    return uv_norm[0].reshape(-1), dim[0]


def compose_pose_delta(src_pose, delta, dim, K, K_inv):
    """Apply a raw 6-d refiner delta to a (3, 4) object pose."""
    d_rot = delta[:3] * (2.0 * jnp.pi)
    d_uv = delta[3:5] * dim
    z_ratio = delta[5] + 1.0

    rot_vec = matrix_to_axis_angle(src_pose[:, :3])
    pred_R = axis_angle_to_matrix(rot_vec + d_rot)

    T_src = src_pose[:, 3]
    uvz = K @ T_src
    u = uvz[0] / uvz[2] + d_uv[0]
    v = uvz[1] / uvz[2] + d_uv[1]
    Z = T_src[2] * z_ratio
    pred_T = K_inv @ jnp.stack([u * Z, v * Z, Z])
    return jnp.concatenate([pred_R, pred_T[:, None]], axis=-1)


def fw_pose_one_step(pose_update_fn, posecode, src_pose, wlh, roi, K, K_inv,
                     box_fac: float = 1.0):
    """One refiner iteration for a single object. pose_update_fn is a closure
    (posecode (latent,), uv_norm (16,)) -> delta (6,) binding model params."""
    uv_norm, dim = project_box_corners_normalized(src_pose, wlh, roi, K, box_fac)
    delta = pose_update_fn(posecode, uv_norm)
    return compose_pose_delta(src_pose, delta, dim, K, K_inv)


def fw_pose_refine(pose_update_fn, posecode, init_pose, wlh, roi, K, K_inv,
                   iters: int, box_fac: float = 1.0):
    """Run `iters` refiner steps; returns (iters+1, 3, 4) poses including the
    initial one (the reference's pose_per_iter list, optimizer_nuscenes.py:496-507)."""

    def step(pose, _):
        new_pose = fw_pose_one_step(
            pose_update_fn, posecode, pose, wlh, roi, K, K_inv, box_fac
        )
        return new_pose, new_pose

    _, traj = jax.lax.scan(step, init_pose, None, length=iters)
    return jnp.concatenate([init_pose[None], traj], axis=0)
