"""3D bounding-box geometry: corner generation, perspective projection, ROI
normalization, point-in-box tests, and object-frame conversions.

Functional equivalents of the reference's box utilities
(/root/reference/src/utils.py: corners_of_box :1076, corners_of_box_batch :1110,
view_points :991, view_points_batch :1032, normalize_by_roi :1175,
pts_in_box_3d :1150, obj_pose_kitti2nusc :1354, obj_pose_nuse2kitti :1369),
redesigned batched-first for jit/vmap on TPU. Everything is pure jnp.

Pose convention: a pose is a (..., 3, 4) matrix [R | t] mapping object-frame
points to camera frame (object pose in camera), or the inverse for camera pose
in object frame — same as the reference.
"""
from __future__ import annotations

import jax.numpy as jnp

# Corner sign patterns. First four corners face forward (+x), last four backward.
# nuScenes object frame: x forward, y left, z up; box center at volume center.
_X_SIGNS = jnp.array([1, 1, 1, 1, -1, -1, -1, -1], dtype=jnp.float32)
_Y_SIGNS = jnp.array([1, -1, -1, 1, 1, -1, -1, 1], dtype=jnp.float32)
_Z_SIGNS = jnp.array([1, 1, -1, -1, 1, 1, -1, -1], dtype=jnp.float32)
# KITTI object frame: x front, y down, z left; box center on the ground plane,
# so the vertical offsets are {-2h/2, 0} rather than {±h/2}.
_Y_SIGNS_KITTI = jnp.array([-2, -2, 0, 0, -2, -2, 0, 0], dtype=jnp.float32)


def local_corners_of_box(wlh, is_kitti: bool = False, scale: float = 1.0):
    """Corners in the object frame (no pose applied): (..., 3) wlh -> (..., 3, 8)."""
    w, l, h = wlh[..., 0:1], wlh[..., 1:2], wlh[..., 2:3]
    if is_kitti:
        x = l / 2 * _X_SIGNS * scale
        y = h / 2 * _Y_SIGNS_KITTI * scale
        z = w / 2 * _Y_SIGNS * scale
    else:
        x = l / 2 * _X_SIGNS * scale
        y = w / 2 * _Y_SIGNS * scale
        z = h / 2 * _Z_SIGNS * scale
    return jnp.stack([x, y, z], axis=-2)


def corners_of_box(obj_pose, wlh, is_kitti: bool = False, scale: float = 1.0):
    """Box corners in camera frame. Batched over leading dims.

    obj_pose: (..., 3, 4)  [R | t] object pose in camera frame
    wlh:      (..., 3)
    returns:  (..., 3, 8)
    """
    corners = local_corners_of_box(wlh, is_kitti=is_kitti, scale=scale)
    rotated = obj_pose[..., :, :3] @ corners
    return rotated + obj_pose[..., :, 3:4]


# Batched name kept for parity with the reference API surface.
corners_of_box_batch = corners_of_box


def view_points(points, view, normalize: bool):
    """Perspective / orthographic projection. Batched over leading dims.

    points: (..., 3, N)
    view:   (..., r, c) with r,c <= 4 (typically a 3x3 K)
    returns (..., 3, N); if normalize, divided by the third row.
    """
    r, c = view.shape[-2], view.shape[-1]
    batch = jnp.broadcast_shapes(points.shape[:-2], view.shape[:-2])
    viewpad = jnp.broadcast_to(jnp.eye(4, dtype=points.dtype), batch + (4, 4))
    viewpad = viewpad.at[..., :r, :c].set(jnp.broadcast_to(view, batch + (r, c)))
    n = points.shape[-1]
    pts_h = jnp.concatenate(
        [jnp.broadcast_to(points, batch + (3, n)), jnp.ones(batch + (1, n), dtype=points.dtype)],
        axis=-2,
    )
    out = (viewpad @ pts_h)[..., :3, :]
    if normalize:
        out = out / out[..., 2:3, :]
    return out


view_points_batch = view_points


def normalize_by_roi(pts, roi, need_square: bool = True):
    """Center and scale projected points by their ROI.

    pts: (..., 2, N) pixel coordinates
    roi: (..., 4) [xmin, ymin, xmax, ymax]
    returns (pts_norm, dim) where dim = max(roi_w, roi_h) if need_square.
    """
    w = roi[..., 2] - roi[..., 0]
    h = roi[..., 3] - roi[..., 1]
    cx = (roi[..., 2] + roi[..., 0]) / 2
    cy = (roi[..., 3] + roi[..., 1]) / 2
    centered = pts - jnp.stack([cx, cy], axis=-1)[..., :, None]
    if need_square:
        dim = jnp.maximum(w, h)
        return centered / dim[..., None, None], dim
    scaled = centered / jnp.stack([w, h], axis=-1)[..., :, None]
    return scaled, None


def pts_in_box_3d(pts_3d, corners_3d, keep_top_portion: float = 1.0):
    """Boolean mask of points inside the (possibly top-truncated) box.

    pts_3d:     (..., 3, N)
    corners_3d: (..., 3, 8) in nuScenes corner order
    returns     (..., N) bool
    """
    v1 = corners_3d[..., :, 1:2] - corners_3d[..., :, 0:1]
    v2 = (corners_3d[..., :, 3:4] - corners_3d[..., :, 0:1]) * keep_top_portion
    v3 = corners_3d[..., :, 4:5] - corners_3d[..., :, 0:1]
    v_test = pts_3d - corners_3d[..., :, 0:1]

    def _between(v):
        proj = jnp.sum(v * v_test, axis=-2)
        vv = jnp.sum(v * v, axis=-2)
        return (proj > 0) & (proj < vv)

    return _between(v1) & _between(v2) & _between(v3)


# Fixed change-of-basis between KITTI (x front, y down, z left) and nuScenes
# (x front, y left, z up) object frames.
_R_K2N = jnp.array([[1.0, 0.0, 0.0], [0.0, 0.0, -1.0], [0.0, 1.0, 0.0]], dtype=jnp.float32)
_R_N2K = jnp.array([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0], [0.0, -1.0, 0.0]], dtype=jnp.float32)


def obj_pose_kitti2nusc(obj_pose, obj_h):
    """KITTI-convention object pose -> nuScenes convention. Batched (..., 3, 4).
    Lifts the box center from the ground plane by h/2 and rotates the frame."""
    R = obj_pose[..., :, :3] @ _R_K2N
    t = obj_pose[..., :, 3]
    t = t.at[..., 1].add(-jnp.asarray(obj_h) / 2)
    return jnp.concatenate([R, t[..., :, None]], axis=-1)


def obj_pose_nusc2kitti(obj_pose, obj_h):
    """nuScenes-convention object pose -> KITTI convention. Batched (..., 3, 4)."""
    R = obj_pose[..., :, :3] @ _R_N2K
    t = obj_pose[..., :, 3]
    t = t.at[..., 1].add(jnp.asarray(obj_h) / 2)
    return jnp.concatenate([R, t[..., :, None]], axis=-1)


def invert_pose(pose):
    """Invert a (..., 3, 4) rigid transform: [R|t] -> [R^T | -R^T t]."""
    R_t = jnp.swapaxes(pose[..., :, :3], -1, -2)
    t = -(R_t @ pose[..., :, 3:4])
    return jnp.concatenate([R_t, t], axis=-1)
