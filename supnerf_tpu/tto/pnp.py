"""PnP-RANSAC pose bootstrap from the direct box-corner UV regression.

Equivalent of the reference's opt_pose==2 path
(/root/reference/src/optimizer_nuscenes.py:464-494): the encoder's 16-d direct
corner prediction is denormalized to image pixels and solved against the 3D box
corners with P3P-RANSAC; the depth is sanity-gated to (0, 60) m.

cv2 has no jnp equivalent, so this runs host-side once per object BEFORE the
jitted optimization (it is outside the hot loop in the reference as well).
"""
from __future__ import annotations

import numpy as np


def _box_corners_3d(wlh):
    w, l, h = wlh
    x = l / 2 * np.array([1, 1, 1, 1, -1, -1, -1, -1])
    y = w / 2 * np.array([1, -1, -1, 1, 1, -1, -1, 1])
    z = h / 2 * np.array([1, 1, -1, -1, 1, 1, -1, -1])
    return np.vstack([x, y, z]).T  # (8, 3)


def denormalize_uv_direct(uv_direct, roi):
    """(16,) ROI-normalized direct prediction -> (2, 8) image-pixel corners
    (reference :465-470)."""
    uv = np.asarray(uv_direct, np.float64).reshape(2, 8)
    roi = np.asarray(roi, np.float64)
    dim = max(roi[2] - roi[0], roi[3] - roi[1])
    uv = uv * (dim / 2)
    uv[0] += (roi[0] + roi[2]) / 2
    uv[1] += (roi[1] + roi[3]) / 2
    return uv


def pnp_bootstrap(uv_direct, roi, wlh, K, src_pose, depth_range=(0.0, 60.0)):
    """Refine src_pose (3, 4) with P3P-RANSAC on the predicted corners.
    Returns a new (3, 4) pose (rotation always taken; translation only if the
    solved depth is in range), or src_pose unchanged on failure."""
    import cv2

    p2d = denormalize_uv_direct(uv_direct, roi).T.astype(np.float64)  # (8, 2)
    p3d = _box_corners_3d(np.asarray(wlh, np.float64))
    dist_coeff = np.zeros(4, np.float32)
    try:
        retval, rvec, tvec, inliers = cv2.solvePnPRansac(
            p3d, p2d, np.asarray(K, np.float64), dist_coeff,
            iterationsCount=5000, reprojectionError=1, flags=cv2.SOLVEPNP_P3P,
        )
    except cv2.error:
        return np.asarray(src_pose, np.float32)
    out = np.asarray(src_pose, np.float64).copy()
    if rvec is not None and tvec is not None:
        R_est, _ = cv2.Rodrigues(rvec)
        out[:3, :3] = R_est
        if depth_range[0] < float(tvec[2, 0]) < depth_range[1]:
            out[:3, 3] = tvec[:, 0]
    return out.astype(np.float32)
