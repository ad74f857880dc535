import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from supnerf_tpu.geometry import boxes


def _ref_corners(obj_pose, wlh, is_kitti=False):
    """Numpy port of the reference corner math (utils.py:1076-1107) as oracle."""
    w, l, h = wlh
    if is_kitti:
        x = l / 2 * np.array([1, 1, 1, 1, -1, -1, -1, -1])
        y = h / 2 * np.array([-2, -2, 0, 0, -2, -2, 0, 0])
        z = w / 2 * np.array([1, -1, -1, 1, 1, -1, -1, 1])
    else:
        x = l / 2 * np.array([1, 1, 1, 1, -1, -1, -1, -1])
        y = w / 2 * np.array([1, -1, -1, 1, 1, -1, -1, 1])
        z = h / 2 * np.array([1, 1, -1, -1, 1, 1, -1, -1])
    corners = np.vstack((x, y, z))
    corners = obj_pose[:, :3] @ corners
    return corners + obj_pose[:, 3:4]


def random_pose(rng):
    Rm = R.from_rotvec(rng.normal(size=3)).as_matrix()
    t = rng.uniform(-5, 5, size=(3, 1))
    return np.concatenate([Rm, t], axis=1).astype(np.float32)


def test_corners_of_box(rng):
    for is_kitti in (False, True):
        pose = random_pose(rng)
        wlh = rng.uniform(1, 4, size=3).astype(np.float32)
        ours = np.asarray(boxes.corners_of_box(jnp.asarray(pose), jnp.asarray(wlh), is_kitti))
        ref = _ref_corners(pose, wlh, is_kitti)
        np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_corners_of_box_batch(rng):
    poses = np.stack([random_pose(rng) for _ in range(5)])
    wlhs = rng.uniform(1, 4, size=(5, 3)).astype(np.float32)
    out = np.asarray(boxes.corners_of_box_batch(jnp.asarray(poses), jnp.asarray(wlhs)))
    for i in range(5):
        np.testing.assert_allclose(out[i], _ref_corners(poses[i], wlhs[i]), atol=1e-4)


def test_view_points_perspective(rng):
    K = np.array([[800.0, 0, 640], [0, 800, 360], [0, 0, 1]], dtype=np.float32)
    pts = rng.uniform(1, 10, size=(3, 8)).astype(np.float32)
    out = np.asarray(boxes.view_points(jnp.asarray(pts), jnp.asarray(K), normalize=True))
    ref = K @ pts
    ref = ref / ref[2:3]
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_view_points_batch_shapes(rng):
    K = np.broadcast_to(np.array([[800.0, 0, 640], [0, 800, 360], [0, 0, 1]], np.float32), (4, 3, 3))
    pts = rng.uniform(1, 10, size=(4, 3, 8)).astype(np.float32)
    out = boxes.view_points_batch(jnp.asarray(pts), jnp.asarray(K), normalize=True)
    assert out.shape == (4, 3, 8)
    np.testing.assert_allclose(np.asarray(out[..., 2, :]), 1.0, atol=1e-6)


def test_normalize_by_roi(rng):
    pts = rng.uniform(0, 200, size=(2, 2, 8)).astype(np.float32)
    roi = np.array([[10, 20, 110, 100], [0, 0, 50, 80]], dtype=np.float32)
    out, dim = boxes.normalize_by_roi(jnp.asarray(pts), jnp.asarray(roi), need_square=True)
    np.testing.assert_allclose(np.asarray(dim), [100.0, 80.0])
    expected0 = (pts[0, 0] - 60.0) / 100.0
    np.testing.assert_allclose(np.asarray(out)[0, 0], expected0, rtol=1e-5)


def test_pts_in_box_3d(rng):
    pose = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1).astype(np.float32)
    wlh = np.array([2.0, 4.0, 1.5], np.float32)
    corners = boxes.corners_of_box(jnp.asarray(pose), jnp.asarray(wlh))
    inside = np.array([[0.0, 0.0, 0.0], [1.9, 0.9, 0.7], [-1.9, -0.9, -0.7]]).T
    outside = np.array([[2.5, 0, 0], [0, 1.5, 0], [0, 0, 1.0]]).T
    m_in = np.asarray(boxes.pts_in_box_3d(jnp.asarray(inside, jnp.float32), corners))
    m_out = np.asarray(boxes.pts_in_box_3d(jnp.asarray(outside, jnp.float32), corners))
    assert m_in.all()
    assert not m_out.any()


def test_kitti_nusc_pose_roundtrip(rng):
    poses = np.stack([random_pose(rng) for _ in range(4)])
    h = 1.6
    n = boxes.obj_pose_kitti2nusc(jnp.asarray(poses), h)
    back = np.asarray(boxes.obj_pose_nusc2kitti(n, h))
    np.testing.assert_allclose(back, poses, atol=1e-5)


def test_invert_pose(rng):
    pose = random_pose(rng)
    inv = np.asarray(boxes.invert_pose(jnp.asarray(pose)))
    composed = pose[:, :3] @ inv[:, :3]
    np.testing.assert_allclose(composed, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(pose[:, :3] @ inv[:, 3] + pose[:, 3], 0.0, atol=1e-5)
