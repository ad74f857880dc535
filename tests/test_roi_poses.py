import numpy as np
import jax
import jax.numpy as jnp

from supnerf_tpu.geometry import roi as roi_ops
from supnerf_tpu.geometry import poses

K = np.array([[800.0, 0, 640], [0, 800, 360], [0, 0, 1]], dtype=np.float32)


def test_roi_process_sq_pad_clip():
    roi = np.array([100, 150, 200, 350])
    out = roi_ops.roi_process(roi, H=900, W=1600, roi_margin=5, sq_pad=True)
    # margin 5 -> [95,145,205,355]; square side 210 about center (150, 250)
    np.testing.assert_array_equal(out, [45, 145, 255, 355])
    out2 = roi_ops.roi_process(np.array([-20, -30, 1700, 1000]), H=900, W=1600)
    np.testing.assert_array_equal(out2, [0, 0, 1599, 899])


def test_roi_resize_and_coord_trans():
    out = roi_ops.roi_resize([0, 0, 100, 50], ratio=2.0)
    np.testing.assert_allclose(out, [-50, -25, 150, 75])
    x, y = roi_ops.roi_coord_trans(np.array([50.0]), np.array([25.0]), [0, 0, 100, 50], 128)
    np.testing.assert_allclose([x[0], y[0]], [64.0, 64.0])


def test_preprocess_img_square():
    img = np.zeros((60, 120, 3), np.float32)
    img[:, :, 0] = 0.5
    out = roi_ops.preprocess_img_square(img, new_size=128, pad_white=True)
    assert out.shape == (128, 128, 3)
    # content occupies center 64 rows
    assert np.allclose(out[0], 1.0) and np.allclose(out[-1], 1.0)
    assert np.allclose(out[64, :, 0], 0.5, atol=1e-5)


def test_preprocess_occ_square_floor():
    occ = np.ones((40, 80), np.float32)
    out = roi_ops.preprocess_occ_square(occ, new_size=64, pad_value=-1)
    assert out.shape == (64, 64)
    assert set(np.unique(out)).issubset({-1.0, 0.0, 1.0})


def test_get_random_pose2_distribution():
    roi = jnp.asarray([500.0, 200.0, 700.0, 400.0])
    keys = jax.random.split(jax.random.PRNGKey(0), 256)
    batch = jax.vmap(lambda k: poses.get_random_pose2(k, jnp.asarray(K), roi))(keys)
    batch = np.asarray(batch)
    assert batch.shape == (256, 3, 4)
    # depth fixed at 20
    np.testing.assert_allclose(batch[:, 2, 3], 20.0, atol=1e-4)
    # rotations are valid
    dets = np.linalg.det(batch[:, :, :3])
    np.testing.assert_allclose(dets, 1.0, atol=1e-4)
    # projected center stays within ±0.4 roi dims of roi center
    uv = (K @ batch[:, :, 3].T).T
    uv = uv[:, :2] / uv[:, 2:3]
    assert (np.abs(uv[:, 0] - 600) <= 80 + 1e-3).all()
    assert (np.abs(uv[:, 1] - 300) <= 80 + 1e-3).all()


def test_get_random_pose_around_target():
    tgt = np.concatenate([np.eye(3), np.array([[1.0], [0.5], [15.0]])], axis=1).astype(np.float32)
    roi = jnp.asarray([500.0, 200.0, 700.0, 400.0])
    p = poses.get_random_pose(jax.random.PRNGKey(3), jnp.asarray(tgt), jnp.asarray(K), roi)
    p = np.asarray(p)
    assert 15.0 * 0.7 <= p[2, 3] <= 15.0 * 1.3
    np.testing.assert_allclose(np.linalg.det(p[:, :3]), 1.0, atol=1e-4)


def test_calc_pose_err():
    p1 = np.concatenate([np.eye(3), np.array([[0.0], [0.0], [10.0]])], axis=1).astype(np.float32)
    th = 0.3
    Rz = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    p2 = np.concatenate([Rz, np.array([[3.0], [4.0], [10.0]])], axis=1).astype(np.float32)
    eR, eT = poses.calc_pose_err(jnp.asarray(p1)[None], jnp.asarray(p2)[None])
    np.testing.assert_allclose(float(eR[0]), th, atol=1e-5)
    np.testing.assert_allclose(float(eT[0]), 5.0, atol=1e-5)
