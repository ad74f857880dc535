import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from supnerf_tpu.geometry import rotations as rot


def random_rotvecs(rng, n=64, max_angle=np.pi * 0.999):
    v = rng.normal(size=(n, 3))
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    angles = rng.uniform(1e-4, max_angle, size=(n, 1))
    return (v * angles).astype(np.float32)


def test_axis_angle_to_matrix_matches_scipy(rng):
    rv = random_rotvecs(rng)
    ours = np.asarray(rot.axis_angle_to_matrix(jnp.asarray(rv)))
    ref = R.from_rotvec(rv).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_axis_angle_to_matrix_zero():
    m = np.asarray(rot.axis_angle_to_matrix(jnp.zeros(3)))
    np.testing.assert_allclose(m, np.eye(3), atol=1e-7)


def test_matrix_to_axis_angle_roundtrip(rng):
    rv = random_rotvecs(rng)
    mats = R.from_rotvec(rv).as_matrix().astype(np.float32)
    back = np.asarray(rot.matrix_to_axis_angle(jnp.asarray(mats)))
    # axis-angle is unique up to sign/2pi below pi
    np.testing.assert_allclose(back, rv, atol=2e-4)


def test_matrix_to_quaternion_matches_scipy(rng):
    rv = random_rotvecs(rng)
    mats = R.from_rotvec(rv).as_matrix().astype(np.float32)
    q_ours = np.asarray(rot.matrix_to_quaternion(jnp.asarray(mats)))  # wxyz
    q_ref = R.from_matrix(mats).as_quat()  # xyzw
    q_ref = np.concatenate([q_ref[:, 3:], q_ref[:, :3]], axis=-1)
    q_ref = q_ref * np.where(q_ref[:, :1] < 0, -1.0, 1.0)
    np.testing.assert_allclose(np.abs(q_ours), np.abs(q_ref), atol=1e-4)


def test_quaternion_matrix_roundtrip(rng):
    rv = random_rotvecs(rng)
    mats = R.from_rotvec(rv).as_matrix().astype(np.float32)
    q = rot.matrix_to_quaternion(jnp.asarray(mats))
    back = np.asarray(rot.quaternion_to_matrix(q))
    np.testing.assert_allclose(back, mats, atol=1e-5)


def test_euler_roundtrip(rng):
    e = rng.uniform(-1.2, 1.2, size=(32, 3)).astype(np.float32)
    m = rot.euler_angles_to_matrix(jnp.asarray(e), "XYZ")
    ref = R.from_euler("XYZ", e).as_matrix()
    np.testing.assert_allclose(np.asarray(m), ref, atol=1e-5)
    back = np.asarray(rot.matrix_to_euler_angles(m, "XYZ"))
    np.testing.assert_allclose(back, e, atol=1e-4)


def test_rot_dist(rng):
    rv = random_rotvecs(rng, max_angle=np.pi * 0.9)
    R1 = R.from_rotvec(rv).as_matrix().astype(np.float32)
    d = np.asarray(rot.rot_dist(jnp.asarray(R1), jnp.broadcast_to(np.eye(3, dtype=np.float32), R1.shape)))
    np.testing.assert_allclose(d, np.linalg.norm(rv, axis=-1), atol=1e-3)
