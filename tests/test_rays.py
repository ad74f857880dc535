import numpy as np
import jax
import jax.numpy as jnp

from supnerf_tpu.geometry import rays


K = np.array([[800.0, 0, 640], [0, 800, 360], [0, 0, 1]], dtype=np.float32)


def _ref_get_rays(K, c2w, roi, uv_steps):
    """Numpy oracle for reference utils.get_rays (utils.py:107-135)."""
    dx, dy, fx, fy = K[0, 2], K[1, 2], K[0, 0], K[1, 1]
    xs = np.linspace(roi[0], roi[2] - 1, uv_steps[0])
    ys = np.linspace(roi[1], roi[3] - 1, uv_steps[1])
    i, j = np.meshgrid(xs, ys, indexing="xy")
    dirs = np.stack([(i - dx) / fx, (j - dy) / fy, np.ones_like(i)], -1)
    rays_d = np.sum(dirs[..., None, :] * c2w[:3, :3], -1)
    viewdirs = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = np.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o.reshape(-1, 3), viewdirs.reshape(-1, 3)


def random_c2w(rng):
    from scipy.spatial.transform import Rotation as R

    Rm = R.from_rotvec(rng.normal(size=3) * 0.5).as_matrix()
    t = rng.uniform(-3, 3, size=(3, 1))
    return np.concatenate([Rm, t], axis=1).astype(np.float32)


def test_get_rays_matches_reference(rng):
    c2w = random_c2w(rng)
    roi = np.array([100, 150, 260, 280], dtype=np.float32)
    ro, vd = rays.get_rays(jnp.asarray(K), jnp.asarray(c2w), jnp.asarray(roi), (32, 32))
    ro_ref, vd_ref = _ref_get_rays(K, c2w, roi, (32, 32))
    np.testing.assert_allclose(np.asarray(ro), ro_ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(vd), vd_ref, atol=1e-5)


def test_get_rays_specified(rng):
    c2w = random_c2w(rng)
    x = rng.uniform(0, 1200, size=20).astype(np.float32)
    y = rng.uniform(0, 700, size=20).astype(np.float32)
    ro, vd = rays.get_rays_specified(jnp.asarray(K), jnp.asarray(c2w), x, y)
    assert ro.shape == (20, 3) and vd.shape == (20, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(vd), axis=-1), 1.0, atol=1e-6)


def test_sample_from_rays_bounds_and_shared_jitter():
    ro = jnp.zeros((5, 3))
    vd = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (5, 3))
    xyz, vdo, z = rays.sample_from_rays(jax.random.PRNGKey(0), ro, vd, 8.0, 12.0, 64)
    z = np.asarray(z)
    assert z.shape == (64,)
    assert (z >= 8.0).all() and (z <= 12.0).all()
    assert (np.diff(z) > 0).all()  # stratified and ordered
    np.testing.assert_allclose(np.asarray(xyz)[:, :, 2], np.broadcast_to(z, (5, 64)), atol=1e-6)
    assert vdo.shape == (5, 64, 3)


def test_sample_z_stratified_per_ray():
    near = jnp.array([[1.0], [5.0]])
    far = jnp.array([[2.0], [9.0]])
    z = np.asarray(rays.sample_z_stratified(jax.random.PRNGKey(1), near, far, 16))
    assert z.shape == (2, 16)
    assert (z[0] >= 1.0).all() and (z[0] <= 2.0).all()
    assert (z[1] >= 5.0).all() and (z[1] <= 9.0).all()


def test_ray_box_intersection():
    ro = jnp.array([[0.0, 0.0, -5.0], [3.0, 3.0, -5.0], [0.0, 0.0, 5.0]])
    vd = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    t_near, t_far, hit = rays.ray_box_intersection(ro, vd)
    hit = np.asarray(hit)
    assert hit[0] and not hit[1] and not hit[2]  # miss laterally; box behind
    np.testing.assert_allclose(float(t_near[0]), 4.0, atol=1e-5)
    np.testing.assert_allclose(float(t_far[0]), 6.0, atol=1e-5)


def test_aabb_ray_bounds_hit_and_miss():
    obj_sz = np.array([2.0, 4.0, 1.5], np.float32)
    diag = np.linalg.norm(obj_sz)
    ro = jnp.array([[0.0, 0.0, -10.0], [50.0, 0.0, -10.0]])
    vd = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    bounds, hit, ro_n = rays.aabb_ray_bounds(ro, vd, obj_sz)
    assert bool(hit[0]) and not bool(hit[1])
    np.testing.assert_allclose(np.asarray(bounds)[1], [-1.0, -1.0])
    # hit ray: enters at z=-h/ (normalized frame): half-extent h/diag in z
    h_half = obj_sz[2] / diag
    np.testing.assert_allclose(float(bounds[0, 0]), 10.0 / (diag / 2) - h_half, rtol=1e-5)
