"""Property-based tests (hypothesis) for the pure math core.

SURVEY.md §4 calls for property tests over the reference's pure functions:
compositing weight laws, rotation-conversion round-trips, and PE layout
laws hold for ARBITRARY inputs, not just the golden fixtures."""
import numpy as np
import jax
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st
from hypothesis.extra import numpy as hnp

from supnerf_tpu.geometry.rotations import (
    axis_angle_to_matrix,
    euler_angles_to_matrix,
    matrix_to_axis_angle,
    matrix_to_euler_angles,
)
from supnerf_tpu.ops.volume_render import composite_weights, volume_render

_SETTINGS = dict(max_examples=25, deadline=None)
# bounds chosen exactly representable in float32 (hypothesis requires it)
_f = lambda lo, hi: st.floats(lo, hi, width=32)


@settings(**_SETTINGS)
@given(
    sig=hnp.arrays(np.float32, (5, 9), elements=_f(-64.0, 512.0)),
    z0=_f(0.5, 32.0),
    span=_f(0.015625, 16.0),
)
def test_compositing_weight_laws(sig, z0, span):
    """For ANY density field and ordered z: weights in [0, 1], weight sums
    in [0, 1], acc_trans = transmittance BEFORE the last sample = 1 -
    sum(w[:-1]) by telescoping (the reference's acc_trans_rays semantics —
    see composite_weights' docstring; the 1e10 last delta makes the last
    weight absorb T_{S-1}), and depth inside the sampled z range for rays
    with weight."""
    R, S = sig.shape
    z = np.linspace(z0, z0 + span, S, dtype=np.float32)[None, :].repeat(R, 0)
    w, _ = composite_weights(jnp.asarray(sig), jnp.asarray(z))
    w = np.asarray(w)
    assert np.all(w >= -1e-6) and np.all(w <= 1.0 + 1e-5)
    wsum = w.sum(-1)
    assert np.all(wsum <= 1.0 + 1e-5)
    rgb = np.full((R, S, 3), 0.5, np.float32)
    rgb_o, depth, acc = volume_render(jnp.asarray(sig), jnp.asarray(rgb),
                                      jnp.asarray(z))
    acc = np.asarray(acc)
    assert np.all(acc >= -1e-5) and np.all(acc <= 1.0 + 1e-5)
    np.testing.assert_allclose(acc, 1.0 - w[..., :-1].sum(-1), atol=1e-4)
    depth = np.asarray(depth)
    hi = z.max()
    mask = wsum > 1e-4
    # depth = sum(w z) <= hi * sum(w) <= hi; >= lo * sum(w)
    assert np.all(depth[mask] >= z.min() * wsum[mask] - 1e-3)
    assert np.all(depth[mask] <= hi + 1e-3)


@settings(**_SETTINGS)
@given(aa=hnp.arrays(np.float32, (3,), elements=_f(-1.75, 1.75)))
def test_axis_angle_round_trip(aa):
    """axis_angle -> matrix -> axis_angle is the identity for |aa| < pi
    (the principal branch), and the matrix is orthonormal with det +1."""
    if np.linalg.norm(aa) >= np.pi - 1e-2:
        aa = (aa / np.linalg.norm(aa) * (np.pi - 2e-2)).astype(np.float32)
    R = np.asarray(axis_angle_to_matrix(jnp.asarray(aa)))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(R) > 0.99
    back = np.asarray(matrix_to_axis_angle(jnp.asarray(R)))
    np.testing.assert_allclose(back, aa, atol=3e-4)


@settings(**_SETTINGS)
@given(e=hnp.arrays(np.float32, (3,), elements=_f(-1.375, 1.375)))
def test_euler_round_trip(e):
    """euler(XYZ) -> matrix -> euler is the identity away from the gimbal
    singularity (middle angle inside (-pi/2, pi/2))."""
    R = np.asarray(euler_angles_to_matrix(jnp.asarray(e), "XYZ"))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    back = np.asarray(matrix_to_euler_angles(jnp.asarray(R), "XYZ"))
    np.testing.assert_allclose(back, e, atol=3e-4)


@settings(**_SETTINGS)
@given(
    x=hnp.arrays(np.float32, (7, 3), elements=_f(-4.0, 4.0)),
    deg=st.integers(1, 10),
)
def test_positional_encoding_layout(x, deg):
    """PE(x, L) = [x, sin-block, cos-block] with frequencies stacked over
    the whole vector (reference model_supnerf.py:155-161): output
    (N, D(2L+1)); the identity slice is exact and the sin/cos blocks match
    the direct ladder."""
    from supnerf_tpu.models.nerf_mlp import positional_encoding

    pe = np.asarray(positional_encoding(jnp.asarray(x), deg))
    D = x.shape[-1]
    assert pe.shape == (x.shape[0], D * (2 * deg + 1))
    np.testing.assert_array_equal(pe[:, :D], x)
    freqs = 2.0 ** np.arange(deg, dtype=np.float32)
    y = (x[:, None, :] * freqs[:, None]).reshape(x.shape[0], deg * D)
    np.testing.assert_allclose(pe[:, D:D + deg * D], np.sin(y), atol=1e-5)
    np.testing.assert_allclose(pe[:, D + deg * D:], np.cos(y), atol=1e-5)
    assert np.all(np.abs(pe[:, D:]) <= 1.0 + 1e-6)


@settings(**_SETTINGS)
@given(
    aa=hnp.arrays(np.float32, (3,), elements=_f(-1.75, 1.75)),
    t=hnp.arrays(np.float32, (3,), elements=_f(-16.0, 16.0)),
    h=_f(0.5, 3.0),
)
def test_obj_pose_frame_round_trip(aa, t, h):
    """obj_pose kitti -> nusc -> kitti is the identity for any rigid pose
    and object height (reference kitti2nusc frame shim)."""
    from supnerf_tpu.geometry.boxes import (
        obj_pose_kitti2nusc,
        obj_pose_nusc2kitti,
    )

    R = axis_angle_to_matrix(jnp.asarray(aa))
    pose = jnp.concatenate([R, jnp.asarray(t)[:, None]], axis=1)
    back = obj_pose_nusc2kitti(obj_pose_kitti2nusc(pose, h), h)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pose), atol=1e-5)


@settings(**_SETTINGS)
@given(
    o=hnp.arrays(np.float32, (6, 3), elements=_f(-3.0, 3.0)),
    d=hnp.arrays(np.float32, (6, 3), elements=_f(-1.0, 1.0)),
)
def test_ray_box_entry_exit_on_surface(o, d):
    """For every hit ray, the entry/exit points o + t*d lie ON the unit-box
    surface (max |coord| == 1) and every point strictly between them lies
    inside; misses are consistent with the slab test."""
    from supnerf_tpu.geometry.rays import ray_box_intersection

    norms = np.linalg.norm(d, axis=-1)
    ok = norms > 1e-3
    if not ok.any():
        return
    o, d = o[ok], (d[ok] / norms[ok, None]).astype(np.float32)
    t_near, t_far, hit = ray_box_intersection(jnp.asarray(o), jnp.asarray(d))
    t_near, t_far, hit = map(np.asarray, (t_near, t_far, hit))
    for i in range(o.shape[0]):
        if not hit[i]:
            continue
        for t in (t_near[i], t_far[i]):
            p = o[i] + t * d[i]
            assert abs(np.abs(p).max() - 1.0) < 1e-4, (p, t)
        mid = o[i] + 0.5 * (t_near[i] + t_far[i]) * d[i]
        assert np.all(np.abs(mid) <= 1.0 + 1e-4)
