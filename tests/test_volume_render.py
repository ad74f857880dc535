import numpy as np
import jax.numpy as jnp

from supnerf_tpu.ops import volume_render as vr


def _ref_volume_render(sigmas, rgbs, z_vals, white_bkgd=False):
    """Numpy oracle mirroring reference volume_rendering3 (renderer.py:355-379)."""
    deltas = z_vals[:, 1:] - z_vals[:, :-1]
    deltas = np.concatenate([deltas, np.ones_like(deltas[:, :1]) * 1e10], -1)
    alphas = 1 - np.exp(-np.maximum(sigmas, 0) * deltas)
    trans = 1 - alphas + 1e-10
    transmittance = np.concatenate([np.ones_like(trans[:, :1]), trans], -1)
    accum_trans = np.cumprod(transmittance, -1)[:, :-1]
    weights = alphas * accum_trans
    rgb = np.sum(weights[..., None] * rgbs, -2)
    depth = np.sum(weights * z_vals, -1)
    if white_bkgd:
        rgb = rgb + 1 - weights.sum(-1, keepdims=True)
    return rgb, depth, accum_trans[:, -1]


def test_matches_reference_formula(rng):
    R, S = 37, 64
    sigmas = rng.uniform(-1, 5, size=(R, S)).astype(np.float32)
    rgbs = rng.uniform(0, 1, size=(R, S, 3)).astype(np.float32)
    z = np.sort(rng.uniform(5, 15, size=(R, S)).astype(np.float32), axis=-1)
    for wb in (False, True):
        rgb, depth, acc = vr.volume_render(jnp.asarray(sigmas), jnp.asarray(rgbs), jnp.asarray(z), wb)
        rgb_r, depth_r, acc_r = _ref_volume_render(sigmas, rgbs, z, wb)
        np.testing.assert_allclose(np.asarray(rgb), rgb_r, atol=2e-5)
        np.testing.assert_allclose(np.asarray(depth), depth_r, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(acc), acc_r, atol=2e-5)


def test_sigma_trailing_dim_and_shared_z(rng):
    R, S = 16, 32
    sigmas = rng.uniform(0, 3, size=(R, S, 1)).astype(np.float32)
    rgbs = rng.uniform(0, 1, size=(R, S, 3)).astype(np.float32)
    z = np.sort(rng.uniform(5, 15, size=S).astype(np.float32))
    rgb, depth, acc = vr.volume_render(jnp.asarray(sigmas), jnp.asarray(rgbs), jnp.asarray(z))
    rgb_r, depth_r, acc_r = _ref_volume_render(
        sigmas[..., 0], rgbs, np.broadcast_to(z, (R, S))
    )
    np.testing.assert_allclose(np.asarray(rgb), rgb_r, atol=2e-5)
    np.testing.assert_allclose(np.asarray(depth), depth_r, rtol=1e-4)


def test_batched_leading_dims(rng):
    B, R, S = 3, 8, 16
    sigmas = rng.uniform(0, 3, size=(B, R, S)).astype(np.float32)
    rgbs = rng.uniform(0, 1, size=(B, R, S, 3)).astype(np.float32)
    z = np.sort(rng.uniform(5, 15, size=(B, R, S)).astype(np.float32), axis=-1)
    rgb, depth, acc = vr.volume_render(jnp.asarray(sigmas), jnp.asarray(rgbs), jnp.asarray(z))
    assert rgb.shape == (B, R, 3) and depth.shape == (B, R) and acc.shape == (B, R)
    for b in range(B):
        rgb_r, _, _ = _ref_volume_render(sigmas[b], rgbs[b], z[b])
        np.testing.assert_allclose(np.asarray(rgb[b]), rgb_r, atol=2e-5)


def test_acc_trans_excludes_saturated_last_sample(rng):
    """Regression: acc_trans must be the EXCLUSIVE cumprod's last element.
    With positive density at the farthest sample, the inclusive form saturates
    to ~0 through the 1e10 last delta and kills the occupancy gradient."""
    R, S = 4, 16
    sigmas = np.zeros((R, S), np.float32)
    sigmas[:, -1] = 0.5  # density ONLY at the last sample
    z = np.broadcast_to(np.linspace(5, 15, S, dtype=np.float32), (R, S))
    _, _, acc = vr.volume_render(jnp.asarray(sigmas), jnp.zeros((R, S, 3)), jnp.asarray(z))
    # exclusive: the last sample's (saturated) alpha is not included
    np.testing.assert_allclose(np.asarray(acc), 1.0, atol=1e-5)
    rgb_r, depth_r, acc_r = _ref_volume_render(sigmas, np.zeros((R, S, 3)), z)
    np.testing.assert_allclose(np.asarray(acc), acc_r, atol=1e-6)


def test_weights_properties(rng):
    R, S = 10, 64
    sigmas = rng.uniform(0, 10, size=(R, S)).astype(np.float32)
    z = np.broadcast_to(np.linspace(5, 15, S, dtype=np.float32), (R, S))
    w, acc = vr.composite_weights(jnp.asarray(sigmas), jnp.asarray(z))
    w = np.asarray(w)
    assert (w >= 0).all()
    assert (w.sum(-1) <= 1.0 + 1e-5).all()
    # opaque field -> weights sum ~1, acc_trans ~0
    w2, acc2 = vr.composite_weights(jnp.full((R, S), 100.0), jnp.asarray(z))
    assert np.asarray(w2).sum(-1).min() > 0.999
    assert np.asarray(acc2).max() < 1e-3
    # empty field -> zero weights, acc_trans ~1
    w3, acc3 = vr.composite_weights(jnp.zeros((R, S)), jnp.asarray(z))
    assert np.asarray(w3).max() == 0
    np.testing.assert_allclose(np.asarray(acc3), 1.0, atol=1e-5)


def test_losses(rng):
    R = 20
    rgb = rng.uniform(0, 1, size=(R, 3)).astype(np.float32)
    occ = rng.choice([-1.0, 0.0, 1.0], size=(R, 1)).astype(np.float32)
    # identical prediction -> zero rgb loss, infinite psnr surrogate
    l = float(vr.rgb_loss_masked(jnp.asarray(rgb), jnp.asarray(rgb), jnp.asarray(occ)))
    assert l == 0.0
    acc = rng.uniform(0, 1, size=(R,)).astype(np.float32)
    lo = float(vr.occupancy_loss(jnp.asarray(acc), jnp.asarray(occ)))
    w = np.abs(occ)
    ref = np.sum(np.exp(-occ * (0.5 - acc[:, None])) * w) / (w.sum() + 1e-9)
    np.testing.assert_allclose(lo, ref, rtol=1e-5)
