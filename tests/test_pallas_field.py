"""Parity of the fused Pallas field kernel vs the flax decoder (interpret mode
on the CPU test mesh; the TPU path is exercised by bench.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from supnerf_tpu.models.nerf_mlp import CodeNeRFDecoder
from supnerf_tpu.ops.pallas_field import (
    field_forward_pallas,
    make_pallas_field_fn,
    pack_decoder_params,
)


def _setup(shape_blocks=3, texture_blocks=1, W=256):
    model = CodeNeRFDecoder(shape_blocks=shape_blocks, texture_blocks=texture_blocks,
                            W=W, latent_dim=W)
    key = jax.random.PRNGKey(0)
    xyz = jax.random.normal(key, (40, 8, 3)) * 0.4
    vd = jax.random.normal(jax.random.PRNGKey(1), (40, 8, 3))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    sc = jax.random.normal(jax.random.PRNGKey(2), (W,)) * 0.3
    tc = jax.random.normal(jax.random.PRNGKey(3), (W,)) * 0.3
    variables = model.init(key, xyz, vd, sc, tc)
    return model, variables, xyz, vd, sc, tc


def test_pallas_field_matches_flax_f32():
    model, variables, xyz, vd, sc, tc = _setup()
    sig_ref, rgb_ref = model.apply(variables, xyz, vd, sc, tc)
    packed = pack_decoder_params(variables["params"], 3, 1)
    sig, rgb = field_forward_pallas(
        packed, xyz, vd, sc, tc, dtype=jnp.float32, tile_m=128, interpret=True)
    np.testing.assert_allclose(np.asarray(sig), np.asarray(sig_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref), atol=2e-5)


def test_pallas_field_pe_outside_matches_flax():
    """The PE-outside variant (pe_in_kernel=False, the differentiable core's
    forward) must also match; the default path computes PE in-kernel."""
    model, variables, xyz, vd, sc, tc = _setup()
    sig_ref, rgb_ref = model.apply(variables, xyz, vd, sc, tc)
    packed = pack_decoder_params(variables["params"], 3, 1)
    sig, rgb = field_forward_pallas(
        packed, xyz, vd, sc, tc, dtype=jnp.float32, tile_m=128, interpret=True,
        pe_in_kernel=False)
    np.testing.assert_allclose(np.asarray(sig), np.asarray(sig_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref), atol=2e-5)


def test_pallas_field_bf16_close():
    model, variables, xyz, vd, sc, tc = _setup()
    sig_ref, rgb_ref = model.apply(variables, xyz, vd, sc, tc)
    packed = pack_decoder_params(variables["params"], 3, 1)
    sig, rgb = field_forward_pallas(
        packed, xyz, vd, sc, tc, dtype=jnp.bfloat16, tile_m=128, interpret=True)
    # bf16 operand precision: ~1e-2 relative
    np.testing.assert_allclose(np.asarray(sig), np.asarray(sig_ref), atol=0.05)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref), atol=0.05)


def test_pallas_field_grads_match_flax():
    """field_apply_pallas: gradient parity vs flax autodiff for every TTO
    degree of freedom (xyz/viewdir -> pose, shapecode/texturecode -> codes)."""
    from supnerf_tpu.ops.pallas_field import field_apply_pallas

    model, variables, xyz, vd, sc, tc = _setup()
    packed = pack_decoder_params(variables["params"], 3, 1)

    def loss_flax(xyz, vd, sc, tc):
        sig, rgb = model.apply(variables, xyz, vd, sc, tc)
        return jnp.sum(sig * 0.3) + jnp.sum(rgb ** 2)

    def loss_pallas(xyz, vd, sc, tc):
        sig, rgb = field_apply_pallas(
            packed, xyz, vd, sc, tc, dtype=jnp.float32,
            tile_fwd=128, tile_bwd=64, interpret=True)
        return jnp.sum(sig * 0.3) + jnp.sum(rgb ** 2)

    args = (xyz, vd, sc, tc)
    g_ref = jax.grad(loss_flax, argnums=(0, 1, 2, 3))(*args)
    g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(*args)
    for gr, gp, name in zip(g_ref, g_pal, ["xyz", "vd", "sc", "tc"]):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=1e-4, atol=2e-4, err_msg=name)


def test_pallas_field_grads_under_vmap():
    """The TTO core vmaps the field over objects; the custom_vjp + pallas_call
    pair must batch correctly with per-object codes."""
    from supnerf_tpu.ops.pallas_field import field_apply_pallas

    model, variables, xyz, vd, sc, tc = _setup(shape_blocks=2, texture_blocks=1,
                                               W=128)
    packed = pack_decoder_params(variables["params"], 2, 1)
    B = 3
    xyz_b = jnp.stack([xyz[:16] * (1 + 0.1 * i) for i in range(B)])
    vd_b = jnp.stack([vd[:16]] * B)
    sc_b = jnp.stack([sc[:128] * (1 - 0.2 * i) for i in range(B)])
    tc_b = jnp.stack([tc[:128] + 0.05 * i for i in range(B)])

    def loss_one_flax(xyz, vd, sc, tc):
        sig, rgb = model.apply(variables, xyz, vd, sc, tc)
        return jnp.mean(sig) + jnp.mean(rgb ** 2)

    def loss_one_pallas(xyz, vd, sc, tc):
        sig, rgb = field_apply_pallas(
            packed, xyz, vd, sc, tc, shape_blocks=2, texture_blocks=1,
            dtype=jnp.float32, tile_fwd=64, tile_bwd=64, interpret=True)
        return jnp.mean(sig) + jnp.mean(rgb ** 2)

    g_ref = jax.vmap(jax.grad(loss_one_flax, argnums=(0, 2, 3)))(
        xyz_b, vd_b, sc_b, tc_b)
    g_pal = jax.vmap(jax.grad(loss_one_pallas, argnums=(0, 2, 3)))(
        xyz_b, vd_b, sc_b, tc_b)
    for gr, gp, name in zip(g_ref, g_pal, ["xyz", "sc", "tc"]):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=1e-4, atol=2e-4, err_msg=name)


def test_pallas_field_padding_and_closure():
    """Non-tile-multiple point counts are padded and un-padded correctly."""
    model, variables, xyz, vd, sc, tc = _setup(shape_blocks=1, texture_blocks=1, W=128)

    class _Wrap:
        pass

    vars_wrapped = {"params": {"decoder": variables["params"]}}
    field = make_pallas_field_fn(vars_wrapped, shape_blocks=1, texture_blocks=1,
                                 dtype=jnp.float32, interpret=True)
    xyz_odd = xyz.reshape(-1, 3)[:77].reshape(77, 1, 3)
    vd_odd = vd.reshape(-1, 3)[:77].reshape(77, 1, 3)
    sig, rgb = field(xyz_odd, vd_odd, sc[:128], tc[:128])
    assert sig.shape == (77, 1, 1) and rgb.shape == (77, 1, 3)
    sig_ref, rgb_ref = model.apply(variables, xyz_odd, vd_odd, sc[:128], tc[:128])
    np.testing.assert_allclose(np.asarray(sig), np.asarray(sig_ref), atol=2e-5)


def test_pallas_train_field_full_grads_match_flax():
    """field_train_pallas (training path): value + gradients for EVERY decoder
    weight/bias and the per-object codes must match flax autodiff. Exercises
    the in-kernel weight-grad accumulation across the sequential grid and the
    per-object latent block indexing."""
    from supnerf_tpu.ops.pallas_field import field_train_pallas

    model, variables, xyz, vd, sc, tc = _setup(shape_blocks=2, texture_blocks=1,
                                               W=128)
    B, R, S = 2, 16, 8  # per-object points = 128, tiles of 64 -> 2 tiles/obj
    xyz_b = xyz.reshape(-1, 3)[:B * R * S].reshape(B, R, S, 3)
    vd_b = vd.reshape(-1, 3)[:B * R * S].reshape(B, R, S, 3)
    sc_b = jnp.stack([sc[:128], sc[:128] * 0.5])
    tc_b = jnp.stack([tc[:128], tc[:128] * -0.3])
    params = variables["params"]

    def loss_flax(p, scb, tcb):
        sig, rgb = model.apply({"params": p}, xyz_b, vd_b,
                               scb[:, None, None, :], tcb[:, None, None, :])
        return jnp.mean(sig * 0.7) + jnp.mean((rgb - 0.2) ** 2)

    def loss_pallas(p, scb, tcb):
        packed = pack_decoder_params(p, 2, 1)
        sig, rgb = field_train_pallas(
            packed, xyz_b, vd_b, scb, tcb, shape_blocks=2, texture_blocks=1,
            dtype=jnp.float32, tile_fwd=64, tile_bwd=64, interpret=True)
        return jnp.mean(sig * 0.7) + jnp.mean((rgb - 0.2) ** 2)

    v_ref, g_ref = jax.value_and_grad(loss_flax, argnums=(0, 1, 2))(
        params, sc_b, tc_b)
    v_pal, g_pal = jax.value_and_grad(loss_pallas, argnums=(0, 1, 2))(
        params, sc_b, tc_b)
    np.testing.assert_allclose(float(v_pal), float(v_ref), rtol=1e-5)
    flat_ref = jax.tree_util.tree_flatten_with_path(g_ref[0])[0]
    flat_pal = jax.tree_util.tree_flatten_with_path(g_pal[0])[0]
    for (path, a), (_, b) in zip(flat_ref, flat_pal):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path))
    for a, b, name in zip(g_ref[1:], g_pal[1:], ["shapecodes", "texturecodes"]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-5, err_msg=name)
