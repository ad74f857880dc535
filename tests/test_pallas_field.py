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


def test_pallas_field_bf16_close():
    model, variables, xyz, vd, sc, tc = _setup()
    sig_ref, rgb_ref = model.apply(variables, xyz, vd, sc, tc)
    packed = pack_decoder_params(variables["params"], 3, 1)
    sig, rgb = field_forward_pallas(
        packed, xyz, vd, sc, tc, dtype=jnp.bfloat16, tile_m=128, interpret=True)
    # bf16 operand precision: ~1e-2 relative
    np.testing.assert_allclose(np.asarray(sig), np.asarray(sig_ref), atol=0.05)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref), atol=0.05)


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
