import numpy as np
import jax
import jax.numpy as jnp

from supnerf_tpu.models import SUPNeRF, AutoRF, AutoRFMix, CodeNeRF, build_model
from supnerf_tpu.models.nerf_mlp import positional_encoding


def test_positional_encoding_matches_reference_formula(rng):
    x = rng.normal(size=(5, 3)).astype(np.float32)
    L = 4
    out = np.asarray(positional_encoding(jnp.asarray(x), L))
    # reference PE: concat([x, sin(cat_i 2^i x), cos(cat_i 2^i x)])
    y = np.concatenate([2.0**i * x for i in range(L)], -1)
    ref = np.concatenate([x, np.sin(y), np.cos(y)], -1)
    assert out.shape == (5, 3 * (2 * L + 1))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def _published_supnerf():
    return SUPNeRF(
        shape_blocks=3, texture_blocks=1, pose_blocks=3, regress_blocks=3,
        latent_dim=256, num_xyz_freq=10, num_dir_freq=4,
        pose_shortcut=True, pred_wlh=False,
    )


def test_supnerf_param_count_matches_reference():
    """Golden parameter counts computed from the reference architecture
    (model_supnerf.py, published config shape_blocks=3 texture_blocks=1):
    encoder 47,911,504 + decoder 714,756 + pose refiner 400,390."""
    model = _published_supnerf()
    xyz = jnp.zeros((4, 2, 3))
    vd = jnp.zeros((4, 2, 3))
    code = jnp.zeros((256,))
    img = jnp.zeros((1, 32, 32, 3))
    # shapes only — eval_shape avoids any init compute on the 1-CPU CI host
    variables = jax.eval_shape(
        lambda k: model.init(k, img, True, method=SUPNeRF.encode_img),
        jax.random.PRNGKey(0))
    n_enc = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]["img_encoder"]))
    assert n_enc == 47_911_504
    v2 = jax.eval_shape(lambda k: model.init(k, xyz, vd, code, code),
                        jax.random.PRNGKey(0))
    n_dec = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v2["params"]["decoder"]))
    assert n_dec == 714_756
    v3 = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256)), jnp.zeros((1, 16)),
        method=SUPNeRF.pose_update,
    )
    n_ref = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v3["params"]["pose_refiner"]))
    assert n_ref == 400_390


def test_supnerf_encode_and_field_shapes():
    model = _published_supnerf()
    img = jnp.ones((2, 64, 64, 3)) * 0.5
    variables = model.init(jax.random.PRNGKey(1), img, True, method=SUPNeRF.encode_img)
    (sc, tc, pc, uv, wlh), updates = model.apply(
        variables, img, True, method=SUPNeRF.encode_img, mutable=["batch_stats"]
    )
    assert sc.shape == (2, 256) and tc.shape == (2, 256) and pc.shape == (2, 256)
    assert uv.shape == (2, 16) and wlh is None
    assert "batch_stats" in updates

    vf = model.init(jax.random.PRNGKey(2), jnp.zeros((8, 4, 3)), jnp.zeros((8, 4, 3)),
                    jnp.zeros(256), jnp.zeros(256))
    sig, rgb = model.apply(vf, jnp.ones((8, 4, 3)), jnp.ones((8, 4, 3)),
                           jnp.zeros(256), jnp.zeros(256))
    assert sig.shape == (8, 4, 1) and rgb.shape == (8, 4, 3)
    assert (np.asarray(sig) >= 0).all()  # softplus

    vp = model.init(jax.random.PRNGKey(3), jnp.zeros((2, 256)), jnp.zeros((2, 16)),
                    method=SUPNeRF.pose_update)
    delta = model.apply(vp, jnp.ones((2, 256)), jnp.ones((2, 16)), method=SUPNeRF.pose_update)
    assert delta.shape == (2, 6)


def test_supnerf_pred_wlh_head():
    model = SUPNeRF(latent_dim=64, pose_shortcut=True, pred_wlh=True,
                    shape_blocks=1, texture_blocks=1)
    img = jnp.ones((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), img, True, method=SUPNeRF.encode_img)
    (sc, tc, pc, uv, wlh), _ = model.apply(
        variables, img, True, method=SUPNeRF.encode_img, mutable=["batch_stats"]
    )
    assert wlh.shape == (1, 3)


def test_decoder_code_broadcast_consistency():
    """Per-object latent precompute must equal the reference's per-point
    broadcast semantics: evaluating B objects batched == per-object loop."""
    model = CodeNeRF(shape_blocks=2, texture_blocks=1, W=64, latent_dim=64)
    key = jax.random.PRNGKey(0)
    xyz = jax.random.normal(key, (3, 5, 4, 3))
    vd = jax.random.normal(key, (3, 5, 4, 3))
    codes = jax.random.normal(key, (3, 64))
    variables = model.init(key, xyz[0], vd[0], codes[0], codes[0])
    sig_b, rgb_b = jax.vmap(
        lambda x, v, s, t: model.apply(variables, x, v, s, t)
    )(xyz, vd, codes, codes)
    for i in range(3):
        sig_i, rgb_i = model.apply(variables, xyz[i], vd[i], codes[i], codes[i])
        np.testing.assert_allclose(np.asarray(sig_b[i]), np.asarray(sig_i), atol=1e-6)
        np.testing.assert_allclose(np.asarray(rgb_b[i]), np.asarray(rgb_i), atol=1e-6)


def test_autorf_models():
    img = jnp.ones((1, 32, 32, 3))
    for cls in (AutoRF, AutoRFMix):
        model = cls(latent_dim=32, shape_blocks=3, texture_blocks=3)
        variables = model.init(jax.random.PRNGKey(0), img, True, method=cls.encode_img)
        (sc, tc), _ = model.apply(variables, img, True, method=cls.encode_img,
                                  mutable=["batch_stats"])
        assert sc.shape == (1, 32) and tc.shape == (1, 32)
        vf = model.init(jax.random.PRNGKey(1), jnp.zeros((4, 2, 3)), jnp.zeros((4, 2, 3)),
                        jnp.zeros(32), jnp.zeros(32))
        sig, rgb = model.apply(vf, jnp.ones((4, 2, 3)), jnp.ones((4, 2, 3)),
                               jnp.zeros(32), jnp.zeros(32))
        assert sig.shape == (4, 2, 1) and rgb.shape == (4, 2, 3)
        if cls is AutoRF:
            r = np.asarray(rgb)
            assert (r >= 0).all() and (r <= 1).all()  # sigmoid rgb


def test_factory():
    hp = {"shape_blocks": 3, "texture_blocks": 1, "latent_dim": 256,
          "pose_shortcut": 1, "pred_wlh": 0}
    assert isinstance(build_model("supnerf", hp), SUPNeRF)
    assert isinstance(build_model("autorf", hp), AutoRFMix)
    assert isinstance(build_model("codenerf", hp), CodeNeRF)
