import jax
import jax.numpy as jnp

from supnerf_tpu.models import SUPNeRF, build_model, init_model_variables, param_count


def test_init_all_entry_points_share_one_variables_dict():
    """Regression: a single init must cover encoder + pose refiner + field so
    one variables dict serves the whole TTO workflow."""
    model = build_model("supnerf", {"shape_blocks": 1, "texture_blocks": 1,
                                    "latent_dim": 32, "pose_shortcut": 1, "pred_wlh": 0})
    variables = init_model_variables(model, jax.random.PRNGKey(0), img_size=32)
    img = jnp.ones((1, 32, 32, 3))
    (sc, tc, pc, uv, _), _ = model.apply(
        variables, img, True, method=SUPNeRF.encode_img, mutable=["batch_stats"]
    )
    delta = model.apply(variables, pc, jnp.zeros((1, 16)), method=SUPNeRF.pose_update)
    assert delta.shape == (1, 6)
    sig, rgb = model.apply(variables, jnp.ones((2, 3, 3)), jnp.ones((2, 3, 3)), sc[0], tc[0])
    assert sig.shape == (2, 3, 1) and rgb.shape == (2, 3, 3)
    assert param_count(variables) > 0


def test_published_config_total_param_count():
    # shapes only — jax.eval_shape costs no compile/init on the 1-CPU CI host
    import numpy as np

    model = build_model("supnerf", {"shape_blocks": 3, "texture_blocks": 1,
                                    "latent_dim": 256, "pose_shortcut": 1, "pred_wlh": 0})
    img = jnp.zeros((1, 32, 32, 3))
    xyz = jnp.zeros((1, 1, 3))
    code = jnp.zeros((256,))

    def init_fn(mdl):
        mdl.encode_img(img, True)
        mdl.pose_update(jnp.zeros((1, 256)), jnp.zeros((1, 16)))
        return mdl(xyz, xyz, code, code)

    variables = jax.eval_shape(
        lambda k: model.init(k, method=init_fn), jax.random.PRNGKey(0))
    # encoder 47,911,504 + decoder 714,756 + refiner 400,390 (reference arch)
    total = sum(int(np.prod(p.shape))
                for p in jax.tree.leaves(variables["params"]))
    assert total == 49_026_650
