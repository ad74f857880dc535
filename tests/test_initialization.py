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
    # shapes only — jax.eval_shape costs no compile/init on the 1-CPU CI host.
    # Goes through the PRODUCT init_fn (initialization.make_init_fn) so the
    # published count validates the real init path, not a stale copy of it.
    import numpy as np

    from supnerf_tpu.models.initialization import make_init_fn

    model = build_model("supnerf", {"shape_blocks": 3, "texture_blocks": 1,
                                    "latent_dim": 256, "pose_shortcut": 1, "pred_wlh": 0})
    init_fn = make_init_fn(model, img_size=32)
    variables = jax.eval_shape(
        lambda k: model.init(k, method=init_fn), jax.random.PRNGKey(0))
    # encoder 47,911,504 + decoder 714,756 + refiner 400,390 (reference arch)
    total = sum(int(np.prod(p.shape))
                for p in jax.tree.leaves(variables["params"]))
    assert total == 49_026_650


def test_init_under_real_jit_tiny_model():
    """conftest routes the init module's jax.jit to identity for suite speed,
    so the jitted whole-model init path (a tracer leak, a data-dependent
    Python branch, or a closed-over big-array constant in init_fn) would
    otherwise only surface on the TPU. Run ONE tiny-config init under the
    REAL jax.jit here (tiny shapes compile in seconds, and the gitignored CPU
    persistent cache makes repeats free)."""
    import jax as real_jax

    from supnerf_tpu.models import initialization as init_mod

    saved = init_mod.jax
    init_mod._init_variables_cached.cache_clear()
    init_mod.jax = real_jax
    try:
        model = build_model("supnerf", {"shape_blocks": 1, "texture_blocks": 1,
                                        "latent_dim": 16, "pose_shortcut": 1,
                                        "pred_wlh": 1})
        variables = init_model_variables(model, real_jax.random.PRNGKey(3),
                                         img_size=16)
    finally:
        init_mod.jax = saved
        init_mod._init_variables_cached.cache_clear()
    assert "params" in variables and "batch_stats" in variables
    assert param_count(variables) > 0
    # the jit-initialized variables drive every entry point
    sig, rgb = model.apply({"params": variables["params"]},
                           jnp.ones((2, 3, 3)), jnp.ones((2, 3, 3)),
                           jnp.zeros(16), jnp.zeros(16))
    assert sig.shape == (2, 3, 1) and rgb.shape == (2, 3, 3)
