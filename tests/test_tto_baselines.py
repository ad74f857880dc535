"""TTO with the AutoRFMix / CodeNeRF baseline architectures (reference
optimize_objs_w_pose / optimize_objs paths: no feed-forward refinement)."""
import numpy as np
import jax
import jax.numpy as jnp

from supnerf_tpu.data.synthetic import make_object_batch
from supnerf_tpu.models import build_model, init_model_variables
from supnerf_tpu.tto.core import ObjectBatch, TTOConfig, run_tto_batch

CFG = TTOConfig(num_opts=6, reg_iters=2, n_samples=8, render_im_sz=8,
                in_img_sz=32, n_lidar=16)


def _batch(n=1):
    raw, _ = make_object_batch(n, seed=21, in_img_sz=32, render_im_sz=8, n_lidar=16)
    return ObjectBatch(**{k: jnp.asarray(v) for k, v in raw.items()})


def test_autorfmix_tto():
    model = build_model("autorf", {"shape_blocks": 2, "texture_blocks": 1,
                                   "latent_dim": 32})
    variables = init_model_variables(model, jax.random.PRNGKey(0), img_size=32)
    res = run_tto_batch(model, variables, _batch(), jnp.zeros(32), jnp.zeros(32),
                        CFG, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(res["loss"])).all()
    # no refiner: the trajectory replays the initial pose
    traj = np.asarray(res["pose_traj"])[0]
    np.testing.assert_allclose(traj[0], traj[-1], atol=1e-6)


def test_codenerf_tto():
    model = build_model("codenerf", {"shape_blocks": 1, "texture_blocks": 1,
                                     "latent_dim": 32})
    variables = init_model_variables(model, jax.random.PRNGKey(0), img_size=32)
    mean = jnp.ones(32) * 0.05
    res = run_tto_batch(model, variables, _batch(), mean, mean,
                        CFG, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(res["loss"])).all()
    # codes start from the mean codes (no encoder)
    np.testing.assert_allclose(np.asarray(res["shapecodes_saved"])[0, 0],
                               np.asarray(mean), atol=1e-6)


def test_baselines_tto_pallas_field_matches_flax():
    """AutoRFMix and CodeNeRF share the CodeNeRF-style 'decoder' scope, so
    the fused-kernel TTO path must work and match the flax path for them
    too (the original AutoRF feature-averaging decoder is rejected)."""
    import dataclasses
    import pytest

    cfg_p = dataclasses.replace(CFG, field_impl="pallas")
    for arch, hp in (("autorf", {"shape_blocks": 2, "texture_blocks": 1,
                                 "latent_dim": 32}),
                     ("codenerf", {"shape_blocks": 1, "texture_blocks": 1,
                                   "latent_dim": 32})):
        model = build_model(arch, hp)
        variables = init_model_variables(model, jax.random.PRNGKey(0), img_size=32)
        mean = jnp.ones(32) * 0.05
        res_f = run_tto_batch(model, variables, _batch(), mean, mean,
                              CFG, jax.random.PRNGKey(0))
        res_p = run_tto_batch(model, variables, _batch(), mean, mean,
                              cfg_p, jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(res_p["loss"]),
                                   np.asarray(res_f["loss"]),
                                   rtol=1e-4, atol=1e-5, err_msg=arch)
