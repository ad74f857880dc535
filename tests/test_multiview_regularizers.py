import numpy as np
import jax
import jax.numpy as jnp

from supnerf_tpu.data.synthetic import make_object_batch
from supnerf_tpu.models import build_model, init_model_variables
from supnerf_tpu.tto.core import ObjectBatch, TTOConfig, run_tto_batch
from supnerf_tpu.tto.multiview import MultiviewBatch, run_multiview_tto
from supnerf_tpu.tto.regularizers import obj_sz_loss, obj_sz_reg_samples, sym_loss

TINY_NET = {"shape_blocks": 1, "texture_blocks": 1, "latent_dim": 32,
            "pose_shortcut": 1, "pred_wlh": 0}
TINY_CFG = TTOConfig(num_opts=6, reg_iters=1, n_samples=8, render_im_sz=8,
                     in_img_sz=32, n_lidar=16)


def test_obj_sz_reg_samples_on_planes():
    out, inn = obj_sz_reg_samples(jax.random.PRNGKey(0), jnp.asarray([2.0, 4.0, 1.5]),
                                  5.0, shapenet_obj_cood=False, tau=0.05,
                                  samples_per_plane=20)
    assert out.shape == (3, 40, 3) and inn.shape == (3, 40, 3)
    lim = np.array([2.0, 4.0, 1.5]) / 5.0
    # axis-0 planes sit at ±(lim_x + tau) outside, ±(lim_x - tau) inside
    xs_out = np.abs(np.asarray(out)[0, :, 0])
    np.testing.assert_allclose(xs_out, lim[0] + 0.05, atol=1e-6)
    xs_in = np.abs(np.asarray(inn)[0, :, 0])
    np.testing.assert_allclose(xs_in, lim[0] - 0.05, atol=1e-6)


def test_obj_sz_and_sym_losses_values():
    # empty field: outside term 0, inside term -> (0-1)^2 per axis
    def empty_field(xyz, vd):
        return jnp.zeros(xyz.shape[:-1] + (1,)), jnp.zeros(xyz.shape[:-1] + (3,))

    l = float(obj_sz_loss(empty_field, jax.random.PRNGKey(0),
                          jnp.asarray([2.0, 4.0, 1.5]), 5.0, False))
    np.testing.assert_allclose(l, 3 / 6, atol=1e-6)

    # symmetric field -> zero sym loss; antisymmetric -> positive
    def symf(xyz, vd):
        return jnp.abs(xyz[..., 1:2]), jnp.zeros(xyz.shape[:-1] + (3,))

    xyz = jax.random.normal(jax.random.PRNGKey(1), (10, 4, 3))
    vd = jnp.ones_like(xyz)
    sig, _ = symf(xyz, vd)
    assert float(sym_loss(symf, xyz, vd, sig, shapenet_obj_cood=False)) < 1e-10

    def asymf(xyz, vd):
        return xyz[..., 1:2], jnp.zeros(xyz.shape[:-1] + (3,))

    sig2, _ = asymf(xyz, vd)
    assert float(sym_loss(asymf, xyz, vd, sig2, shapenet_obj_cood=False)) > 0.1


def test_tto_with_regularizers_runs():
    model = build_model("supnerf", TINY_NET)
    variables = init_model_variables(model, jax.random.PRNGKey(0), img_size=32)
    raw, _ = make_object_batch(1, seed=5, in_img_sz=32, render_im_sz=8, n_lidar=16)
    batch = ObjectBatch(**{k: jnp.asarray(v) for k, v in raw.items()})
    cfg = TTOConfig(**{**TINY_CFG.__dict__, "obj_sz_reg": True,
                       "sym_loss_coef": 1.0})
    res = run_tto_batch(model, variables, batch, jnp.zeros(32), jnp.zeros(32),
                        cfg, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(res["loss"])).all()


def test_multiview_shared_codes():
    model = build_model("supnerf", TINY_NET)
    variables = init_model_variables(model, jax.random.PRNGKey(0), img_size=32)
    raw, _ = make_object_batch(3, seed=9, in_img_sz=32, render_im_sz=8, n_lidar=16)
    mv = MultiviewBatch(
        img_in=jnp.asarray(raw["img_in"]),
        rgb_tgt=jnp.asarray(raw["rgb_tgt"]),
        occ_tgt=jnp.asarray(raw["occ_tgt"]),
        K=jnp.asarray(raw["K"]),
        roi_nerf=jnp.asarray(raw["roi_nerf"]),
        pose_init=jnp.asarray(raw["pose_init"]),
        wlh=jnp.asarray(raw["wlh"]),
        obj_pose_gt=jnp.asarray(raw["obj_pose_gt"]),
        view_valid=jnp.asarray([1.0, 1.0, 0.0]),  # third view is padding
    )
    res = run_multiview_tto(model, variables, mv, jnp.zeros(32), jnp.zeros(32),
                            TINY_CFG, jax.random.PRNGKey(0), opt_pose=False)
    assert res["shapecodes_saved"].shape == (6, 32)
    assert res["final_poses"].shape == (3, 3, 4)
    assert np.isfinite(np.asarray(res["loss"])).all()
    # codes moved from the initial mean
    assert not np.allclose(np.asarray(res["shapecodes_saved"])[0],
                           np.asarray(res["final_shapecode"]))
    # poses fixed in codes-only mode
    np.testing.assert_allclose(np.asarray(res["final_poses"]),
                               np.asarray(raw["pose_init"]), atol=1e-5)
