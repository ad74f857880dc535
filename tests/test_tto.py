import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from supnerf_tpu.data.synthetic import make_object_batch
from supnerf_tpu.geometry import poses as pose_gen
from supnerf_tpu.models import build_model, init_model_variables
from supnerf_tpu.tto import ObjectBatch, TTOConfig, run_tto_batch
from supnerf_tpu.tto.refiner import compose_pose_delta, fw_pose_refine

TINY_HP = {"shape_blocks": 1, "texture_blocks": 1, "latent_dim": 32,
           "pose_shortcut": 1, "pred_wlh": 0}
TINY_CFG = TTOConfig(num_opts=8, reg_iters=2, n_samples=8, render_im_sz=8,
                     in_img_sz=32, n_lidar=16, shapenet_obj_cood=True)


def _tiny_setup(n_objects=2):
    model = build_model("supnerf", TINY_HP)
    variables = init_model_variables(model, jax.random.PRNGKey(0), img_size=32)
    raw, samples = make_object_batch(n_objects, seed=3, in_img_sz=32,
                                     render_im_sz=8, n_lidar=16)
    # random init pose like the reference test protocol (add_pose_err=2)
    keys = jax.random.split(jax.random.PRNGKey(7), n_objects)
    init = jax.vmap(
        lambda k, K, roi: pose_gen.get_random_pose2(k, K, roi.astype(jnp.float32))
    )(keys, jnp.asarray(raw["K"]), jnp.asarray(raw["rois" if "rois" in raw else "roi_nerf"]))
    raw["pose_init"] = np.asarray(init)
    batch = ObjectBatch(**{k: jnp.asarray(v) for k, v in raw.items()})
    return model, variables, batch


def test_compose_pose_delta_identity():
    pose = jnp.concatenate([jnp.eye(3), jnp.array([[1.0], [0.5], [10.0]])], axis=1)
    K = jnp.asarray([[800.0, 0, 640], [0, 800, 360], [0, 0, 1]])
    out = compose_pose_delta(pose, jnp.zeros(6), jnp.asarray(100.0), K, jnp.linalg.inv(K))
    np.testing.assert_allclose(np.asarray(out), np.asarray(pose), atol=1e-5)


def test_compose_pose_delta_depth_ratio():
    pose = jnp.concatenate([jnp.eye(3), jnp.array([[0.0], [0.0], [10.0]])], axis=1)
    K = jnp.asarray([[800.0, 0, 640], [0, 800, 360], [0, 0, 1]])
    delta = jnp.array([0.0, 0, 0, 0, 0, 0.5])  # z ratio 1.5
    out = compose_pose_delta(pose, delta, jnp.asarray(100.0), K, jnp.linalg.inv(K))
    np.testing.assert_allclose(float(out[2, 3]), 15.0, rtol=1e-5)


def test_fw_pose_refine_trajectory_shape():
    model = build_model("supnerf", TINY_HP)
    variables = init_model_variables(model, jax.random.PRNGKey(0), img_size=32)

    def pose_update_fn(pc, uv):
        return model.apply(variables, pc[None], uv[None],
                           method=type(model).pose_update)[0]

    pose0 = jnp.concatenate([jnp.eye(3), jnp.array([[0.0], [0.0], [20.0]])], axis=1)
    K = jnp.asarray([[800.0, 0, 640], [0, 800, 360], [0, 0, 1]])
    traj = fw_pose_refine(pose_update_fn, jnp.ones(32), pose0, jnp.asarray([2.0, 4.0, 1.5]),
                          jnp.asarray([500.0, 200.0, 700.0, 400.0]), K, jnp.linalg.inv(K), 3)
    assert traj.shape == (4, 3, 4)
    np.testing.assert_allclose(np.asarray(traj[0]), np.asarray(pose0), atol=1e-6)
    # refiner actually moves the pose
    assert not np.allclose(np.asarray(traj[1]), np.asarray(traj[0]))


def test_run_tto_batch_end_to_end():
    model, variables, batch = _tiny_setup(2)
    res = run_tto_batch(model, variables, batch, jnp.zeros(32), jnp.zeros(32),
                        TINY_CFG, jax.random.PRNGKey(0))
    B, T = 2, TINY_CFG.num_opts
    assert res["psnr"].shape == (B, T)
    assert res["rot_err"].shape == (B, T)
    assert res["poses_saved"].shape == (B, 6, 3, 4)
    assert res["shapecodes_saved"].shape == (B, 6, 32)
    assert np.isfinite(np.asarray(res["loss"])).all()
    # optimization reduces the combined loss on average after the replay phase
    loss = np.asarray(res["loss"])
    assert loss[:, -1].mean() < loss[:, TINY_CFG.reg_iters].mean() + 1e-6


def test_replay_semantics():
    """Iterations 0..reg_iters must render the refiner trajectory poses and not
    update codes: snapshot at iter 0 equals the initial codes."""
    model, variables, batch = _tiny_setup(1)
    res = run_tto_batch(model, variables, batch, jnp.zeros(32), jnp.zeros(32),
                        TINY_CFG, jax.random.PRNGKey(0))
    traj = np.asarray(res["pose_traj"])[0]
    # per-iter emitted pose for iters 0..reg_iters equals replayed trajectory
    # (CODE_SAVE_ITERS[0] == 0 so poses_saved[0] is the iter-0 pose == traj[0])
    np.testing.assert_allclose(np.asarray(res["poses_saved"])[0, 0], traj[0], atol=1e-5)
    # rot/trans errors at iters 0..reg_iters match the trajectory errors
    from supnerf_tpu.geometry.poses import calc_pose_err
    eR, eT = calc_pose_err(jnp.asarray(traj), jnp.asarray(batch.obj_pose_gt[0])[None])
    np.testing.assert_allclose(np.asarray(res["rot_err"])[0, :3], np.asarray(eR)[:3], atol=1e-4)


def test_codes_only_mode_keeps_pose_fixed():
    model, variables, batch = _tiny_setup(1)
    cfg = dataclasses.replace(TINY_CFG, opt_pose=False)
    res = run_tto_batch(model, variables, batch, jnp.zeros(32), jnp.zeros(32),
                        cfg, jax.random.PRNGKey(0))
    # pose after optimization equals the refined pose (no pose updates)
    np.testing.assert_allclose(
        np.asarray(res["final_pose"]), np.asarray(res["pose_traj"])[:, -1], atol=1e-5
    )
    # but codes did change
    assert not np.allclose(np.asarray(res["shapecodes_saved"])[0, 0],
                           np.asarray(res["final_shapecode"])[0])


def test_aabb_render_mode():
    """The reference demo's rend_aabb path: AABB-bounded sampling in the TTO loop."""
    model, variables, batch = _tiny_setup(1)
    cfg = dataclasses.replace(TINY_CFG, use_aabb_render=True, adjust_scale=0.5)
    res = run_tto_batch(model, variables, batch, jnp.zeros(32), jnp.zeros(32),
                        cfg, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(res["loss"])).all()
    assert np.isfinite(np.asarray(res["psnr"])).all()


def test_train_test_refiner_composition_parity():
    """The training pose_regress_step and the test-time fw_pose_one_step must
    apply EXACTLY the same delta composition, or train/test behavior diverges."""
    from supnerf_tpu.training.train_step import pose_regress_step
    from supnerf_tpu.tto.refiner import fw_pose_one_step

    model = build_model("supnerf", TINY_HP)
    variables = init_model_variables(model, jax.random.PRNGKey(0), img_size=32)
    K = jnp.asarray([[800.0, 0, 640], [0, 800, 360], [0, 0, 1]])
    roi = jnp.asarray([500.0, 200.0, 700.0, 400.0])
    wlh = jnp.asarray([1.9, 4.6, 1.7])
    pose0 = pose_gen.get_random_pose2(jax.random.PRNGKey(3), K, roi)
    pc = jax.random.normal(jax.random.PRNGKey(5), (32,)) * 0.3

    def pose_update_fn(pcode, uv16):
        return model.apply(variables, pcode[None], uv16[None],
                           method=type(model).pose_update)[0]

    pose_tto = fw_pose_one_step(pose_update_fn, pc, pose0, wlh, roi, K,
                                jnp.linalg.inv(K))
    _, pose_train = pose_regress_step(model, variables, pc[None], pose0[None],
                                      jnp.zeros((1, 2, 8)), wlh[None],
                                      roi[None], K[None])
    np.testing.assert_allclose(np.asarray(pose_tto), np.asarray(pose_train[0]),
                               atol=1e-5)


def test_field_impl_pallas_matches_flax():
    """The fused fwd+bwd Pallas field on the TTO hot loop must reproduce the
    flax/XLA path: same losses, metrics, and final codes/poses (f32 interpret
    mode on CPU; on-TPU parity is covered by bench/VALIDATION runs)."""
    model, variables, batch = _tiny_setup(2)
    cfg_p = dataclasses.replace(TINY_CFG, field_impl="pallas")
    res_f = run_tto_batch(model, variables, batch, jnp.zeros(32), jnp.zeros(32),
                          TINY_CFG, jax.random.PRNGKey(0))
    res_p = run_tto_batch(model, variables, batch, jnp.zeros(32), jnp.zeros(32),
                          cfg_p, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(res_p["loss"]), np.asarray(res_f["loss"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res_p["psnr"]), np.asarray(res_f["psnr"]),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(res_p["final_pose"]),
                               np.asarray(res_f["final_pose"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(res_p["final_shapecode"]),
                               np.asarray(res_f["final_shapecode"]), atol=1e-4)


def test_euler_rot_parameterization():
    """euler_rot=True (reference hpams['euler_rot'],
    optimizer_nuscenes.py:339,361): iter-0 metrics are identical to the
    axis-angle run (same initial pose, replayed), later iterations stay
    finite and the parameterizations genuinely differ."""
    model, variables, batch = _tiny_setup()
    res_aa = run_tto_batch(model, variables, batch, jnp.zeros(32), jnp.zeros(32),
                           TINY_CFG, jax.random.PRNGKey(0))
    cfg_eu = dataclasses.replace(TINY_CFG, euler_rot=True)
    res_eu = run_tto_batch(model, variables, batch, jnp.zeros(32), jnp.zeros(32),
                           cfg_eu, jax.random.PRNGKey(0))
    # identical up through the replay iterations (pose comes from the refiner
    # trajectory, not the params) and at the first optimized render
    np.testing.assert_allclose(np.asarray(res_eu["psnr"][:, :3]),
                               np.asarray(res_aa["psnr"][:, :3]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(res_eu["rot_err"][:, 0]),
                               np.asarray(res_aa["rot_err"][:, 0]), atol=1e-4)
    for k in ("psnr", "rot_err", "trans_err", "final_pose"):
        assert np.isfinite(np.asarray(res_eu[k])).all()


def test_opt_cam_pose_parameterization():
    """opt_cam_pose=True (reference optimize['opt_cam_pose'],
    optimizer_nuscenes.py:290,366,695): the optimization variables hold the
    camera pose; reported object poses/metrics still refer to the object
    frame (identical at iter 0, finite throughout)."""
    model, variables, batch = _tiny_setup()
    res_obj = run_tto_batch(model, variables, batch, jnp.zeros(32), jnp.zeros(32),
                            TINY_CFG, jax.random.PRNGKey(0))
    cfg_cam = dataclasses.replace(TINY_CFG, opt_cam_pose=True)
    res_cam = run_tto_batch(model, variables, batch, jnp.zeros(32), jnp.zeros(32),
                            cfg_cam, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(res_cam["rot_err"][:, 0]),
                               np.asarray(res_obj["rot_err"][:, 0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(res_cam["trans_err"][:, 0]),
                               np.asarray(res_obj["trans_err"][:, 0]), atol=1e-4)
    for k in ("psnr", "rot_err", "trans_err", "final_pose"):
        assert np.isfinite(np.asarray(res_cam[k])).all()
    # snapshots report OBJECT poses in both modes: iter-0 snapshot equals the
    # refined pose regardless of the parameter frame
    np.testing.assert_allclose(np.asarray(res_cam["poses_saved"][:, 0]),
                               np.asarray(res_obj["poses_saved"][:, 0]),
                               atol=1e-4)


def test_pose_param_fns_roundtrip():
    import itertools

    from scipy.spatial.transform import Rotation

    from supnerf_tpu.tto.core import pose_param_fns

    rng = np.random.default_rng(11)
    Rm = Rotation.from_rotvec(rng.normal(size=3) * 0.6).as_matrix()
    pose = jnp.asarray(np.concatenate(
        [Rm, [[1.0], [0.5], [15.0]]], axis=1).astype(np.float32))
    for euler, cam in itertools.product([False, True], repeat=2):
        cfg = dataclasses.replace(TINY_CFG, euler_rot=euler, opt_cam_pose=cam)
        to_params, from_params = pose_param_fns(cfg)
        r, t = to_params(pose)
        back = from_params(r, t)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pose),
                                   atol=1e-5, err_msg=f"euler={euler} cam={cam}")


def test_aabb_render_mode_pallas_matches_flax():
    """The AABB TTO loop on field_impl='pallas' rides the fused per-ray-z
    render kernel (ops.pallas_render.field_composite_aabb_apply, interpret
    f32 on CPU) and must reproduce the flax path's metric curves and final
    parameters."""
    model, variables, batch = _tiny_setup(2)
    base = dataclasses.replace(TINY_CFG, use_aabb_render=True,
                               adjust_scale=0.5)
    res = {}
    for impl in ("flax", "pallas"):
        cfg = dataclasses.replace(base, field_impl=impl)
        res[impl] = jax.tree.map(np.asarray, run_tto_batch(
            model, variables, batch, jnp.zeros(32), jnp.zeros(32), cfg,
            jax.random.PRNGKey(0)))
    np.testing.assert_allclose(res["pallas"]["loss"], res["flax"]["loss"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(res["pallas"]["psnr"], res["flax"]["psnr"],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(res["pallas"]["final_shapecode"],
                               res["flax"]["final_shapecode"],
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(res["pallas"]["final_pose"],
                               res["flax"]["final_pose"],
                               rtol=1e-3, atol=1e-4)


def test_resolve_field_impl_auto():
    """'auto' (the CLI default) resolves to flax on the CPU backend, to
    pallas on accelerators with a kernel-compatible decoder, and to flax on
    accelerators when the decoder is not (AutoRF's feature-averaging
    decoder); explicit choices pass through."""
    from unittest import mock

    from supnerf_tpu.ops import pallas_field as pf

    model, variables, _ = _tiny_setup(1)
    # CPU backend (the test conftest forces it): auto -> flax
    assert pf.resolve_field_impl("auto", model, variables) == "flax"
    assert pf.resolve_field_impl("flax", model, variables) == "flax"
    assert pf.resolve_field_impl("pallas", model, variables) == "pallas"

    with mock.patch.object(jax, "default_backend", return_value="tpu"):
        assert pf.resolve_field_impl("auto", model, variables) == "pallas"
        # raw AutoRF (feature-averaging decoder, NOT the published mix
        # variant) lacks the CodeNeRF latent layers the kernels need
        from supnerf_tpu.models.autorf import AutoRF

        autorf = AutoRF(shape_blocks=2, texture_blocks=2, latent_dim=32)
        av = init_model_variables(autorf, jax.random.PRNGKey(0), img_size=32)
        assert pf.resolve_field_impl("auto", autorf, av) == "flax"
        # a PARTIAL checkpoint (has the distinguishing latent layer but is
        # missing another packed layer) must fall back to flax, not crash
        import copy

        pv = copy.deepcopy(jax.tree.map(lambda x: x, variables))
        del pv["params"]["decoder"]["rgb_out"]
        assert pf.resolve_field_impl("auto", model, pv) == "flax"
        import pytest

        with pytest.raises(ValueError):
            # explicit pallas on the partial checkpoint: clean ValueError
            # from the gate, not a KeyError mid-packing
            pf.resolve_decoder_kernel_config(model, pv)


def test_run_tto_batch_accepts_auto_field_impl():
    """cfg.field_impl='auto' resolves inside run_tto_batch (flax on this CPU
    backend) and matches an explicit flax run bit for bit."""
    model, variables, batch = _tiny_setup(1)
    outs = {}
    for impl in ("auto", "flax"):
        cfg = dataclasses.replace(TINY_CFG, field_impl=impl)
        outs[impl] = jax.tree.map(np.asarray, run_tto_batch(
            model, variables, batch, jnp.zeros(32), jnp.zeros(32), cfg,
            jax.random.PRNGKey(0)))
    np.testing.assert_array_equal(outs["auto"]["loss"], outs["flax"]["loss"])
    np.testing.assert_array_equal(outs["auto"]["final_pose"],
                                  outs["flax"]["final_pose"])
