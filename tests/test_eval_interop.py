"""Interop: re-score reference-format torch .pth result files."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from supnerf_tpu.eval.aggregate import aggregate_metrics, load_result_file


def test_load_reference_style_pth(tmp_path):
    # mimic the reference's save_opts_w_pose dict shapes: psnr lists, R/T as
    # lists of torch scalars, depth/lidar dicts (optimizer_nuscenes.py:1463-1476)
    rng = np.random.default_rng(0)
    saved = {
        "num_obj": 3,
        "psnr_eval": {f"ann{i}_CAM": rng.uniform(5, 20, 100).tolist() for i in range(3)},
        "R_eval": {f"ann{i}_CAM": [torch.tensor(v) for v in rng.uniform(0, 1, 100)]
                   for i in range(3)},
        "T_eval": {f"ann{i}_CAM": [torch.tensor(v) for v in rng.uniform(0, 2, 100)]
                   for i in range(3)},
        "depth_err_mean": {f"ann{i}_CAM": rng.uniform(0, 2, 100).tolist() for i in range(3)},
        "lidar_pts_cnt": {f"ann{i}_CAM": 50 for i in range(3)},
        "optimized_shapecodes": {"x": {"CAM": torch.zeros(6, 256)}},
    }
    path = tmp_path / "codes+poses.pth"
    torch.save(saved, str(path))

    result = load_result_file(str(path))
    assert isinstance(result["optimized_shapecodes"]["x"]["CAM"], np.ndarray)
    agg = aggregate_metrics(result, max_iter=100)
    assert agg["psnr"].shape == (100,)
    assert np.isfinite(agg["rot_err_deg"]).all()
    assert np.isfinite(agg["depth_err"]).all()


def test_write_reference_format_pth_roundtrip(tmp_path):
    """Two-way interop: TTODriver.save_results_pth writes a .pth that (a) the
    reference reader's container expectations accept (torch.stack over R_eval
    lists, np.array over psnr lists — utils.py:798-868) and (b) round-trips
    through this framework's own loader to identical aggregates."""
    import jax
    import jax.numpy as jnp

    from supnerf_tpu.models import build_model, init_model_variables
    from supnerf_tpu.tto.driver import TTODriver
    from tests.test_tto_driver import SynthDataset

    hp = {"arch": "supnerf",
          "net_hyperparams": {"shape_blocks": 1, "texture_blocks": 1,
                              "latent_dim": 32, "pose_shortcut": 1,
                              "pred_wlh": 0},
          "n_samples": 8, "render_im_sz": 8, "in_img_sz": 32, "roi_margin": 5,
          "loss_occ_coef": 0.1, "shapenet_obj_cood": 1, "sym_aug": 0,
          "optimize": {"num_opts": 4, "lr_shape": 0.02, "lr_texture": 0.02,
                       "lr_pose": 0.01, "lr_half_interval": 1000}}
    model = build_model("supnerf", hp["net_hyperparams"])
    variables = init_model_variables(model, jax.random.PRNGKey(0), img_size=32)
    ds = SynthDataset(2)
    drv = TTODriver(model, variables, jnp.zeros(32), jnp.zeros(32), hp, ds,
                    str(tmp_path), batch_size=2, reg_iters=1, add_pose_err=2)
    drv.run()

    assert (tmp_path / "codes+poses.pth").exists()
    saved = torch.load(str(tmp_path / "codes+poses.pth"), map_location="cpu",
                       weights_only=False)
    # reference reader's exact access patterns (collect_eval_results)
    for key, R_err in saved["R_eval"].items():
        stacked = torch.stack(R_err).numpy()
        assert stacked.shape == (4,)
    for psnr in saved["psnr_eval"].values():
        assert np.asarray(psnr).shape == (4,)
    ann = next(iter(saved["optimized_shapecodes"]))
    cam = next(iter(saved["optimized_shapecodes"][ann]))
    assert isinstance(saved["optimized_shapecodes"][ann][cam], torch.Tensor)
    assert saved["optimized_poses"][ann][cam].shape[-2:] == (3, 4)

    # round-trip: both files aggregate identically through our own loader
    agg_pkl = aggregate_metrics(load_result_file(str(tmp_path / "codes+poses.pkl")),
                                max_iter=4)
    agg_pth = aggregate_metrics(load_result_file(str(tmp_path / "codes+poses.pth")),
                                max_iter=4)
    np.testing.assert_allclose(agg_pth["psnr"], agg_pkl["psnr"], atol=1e-5)
    np.testing.assert_allclose(agg_pth["rot_err_deg"], agg_pkl["rot_err_deg"],
                               atol=1e-4)
    np.testing.assert_allclose(agg_pth["depth_err"], agg_pkl["depth_err"],
                               atol=1e-5)


def test_code_level_storage_roundtrip(tmp_path):
    """code_level 0/1/2 result-storage granularity (reference
    optimizer_nuscenes.py:86-112): the saved .pth structures match the
    reference's per-level schema — 0: {instoken: (n_code, latent)} flat,
    1: {anntoken: codes} flat, 2: {anntoken: {cam: codes}} — and every level
    aggregates identically through eval/aggregate (metric curves are
    level-independent). One device TTO run is shared across levels; only the
    host-side storage/serialization differs."""
    from supnerf_tpu.eval.aggregate import load_result_file
    from tests.test_tto_driver import SynthDataset, _driver

    ds = SynthDataset(2, views_per_ins=2)   # 2 anns, ONE instance
    drv = _driver(tmp_path, ds)
    idxs = [0, 1]
    prepped, samples = drv._prep_batch(idxs)
    res_dev = drv._dispatch_batch(idxs, prepped)

    aggs = {}
    for level in (0, 1, 2):
        drv.code_level = level
        drv.optimized_shapecodes = {}
        drv.optimized_texturecodes = {}
        drv.optimized_poses = {}
        drv._postprocess_batch(idxs, samples, prepped, res_dev)
        drv.save_results(name=f"codes+poses_l{level}.pkl")
        drv.save_results_pth(name=f"codes+poses_l{level}.pth")

        saved = torch.load(str(tmp_path / f"codes+poses_l{level}.pth"),
                           map_location="cpu", weights_only=False)
        sc = saved["optimized_shapecodes"]
        if level == 0:
            # both anns belong to ins_0 -> ONE flat per-instance entry
            assert set(sc) == {"ins_0"}
            assert isinstance(sc["ins_0"], torch.Tensor) and sc["ins_0"].ndim == 2
        elif level == 1:
            assert set(sc) == {"ann_0", "ann_1"}
            assert isinstance(sc["ann_0"], torch.Tensor) and sc["ann_0"].ndim == 2
        else:
            assert set(sc) == {"ann_0", "ann_1"}
            assert isinstance(sc["ann_0"], dict)
            assert isinstance(sc["ann_0"]["CAM_FRONT"], torch.Tensor)
        # poses stay {ann: {cam: (n_code, 3, 4)}} at every level (reference
        # initializes them before its code_level branch, :80-84)
        poses = saved["optimized_poses"]
        assert isinstance(poses["ann_0"], dict)
        assert poses["ann_0"]["CAM_FRONT"].shape[-2:] == (3, 4)

        agg = aggregate_metrics(load_result_file(
            str(tmp_path / f"codes+poses_l{level}.pth")), max_iter=4)
        aggs[level] = agg["psnr"]
        pkl = load_result_file(str(tmp_path / f"codes+poses_l{level}.pkl"))
        assert pkl["code_level"] == level

    np.testing.assert_allclose(aggs[0], aggs[1], atol=1e-6)
    np.testing.assert_allclose(aggs[0], aggs[2], atol=1e-6)
