"""End-to-end: on-disk KITTI-format files -> dataset -> optimize CLI ->
saved results + eval curves. The full product path on real files."""
import json
import os
import sys

import numpy as np
import pytest


def test_optimize_cli_on_kitti_fixture(tmp_path, monkeypatch):
    from tests.test_data_kitti import make_kitti_fixture

    make_kitti_fixture(str(tmp_path / "kitti"))
    cfg = {
        "arch": "supnerf",
        "net_hyperparams": {"shape_blocks": 1, "texture_blocks": 1,
                            "latent_dim": 32, "pose_shortcut": 1, "pred_wlh": 0},
        "dataset": {"name": "kitti", "kitti_cat": "Car", "seg_cat": "car",
                    "data_dir": str(tmp_path / "kitti"),
                    "split_dir": str(tmp_path / "kitti" / "ImageSets"),
                    "box_iou_th": 0.5, "max_dist": 40, "min_depth": 3,
                    "min_lidar_cnt": 10, "mask_pixels": 500, "divisor": 1000},
        "n_samples": 8, "render_im_sz": 8, "in_img_sz": 32, "roi_margin": 5,
        "loss_occ_coef": 0.1, "shapenet_obj_cood": 1, "sym_aug": 0,
        "optimize": {"num_opts": 5, "lr_shape": 0.02, "lr_texture": 0.02,
                     "lr_pose": 0.01, "lr_half_interval": 1000},
        "model_dir": str(tmp_path / "ckpt"),
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    monkeypatch.chdir(tmp_path)

    from supnerf_tpu.cli.optimize import main

    main(["--config_file", str(cfg_path), "--batch_size", "2", "--reg_iters", "1",
          "--add_pose_err", "2"])

    # the results folder carries the protocol-descriptive postfix the
    # reference constructs (optimize_kitti.py:71-88)
    save_dir = tmp_path / "ckpt" / "test_kitti_opt_pose_1_poss_err_full_reg_iters_1"
    assert (save_dir / "codes+poses.pkl").exists()
    assert (save_dir / "eval.pdf").exists()

    import pickle

    with open(save_dir / "codes+poses.pkl", "rb") as f:
        saved = pickle.load(f)
    assert len(saved["psnr_eval"]) == 2  # two valid objects in the fixture
    for curve in saved["psnr_eval"].values():
        assert len(curve) == 5 and np.isfinite(curve).all()
    # poses were converted to the nuScenes frame and optimized
    pose = list(saved["optimized_poses"].values())[0]["CAM2"][-1]
    assert np.isfinite(pose).all()

    # reference folder-convention re-scoring (scripts/eval_saved_result.py)
    from supnerf_tpu.cli.eval_saved_result import main as eval_main

    eval_main(["--model-folder", str(tmp_path / "ckpt"),
               "--test-folder", save_dir.name,
               "--legend-name", "SUPNeRF-KITTI-fixture",
               "--save-dir", str(tmp_path / "eval_summary"),
               "--max_iter", "5"])
    assert (tmp_path / "eval_summary" / "SUPNeRF-KITTI-fixture.pdf").exists()


def test_num_samples2eval_subset(tmp_path, monkeypatch):
    """--num-samples2eval N evaluates only the first N objects (reference
    optimize_kitti.py:44 / optimizer_kitti.py:617-624 early break)."""
    import pickle

    from tests.test_data_kitti import make_kitti_fixture

    make_kitti_fixture(str(tmp_path / "kitti"))
    cfg = {
        "arch": "supnerf",
        "net_hyperparams": {"shape_blocks": 1, "texture_blocks": 1,
                            "latent_dim": 32, "pose_shortcut": 1, "pred_wlh": 0},
        "dataset": {"name": "kitti", "kitti_cat": "Car", "seg_cat": "car",
                    "data_dir": str(tmp_path / "kitti"),
                    "split_dir": str(tmp_path / "kitti" / "ImageSets"),
                    "box_iou_th": 0.5, "max_dist": 40, "min_depth": 3,
                    "min_lidar_cnt": 10, "mask_pixels": 500, "divisor": 1000},
        "n_samples": 8, "render_im_sz": 8, "in_img_sz": 32, "roi_margin": 5,
        "loss_occ_coef": 0.1, "shapenet_obj_cood": 1, "sym_aug": 0,
        "optimize": {"num_opts": 3, "lr_shape": 0.02, "lr_texture": 0.02,
                     "lr_pose": 0.01, "lr_half_interval": 1000},
        "model_dir": str(tmp_path / "ckpt"),
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    monkeypatch.chdir(tmp_path)

    from supnerf_tpu.cli.optimize import main

    main(["--config_file", str(cfg_path), "--batch_size", "1",
          "--reg_iters", "1", "--add_pose_err", "2",
          "--num-samples2eval", "1"])

    save_dir = tmp_path / "ckpt" / "test_kitti_opt_pose_1_poss_err_full_reg_iters_1"
    with open(save_dir / "codes+poses.pkl", "rb") as f:
        saved = pickle.load(f)
    assert len(saved["psnr_eval"]) == 1  # fixture has 2 valid objects
