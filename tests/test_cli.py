"""CLI argument-surface and config-system tests (fast, no device work)."""
import json
import os

import pytest

from supnerf_tpu.config import DEFAULT_HPAMS, find_config, load_hpams


def test_load_reference_format_config(tmp_path):
    cfg = {"arch": "supnerf", "n_rays": 512,
           "net_hyperparams": {"latent_dim": 128},
           "optimize": {"num_opts": 50}}
    p = tmp_path / "c.json"
    p.write_text(json.dumps(cfg))
    hp = load_hpams(str(p))
    assert hp["n_rays"] == 512
    assert hp["net_hyperparams"]["latent_dim"] == 128
    # nested dicts merge with defaults
    assert hp["net_hyperparams"]["num_xyz_freq"] == 10
    assert hp["optimize"]["num_opts"] == 50
    assert hp["optimize"]["lr_shape"] == 0.02


def test_find_config_resolves_jsonfiles():
    p = find_config("supnerf.nusc.vehicle.car.json")
    assert os.path.exists(p)
    hp = load_hpams(p)
    assert hp["arch"] == "supnerf"
    assert hp["net_hyperparams"]["shape_blocks"] == 3
    assert hp["n_rays"] == 1024 and hp["n_samples"] == 64
    with pytest.raises(FileNotFoundError):
        find_config("nope.json")


def test_all_shipped_configs_load():
    import glob

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = glob.glob(os.path.join(here, "jsonfiles", "*.json"))
    assert len(files) == 7
    for f in files:
        hp = load_hpams(f)
        assert hp["arch"] in ("supnerf", "autorfmix")
        from supnerf_tpu.models import build_model

        # configs must load through build_model EXACTLY as shipped
        model = build_model(hp["arch"], hp["net_hyperparams"])
        assert model is not None


def test_optimize_cli_arg_surface():
    import argparse

    from supnerf_tpu.cli.common import add_common_args, add_optimize_args

    p = argparse.ArgumentParser()
    add_common_args(p)
    add_optimize_args(p)
    args = p.parse_args([
        "--config_file", "x.json", "--add_pose_err", "2", "--reg_iters", "3",
        "--opt_pose", "2", "--vis", "1", "--pred_wlh", "2",
        "--num_subset", "4", "--id_subset", "1", "--opt_multiview", "true",
        "--cross_eval_folder", "/tmp/x", "--batch_size", "8",
    ])
    assert args.opt_pose == 2 and args.pred_wlh == 2
    assert args.opt_multiview is True
    assert args.num_subset == 4 and args.id_subset == 1


def test_train_cli_arg_surface():
    from supnerf_tpu.cli.train import main

    # --help style smoke: parse-only via a dry argv raising SystemExit on -h
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["-h"])


def test_auto_save_postfix_matches_reference_rules():
    """Folder naming mirrors the reference save_postfix construction
    (optimize_nuscenes.py:89-119)."""
    import argparse

    from supnerf_tpu.cli.optimize import _auto_save_postfix

    def mkargs(**kw):
        base = dict(opt_multiview=False, opt_pose=1, add_pose_err=2,
                    init_rot_err=None, init_trans_err=None, reg_iters=3,
                    pred_wlh=0, pred_box2d=0, nusc_version=None,
                    num_subset=1, id_subset=0)
        base.update(kw)
        return argparse.Namespace(**base)

    hp = {"arch": "supnerf", "net_hyperparams": {"pred_wlh": 0},
          "dataset": {"test_nusc_version": "v1.0-mini"}}
    assert _auto_save_postfix(mkargs(), hp, "nusc") == \
        "_nuscenes_opt_pose_1_poss_err_full_reg_iters_3"
    # trainval (resolved from the config) labels _full_val
    hp_tv = dict(hp, dataset={"test_nusc_version": "v1.0-trainval"})
    assert _auto_save_postfix(mkargs(), hp_tv, "nusc").endswith("_full_val")
    # mode-1 uses the config fallback magnitudes
    hp_err = dict(hp, init_rot_err=0.3)
    assert "_rot_err_0.3_trans_err_0.2" in _auto_save_postfix(
        mkargs(add_pose_err=1), hp_err, "nusc")
    # kitti + subset sharding + pred_box2d
    post = _auto_save_postfix(
        mkargs(add_pose_err=3, pred_box2d=1, num_subset=4, id_subset=2),
        {"arch": "autorfmix", "net_hyperparams": {}}, "kitti")
    assert post == "_kitti_opt_pose_1_poss_pred_det3d_pred_box2d_subset_2_of_4"


def test_reference_readme_commands_parse_verbatim():
    """The reference README's published commands must parse unchanged
    (drop-in compatibility): optimize with --gpu/--reg_iter (README.md:196,
    219, 241 — note the README spells --reg_iter without the s) and train
    with --gpus/--num_workers (README.md:263)."""
    import argparse

    from supnerf_tpu.cli.common import add_common_args, add_optimize_args

    p = argparse.ArgumentParser()
    add_common_args(p)
    add_optimize_args(p)
    a = p.parse_args(
        "--config_file jsonfiles/supnerf.nusc.vehicle.car.json --gpu 0 "
        "--add_pose_err 2 --reg_iter 3 --vis 0".split())
    assert a.gpu == 0 and a.reg_iters == 3 and a.add_pose_err == 2

    from supnerf_tpu.cli import train as train_cli

    # the train CLI builds its parser inside main(); intercept parse_args to
    # check the parsed namespace and stop before any training work
    argv = ("--config_file jsonfiles/supnerf.nusc.vehicle.car.json --gpus 4 "
            "--batch_size 48 --num_workers 16 --epochs 40").split()
    seen = {}
    orig = argparse.ArgumentParser.parse_args

    def spy(self, args=None, namespace=None):
        ns = orig(self, args, namespace)
        seen.update(vars(ns))
        raise SystemExit(0)  # stop main() before any work

    argparse.ArgumentParser.parse_args = spy
    try:
        try:
            train_cli.main(argv)
        except SystemExit:
            pass
    finally:
        argparse.ArgumentParser.parse_args = orig
    assert seen["gpus"] == 4 and seen["num_workers"] == 16
    assert seen["batch_size"] == 48 and seen["epochs"] == 40
