"""Test-time optimization CLI (reference optimize_{nuscenes,kitti,waymo}.py).

Usage:
  python -m supnerf_tpu.cli.optimize --config_file supnerf.nusc.vehicle.car.json
  python -m supnerf_tpu.cli.optimize --config_file supnerf.kitti.car.json
  python -m supnerf_tpu.cli.optimize --dataset synthetic --num_objects 8   # smoke
"""
from __future__ import annotations

import argparse
import os

import matplotlib

matplotlib.use("Agg")

from supnerf_tpu.cli.common import (
    add_common_args,
    add_optimize_args,
    build_dataset,
    load_model_and_codes,
    resolve_hpams,
)


def _auto_save_postfix(args, hpams: dict, ds_name: str) -> str:
    """Protocol-descriptive results-folder postfix, matching the reference's
    save_postfix construction (optimize_nuscenes.py:89-119 /
    optimize_kitti.py:71-88): downstream evaluation scripts locate result
    folders by these names."""
    post = f"_{'nuscenes' if ds_name == 'nusc' else ds_name}"
    if args.opt_multiview:
        post += "_multiview"
    post += f"_opt_pose_{args.opt_pose}"
    if args.add_pose_err == 1:
        # same fallback chain as TTODriver (CLI flag -> config -> default),
        # so the folder name reports the errors actually injected
        rot = (args.init_rot_err if args.init_rot_err is not None
               else hpams.get("init_rot_err", 0.0))
        trans = (args.init_trans_err if args.init_trans_err is not None
                 else hpams.get("init_trans_err", 0.2))
        post += f"_rot_err_{rot}_trans_err_{trans}"
    elif args.add_pose_err == 2:
        post += "_poss_err_full"
    elif args.add_pose_err == 3:
        post += "_poss_pred_det3d"
    if hpams.get("arch") == "supnerf":
        post += f"_reg_iters_{args.reg_iters}"
    if hpams.get("net_hyperparams", {}).get("pred_wlh", 0) > 0 and args.pred_wlh:
        post += f"_pred_wlh{args.pred_wlh}"
    if args.pred_box2d:
        post += "_pred_box2d"
    if ds_name == "nusc":
        # resolve the effective version the way NuScenesData does
        # (data/nuscenes.py:95-97), so default-trainval runs are named
        # '_full_val' like the reference
        ds_cfg = hpams.get("dataset", {})
        version = getattr(args, "nusc_version", None) or ds_cfg.get(
            "test_nusc_version", ds_cfg.get("train_nusc_version", "v1.0-trainval"))
        if "trainval" in version:
            post += "_full_val"
    if args.num_subset != 1:
        post += f"_subset_{args.id_subset}_of_{args.num_subset}"
    return post


def main(argv=None):
    p = argparse.ArgumentParser("supnerf_tpu optimize")
    add_common_args(p)
    add_optimize_args(p)
    args = p.parse_args(argv)

    from supnerf_tpu.cli.common import maybe_multihost

    maybe_multihost(args)
    hpams = resolve_hpams(args)
    ds_name = args.dataset or hpams.get("dataset", {}).get("name", "synthetic")
    frame = {"kitti": "kitti", "waymo": "waymo"}.get(ds_name, "nusc")

    model, variables, mean_shape, mean_texture = load_model_and_codes(
        hpams, args.model_epoch, args.seed)
    dataset = build_dataset(hpams, args, split="val")

    save_dir = os.path.join(
        hpams.get("model_dir", "checkpoints"),
        f"test{_auto_save_postfix(args, hpams, ds_name)}{args.save_postfix}")
    if args.cross_eval_folder:
        save_dir = args.cross_eval_folder

    from supnerf_tpu.tto.driver import TTODriver

    driver = TTODriver(
        model, variables, mean_shape, mean_texture, hpams, dataset, save_dir,
        opt_pose=args.opt_pose, reg_iters=args.reg_iters, dataset_frame=frame,
        pred_wlh=args.pred_wlh, add_pose_err=args.add_pose_err,
        batch_size=args.batch_size, save_freq=args.save_freq,
        n_devices=args.devices, seed=args.seed, vis=args.vis,
        init_rot_err=args.init_rot_err, init_trans_err=args.init_trans_err,
        rand_angle_lim=args.rand_angle_lim, field_impl=args.field_impl,
        code_level=args.code_level,
    )
    if args.cross_eval_folder:
        # evaluation-only resume from a previous optimization folder
        import pickle

        with open(os.path.join(save_dir, "codes+poses.pkl"), "rb") as f:
            saved = pickle.load(f)
        driver.optimized_shapecodes = saved["optimized_shapecodes"]
        driver.optimized_texturecodes = saved["optimized_texturecodes"]
        driver.optimized_poses = saved["optimized_poses"]
    elif args.opt_multiview:
        from supnerf_tpu.cli.common import maybe_profile

        with maybe_profile(args):
            driver.run_multiview(opt_pose=args.opt_pose > 0)
        return
    else:
        from supnerf_tpu.cli.common import maybe_profile

        with maybe_profile(args):
            driver.run()
    cross = driver.eval_cross_view() if ds_name in ("nusc", "synthetic") else None

    # aggregate + plots (reference optimize_nuscenes.py:145-155)
    import matplotlib.pyplot as plt

    from supnerf_tpu.eval.aggregate import collect_eval_results

    result_file = os.path.join(save_dir, "codes+poses.pkl")
    if os.path.exists(result_file):
        fig, axes = plt.subplots(2, 2, figsize=(9, 9))
        collect_eval_results(
            result_file, max_iter=hpams["optimize"]["num_opts"], axes=axes,
            cross_eval_file=os.path.join(save_dir, "cross_eval.pkl") if cross else None,
        )
        fig.savefig(os.path.join(save_dir, "eval.pdf"))
        print(f"saved {os.path.join(save_dir, 'eval.pdf')}")


if __name__ == "__main__":
    main()
