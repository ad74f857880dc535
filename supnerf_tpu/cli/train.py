"""Training CLI (reference train_nuscenes.py).

Usage:
  python -m supnerf_tpu.cli.train --config_file supnerf.nusc.vehicle.car.json \
      --batch_size 48 --epochs 40
  python -m supnerf_tpu.cli.train --dataset synthetic --epochs 1   # smoke
"""
from __future__ import annotations

import argparse
import os
from datetime import date

from supnerf_tpu.cli.common import (
    add_common_args,
    build_dataset,
    resolve_hpams,
    str2bool,
)


def main(argv=None):
    p = argparse.ArgumentParser("supnerf_tpu train")
    add_common_args(p)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--gpus", type=int, default=None,
                   help="compat: the reference's DataParallel device count "
                        "(train_nuscenes.py --gpus); used as --devices when "
                        "--devices is not given")
    p.add_argument("--num_workers", type=int, default=4,
                   help="host-side prefetch worker threads (reference "
                        "train_nuscenes.py --num_workers)")
    p.add_argument("--save_dir", type=str, default=None)
    p.add_argument("--pretrained_model_dir", type=str, default=None)
    p.add_argument("--resume_from_epoch", type=int, default=None)
    p.add_argument("--resume_dir", type=str, default=None)
    p.add_argument("--im_enc_rate", type=float, default=1.0)
    p.add_argument("--seg_source", type=str, default="instance",
                   help="nuScenes mask source: instance | panoptic "
                        "(reference train_nuscenes.py:19)")
    p.add_argument("--pred_box2d", type=int, default=0,
                   help="use predicted 2D detection boxes instead of gt "
                        "projections (reference train_nuscenes.py:31)")
    p.add_argument("--aug_box2d", type=str2bool, default=False)
    p.add_argument("--aug_wlh", type=str2bool, default=False)
    p.add_argument("--finetune_wlh", type=str2bool, default=False)
    p.add_argument("--render_sz", type=int, default=None)
    p.add_argument("--dataset", type=str, default=None)
    p.add_argument("--num_objects", type=int, default=32)
    p.add_argument("--check_iter", type=int, default=1000)
    p.add_argument("--save_every", type=int, default=1,
                   help="checkpoint every N epochs (last epoch always "
                        "saved); 1 matches the reference's per-epoch saves")
    p.add_argument("--steps_per_dispatch", type=str, default="auto",
                   help="train steps per dispatched XLA program (lax.scan "
                        "group); auto = 5 on single-core hosts where "
                        "per-step dispatch cost cannot hide under the "
                        "device step, else 1 (threaded per-step prefetch)")
    p.add_argument("--field_impl", type=str, default="auto",
                   choices=["auto", "flax", "pallas"],
                   help="NeRF branch: the fused fwd+bwd train kernels "
                        "(pallas; required to fit the published batch 48 on "
                        "one v5e chip) or XLA autodiff (flax); auto = pallas "
                        "on accelerators with a kernel-compatible decoder")
    args = p.parse_args(argv)

    from supnerf_tpu.cli.common import maybe_multihost

    maybe_multihost(args)
    if args.devices is None and args.gpus:
        args.devices = args.gpus
    hpams = resolve_hpams(args)
    if args.render_sz:
        hpams["render_sz"] = args.render_sz

    from supnerf_tpu.models import build_model
    from supnerf_tpu.training.trainer import UnifiedTrainer

    model = build_model(hpams["arch"], hpams["net_hyperparams"])
    dataset = build_dataset(hpams, args, split="train")

    save_dir = args.save_dir
    if save_dir is None:
        tag = date.today().strftime("%Y_%m_%d")
        save_dir = os.path.join("checkpoints", hpams["arch"], f"train_{tag}")

    loss_mode = "unified" if hpams["arch"] == "supnerf" else "nerf_only"
    trainer = UnifiedTrainer(
        model, hpams, dataset, save_dir, batch_size=args.batch_size,
        loss_mode=loss_mode, im_enc_rate=args.im_enc_rate,
        aug_wlh=args.aug_wlh, aug_box2d=args.aug_box2d,
        finetune_wlh=args.finetune_wlh, n_devices=args.devices,
        seed=args.seed, check_iter=args.check_iter,
        field_impl=args.field_impl, save_every=args.save_every,
        steps_per_dispatch=(args.steps_per_dispatch
                            if args.steps_per_dispatch == "auto"
                            else int(args.steps_per_dispatch)),
    )
    if args.resume_from_epoch is not None:
        trainer.resume_from_epoch(args.resume_dir or save_dir, args.resume_from_epoch)
    from supnerf_tpu.cli.common import maybe_profile

    with maybe_profile(args):
        trainer.train(args.epochs, num_workers=args.num_workers)
    print(f"training done; checkpoints in {save_dir}")


if __name__ == "__main__":
    main()
