"""Shared CLI plumbing: argument surfaces, model/checkpoint loading, dataset
construction (reference flag surface: survey §2.17 —
/root/reference/train_nuscenes.py:14-41, optimize_nuscenes.py:14-56)."""
from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from supnerf_tpu.config import find_config, load_hpams
from supnerf_tpu.models import build_model, init_model_variables


def str2bool(v):
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "1"):
        return True
    if v.lower() in ("no", "false", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def add_common_args(p: argparse.ArgumentParser):
    p.add_argument("--config_file", type=str, default="supnerf.nusc.vehicle.car.json")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--devices", type=int, default=None,
                   help="number of devices for the data-parallel mesh")
    p.add_argument("--gpu", type=int, default=None,
                   help="compat: the reference CLIs' GPU index "
                        "(optimize_nuscenes.py --gpu). Accepted and ignored "
                        "— device selection is JAX's (see --devices)")
    p.add_argument("--coordinator", type=str, default=None,
                   help="multi-host coordinator address (host:port) for DCN "
                        "runs; also honored from JAX_COORDINATOR_ADDRESS")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler device trace into this dir")
    return p


def maybe_profile(args):
    """Context manager: jax profiler trace when --profile_dir is set."""
    import contextlib

    if getattr(args, "profile_dir", None):
        from supnerf_tpu.utils.profiling import trace

        return trace(args.profile_dir)
    return contextlib.nullcontext()


def maybe_multihost(args):
    from supnerf_tpu.parallel.mesh import maybe_init_distributed

    return maybe_init_distributed(getattr(args, "coordinator", None))


def add_optimize_args(p: argparse.ArgumentParser):
    p.add_argument("--model_epoch", type=int, default=None)
    p.add_argument("--init_rot_err", type=float, default=None,
                   help="initial rotation error in radians (add_pose_err=1); "
                        "default 0.0 (nuScenes) / 0.4 (KITTI, Waymo wrappers)")
    p.add_argument("--init_trans_err", type=float, default=None,
                   help="initial translation error ratio (add_pose_err=1); "
                        "default 0.2 (nuScenes) / 0.01 (KITTI, Waymo wrappers)")
    p.add_argument("--rand_angle_lim", type=float, default=0.0,
                   help="pitch/roll limit for random init (0 at test; pi/9 train)")
    p.add_argument("--seg_source", type=str, default="instance")
    p.add_argument("--num_workers", type=int, default=0)
    p.add_argument("--nusc-version", dest="nusc_version", type=str, default=None)
    p.add_argument("--add_pose_err", type=int, default=2, choices=[0, 1, 2, 3])
    p.add_argument("--reg_iters", type=int, default=3)
    p.add_argument("--opt_pose", type=int, default=1, choices=[0, 1, 2])
    p.add_argument("--vis", type=int, default=0, choices=[0, 1, 2])
    p.add_argument("--pred_wlh", type=int, default=0, choices=[0, 1, 2])
    p.add_argument("--pred_box2d", type=int, default=0)
    p.add_argument("--num_subset", type=int, default=1,
                   help="legacy manual sharding: total subsets")
    p.add_argument("--id_subset", type=int, default=0,
                   help="legacy manual sharding: this process's subset id")
    p.add_argument("--opt_multiview", type=str2bool, default=False)
    p.add_argument("--code_level", type=int, default=None, choices=[0, 1, 2],
                   help="optimized-code storage granularity: 0 per instance, "
                        "1 per annotation, 2 per (annotation, camera). "
                        "Default: 2, or 0 for --opt_multiview (the reference "
                        "dispatch, optimize_nuscenes.py:90-94)")
    p.add_argument("--cross_eval_folder", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=16,
                   help="objects optimized per device batch")
    p.add_argument("--save_postfix", type=str, default="")
    p.add_argument("--save_freq", type=int, default=100)
    p.add_argument("--dataset", type=str, default=None,
                   help="override dataset: nusc | kitti | waymo | synthetic")
    p.add_argument("--num-samples2eval", dest="num_samples2eval", type=int,
                   default=None,
                   help="evaluate only the first N objects for a quicker "
                        "test (reference optimize_kitti.py:44, applied as an "
                        "early break in optimizer_kitti.py:617-624)")
    p.add_argument("--num_objects", type=int, default=32,
                   help="synthetic dataset size")
    p.add_argument("--field_impl", type=str, default="auto",
                   choices=["auto", "flax", "pallas"],
                   help="NeRF field on the TTO hot loop: the fused fwd+bwd "
                        "Pallas kernels (pallas) or XLA autodiff (flax); "
                        "auto = pallas on accelerators with a "
                        "kernel-compatible decoder, flax otherwise")
    return p


def load_model_and_codes(hpams: dict, model_epoch=None, seed: int = 0):
    """Build the model and restore (variables, mean codes) from the training
    checkpoint in hpams['model_dir'] (reference load_model
    optimizer_nuscenes.py:1789-1808). Falls back to fresh initialization when
    no checkpoint exists (e.g. synthetic smoke runs)."""
    model = build_model(hpams["arch"], hpams["net_hyperparams"])
    latent = hpams["net_hyperparams"].get("latent_dim", 256)
    model_dir = hpams.get("model_dir", "")
    if model_dir and os.path.exists(os.path.join(model_dir, "latest.json")):
        from supnerf_tpu.training.checkpoints import (
            mean_codes_from_state, restore_checkpoint,
        )
        from supnerf_tpu.training.train_step import TrainConfig, init_train_state

        # instance count from the stored instoken map (before the single init)
        import json as _json

        with open(os.path.join(model_dir, "instoken2idx.json")) as f:
            n_ins = max(len(_json.load(f)), 1)
        state0 = init_train_state(model, jax.random.PRNGKey(seed), n_instances=n_ins,
                                  cfg=TrainConfig(latent_dim=latent),
                                  img_size=hpams.get("in_img_sz", 128))
        state, _, _ = restore_checkpoint(model_dir, jax.tree.map(np.asarray, state0),
                                         model_epoch)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        mean_shape, mean_texture = mean_codes_from_state(state)
    elif model_dir and (
        os.path.exists(os.path.join(model_dir, "models.pth"))
        or (model_epoch is not None
            and os.path.exists(os.path.join(model_dir, f"epoch_{model_epoch}.pth")))
    ):
        # reference-framework checkpoint layout: load the torch weights
        from supnerf_tpu.models.torch_import import load_reference_checkpoint

        name = f"epoch_{model_epoch}.pth"
        if model_epoch is None or not os.path.exists(os.path.join(model_dir, name)):
            name = "models.pth"
        variables, mean_shape, mean_texture = load_reference_checkpoint(
            model, os.path.join(model_dir, name))
        print(f"loaded reference torch checkpoint {name} from {model_dir}")
    else:
        variables = init_model_variables(model, jax.random.PRNGKey(seed),
                                         img_size=hpams.get("in_img_sz", 128))
        mean_shape = np.zeros(latent, np.float32)
        mean_texture = np.zeros(latent, np.float32)
    return model, variables, mean_shape, mean_texture


def build_dataset(hpams: dict, args, split: str = "val"):
    """Construct the dataset named in the config (or --dataset override)."""
    name = args.dataset or hpams.get("dataset", {}).get("name", "synthetic")
    if name == "synthetic":
        from supnerf_tpu.data.synthetic import make_synthetic_object

        class _Synth:
            def __init__(self, n):
                self.samples = []
                for i in range(n):
                    s = make_synthetic_object(seed=1000 + i)
                    s["instoken"] = f"ins_{i // 2}"
                    s["anntoken"] = f"ann_{i}"
                    s["cam_ids"] = "CAM_FRONT"
                    self.samples.append(s)

            def __len__(self):
                return len(self.samples)

            def __getitem__(self, i):
                return self.samples[i]

        ds = _Synth(getattr(args, "num_objects", 32))
    elif name == "nusc":
        from supnerf_tpu.data.nuscenes import NuScenesData

        seg_source = getattr(args, "seg_source", "instance")
        dir_key = "train_data_dir" if split == "train" else "test_data_dir"
        data_dir = hpams["dataset"].get(dir_key, "data/NuScenes")
        ds = NuScenesData(hpams, split=split,
                          add_pose_err=getattr(args, "add_pose_err", 0),
                          pred_box2d=bool(getattr(args, "pred_box2d", 0)),
                          nusc_version=getattr(args, "nusc_version", None),
                          rand_angle_lim=getattr(args, "rand_angle_lim", 0.0),
                          seg_dir=os.path.join(data_dir, f"pred_{seg_source}"))
    elif name == "kitti":
        from supnerf_tpu.data.kitti import KittiData

        ds = KittiData(hpams, split=split,
                       add_pose_err=getattr(args, "add_pose_err", 0))
    elif name == "waymo":
        from supnerf_tpu.data.waymo import WaymoData

        ds = WaymoData(hpams, split=split,
                       add_pose_err=getattr(args, "add_pose_err", 0))
    else:
        raise ValueError(f"Unknown dataset: {name}")

    # legacy manual sharding (--num_subset/--id_subset, optimize_nuscenes.py:51-54)
    num_subset = getattr(args, "num_subset", 1)
    if num_subset > 1:
        idx = list(range(getattr(args, "id_subset", 0), len(ds), num_subset))

        class _Subset:
            def __init__(self, base, idx):
                self.base, self.idx = base, idx

            def __len__(self):
                return len(self.idx)

            def __getitem__(self, i):
                return self.base[self.idx[i]]

        ds = _Subset(ds, idx)

    # eval-subset truncation (reference --num_samples2eval,
    # optimizer_kitti.py:617-624: stop after the first N objects)
    n_eval = getattr(args, "num_samples2eval", None)
    if n_eval is not None and split != "train":

        class _Head:
            def __init__(self, base, n):
                self.base, self.n = base, min(n, len(base))

            def __len__(self):
                return self.n

            def __getitem__(self, i):
                if i >= self.n:
                    raise IndexError(i)
                return self.base[i]

        ds = _Head(ds, n_eval)
    return ds


def resolve_hpams(args) -> dict:
    return load_hpams(find_config(args.config_file))
