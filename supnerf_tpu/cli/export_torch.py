"""Export an orbax training checkpoint to a reference-format torch .pth.

Usage:
  python -m supnerf_tpu.cli.export_torch CHECKPOINT_DIR [OUT.pth]
         [--model_epoch N]

CHECKPOINT_DIR is a training save dir produced by this framework's trainer
(contains hpam.json, instoken2idx.json, latest.json and epoch_N/ orbax
checkpoints). The output .pth has the reference's exact checkpoint schema
({'model_params', 'shape_code_params', 'texture_code_params', 'niter',
'nepoch', 'instoken2idx', 'optimized_idx'},
/root/reference/src/trainer_unified_nuscenes.py:476-490) and strict-loads
into the reference's torch models, so a user can move trained models BACK
to the reference framework (the reverse of --model_dir pointing at a
reference .pth, which load_model_and_codes already supports).
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("checkpoint_dir")
    ap.add_argument("out", nargs="?", default=None,
                    help="output .pth path (default: CHECKPOINT_DIR/models.pth)")
    ap.add_argument("--model_epoch", type=int, default=None,
                    help="epoch to export (default: latest)")
    args = ap.parse_args(argv)

    import jax
    import numpy as np

    from supnerf_tpu.models import build_model
    from supnerf_tpu.training.checkpoints import (
        export_reference_checkpoint, restore_checkpoint,
    )
    from supnerf_tpu.training.train_step import TrainConfig, init_train_state

    save_dir = os.path.abspath(args.checkpoint_dir)
    with open(os.path.join(save_dir, "hpam.json")) as f:
        hpams = json.load(f)
    with open(os.path.join(save_dir, "instoken2idx.json")) as f:
        instoken2idx = json.load(f)

    model = build_model(hpams["arch"], hpams["net_hyperparams"])
    latent = hpams["net_hyperparams"].get("latent_dim", 256)
    state0 = init_train_state(
        model, jax.random.PRNGKey(0), n_instances=max(len(instoken2idx), 1),
        cfg=TrainConfig(latent_dim=latent),
        img_size=hpams.get("in_img_sz", 128))
    state, nepoch, instoken2idx = restore_checkpoint(
        save_dir, jax.tree.map(np.asarray, state0), args.model_epoch)

    out = args.out or os.path.join(save_dir, "models.pth")
    export_reference_checkpoint(model, state, instoken2idx, out, nepoch=nepoch)
    print(f"exported epoch {nepoch} -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
