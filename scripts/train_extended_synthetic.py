"""Extended synthetic training of the PUBLISHED SUPNeRF config on the real
TPU, for the showcase checkpoint behind docs/examples and the
trained-model TTO numbers in VALIDATION.md.

Trains latent-256 / 3-1 blocks at the published batch 48 through the fused
pallas train path (the only way batch 48 fits on one v5e — VALIDATION.md),
then reports held-out TTO metrics at the 100-iteration published protocol.

Env knobs: EXT_TRAIN_OBJECTS (1024), EXT_EPOCHS (700), EXT_BATCH (48),
EXT_EVAL_OBJECTS (16), EXT_OUT (/tmp/ext_train).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

import jax.numpy as jnp

from supnerf_tpu.data.synthetic import (
    SyntheticTTODataset,
    make_heldout_tto_batch,
    published_hparams,
)
from supnerf_tpu.models import build_model
from supnerf_tpu.tto.core import ObjectBatch, TTOConfig, run_tto_batch
from supnerf_tpu.training.trainer import UnifiedTrainer

PUB_HP = published_hparams()


def main():
    n_obj = int(os.environ.get("EXT_TRAIN_OBJECTS", "1024"))
    epochs = int(os.environ.get("EXT_EPOCHS", "700"))
    batch = int(os.environ.get("EXT_BATCH", "48"))
    n_eval = int(os.environ.get("EXT_EVAL_OBJECTS", "16"))
    out_dir = os.environ.get("EXT_OUT", "/tmp/ext_train")

    model = build_model("supnerf", PUB_HP["net_hyperparams"])
    ds = SyntheticTTODataset(n_obj)
    tr = UnifiedTrainer(model, PUB_HP, ds, os.path.join(out_dir, "ckpt"),
                        batch_size=batch, check_iter=10 ** 9,
                        field_impl="pallas", save_every=100)
    resume = os.environ.get("EXT_RESUME")
    if resume:
        tr.resume_from_epoch(resume)
    t0 = time.time()
    tr.train(epochs=epochs)
    m = tr.metrics_history[-1]
    print(json.dumps({
        "steps": int(tr.state.niter), "wall_s": round(time.time() - t0, 1),
        "train_psnr": round(float(m.get("psnr", float("nan"))), 2),
        "loss_total": round(float(m["loss_total"]), 3),
        "loss_pose": round(float(m.get("loss_pose", float("nan"))), 2),
    }), flush=True)

    variables = {"params": tr.state.params,
                 "batch_stats": tr.state.batch_stats}
    mean_shape = jnp.asarray(np.asarray(tr.state.shape_codes).mean(0))
    mean_texture = jnp.asarray(np.asarray(tr.state.texture_codes).mean(0))

    raw, _ = make_heldout_tto_batch(n_eval, seed=n_obj + 1000)
    obatch = ObjectBatch(**{k: jnp.asarray(v) for k, v in raw.items()})
    cfg = TTOConfig(num_opts=100, reg_iters=3, n_samples=64, render_im_sz=32,
                    in_img_sz=128, n_lidar=256, field_impl="pallas")
    fn = jax.jit(lambda v, b, k: run_tto_batch(model, v, b, mean_shape,
                                               mean_texture, cfg, k))
    res = jax.tree.map(np.asarray, fn(variables, obatch, jax.random.PRNGKey(7)))
    print(json.dumps({"tto_heldout": {
        "psnr": [round(float(res["psnr"][:, 0].mean()), 2),
                 round(float(res["psnr"][:, -1].mean()), 2)],
        "rot_err": [round(float(res["rot_err"][:, 0].mean()), 2),
                    round(float(res["rot_err"][:, -1].mean()), 2)],
        "trans_err": [round(float(res["trans_err"][:, 0].mean()), 2),
                      round(float(res["trans_err"][:, -1].mean()), 2)],
        "depth_err": [round(float(res["depth_err"][:, 0].mean()), 2),
                      round(float(res["depth_err"][:, -1].mean()), 2)],
    }}), flush=True)


if __name__ == "__main__":
    main()
