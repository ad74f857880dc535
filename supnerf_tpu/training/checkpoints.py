"""Checkpoint save/restore with orbax.

Logical contents mirror the reference's .pth checkpoints
(/root/reference/src/trainer_unified_nuscenes.py: save_models :476-490,
resume_from_epoch :492-513, load_pretrained_model :449-463): model params +
batch stats, per-instance shape/texture code tables, optimizer states, niter /
nepoch counters, instoken->index map, and the optimized-instance mask.
"""
from __future__ import annotations

import json
import os

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(save_dir: str, state, nepoch: int, instoken2idx: dict,
                    keep_rolling: bool = True):
    """Write epoch_{n} checkpoint plus a rolling 'latest' (the reference's
    models.pth)."""
    save_dir = os.path.abspath(save_dir)
    os.makedirs(save_dir, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    payload = jax.tree.map(np.asarray, {
        "state": state,
        "nepoch": np.asarray(nepoch),
    })
    path = os.path.join(save_dir, f"epoch_{nepoch}")
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    ckptr.save(path, payload)
    ckptr.wait_until_finished()
    with open(os.path.join(save_dir, "instoken2idx.json"), "w") as f:
        json.dump(instoken2idx, f)
    if keep_rolling:
        with open(os.path.join(save_dir, "latest.json"), "w") as f:
            json.dump({"nepoch": int(nepoch)}, f)


def restore_checkpoint(save_dir: str, abstract_state, nepoch: int | None = None):
    """Restore (state, nepoch, instoken2idx). abstract_state is a pytree of the
    same structure (e.g. a freshly initialized TrainState)."""
    save_dir = os.path.abspath(save_dir)
    if nepoch is None:
        with open(os.path.join(save_dir, "latest.json")) as f:
            nepoch = json.load(f)["nepoch"]
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(np.asarray, {
        "state": abstract_state,
        "nepoch": np.asarray(0),
    })
    payload = ckptr.restore(os.path.join(save_dir, f"epoch_{nepoch}"), abstract)
    with open(os.path.join(save_dir, "instoken2idx.json")) as f:
        instoken2idx = json.load(f)
    return payload["state"], int(payload["nepoch"]), instoken2idx


def mean_codes_from_state(state) -> tuple:
    """Mean shape/texture codes over instances that were actually optimized
    (reference load_model :1799-1808). Falls back to all instances."""
    opt = np.asarray(state.optimized_idx) > 0
    sc = np.asarray(state.shape_codes)
    tc = np.asarray(state.texture_codes)
    if opt.any():
        return sc[opt].mean(axis=0), tc[opt].mean(axis=0)
    return sc.mean(axis=0), tc.mean(axis=0)


def export_reference_checkpoint(model, state, instoken2idx: dict, path: str,
                                nepoch: int | None = None):
    """Write this framework's TrainState as a reference-format .pth training
    checkpoint (trainer_unified_nuscenes.py save_models :476-490), so
    reference tooling can load_pretrained_model / resume_from_epoch models
    trained here. Completes the interop loop that load_reference_checkpoint
    opens in the other direction."""
    from supnerf_tpu.models.torch_import import save_reference_checkpoint

    save_reference_checkpoint(
        model,
        {"params": state.params, "batch_stats": state.batch_stats},
        np.asarray(state.shape_codes), np.asarray(state.texture_codes),
        path,
        niter=int(np.asarray(state.niter)),
        nepoch=int(nepoch if nepoch is not None else 0),
        instoken2idx=instoken2idx,
        optimized_idx=np.asarray(state.optimized_idx),
    )
