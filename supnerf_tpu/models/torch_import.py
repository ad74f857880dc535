"""Torch checkpoint interop: load the reference's published .pth weights into
this framework's flax models, and export back.

The reference distributes trained checkpoints
({'model_params': state_dict, 'shape_code_params', 'texture_code_params', ...},
/root/reference/src/trainer_unified_nuscenes.py:476-490). A user switching
frameworks brings those files: `load_reference_checkpoint` converts the torch
state_dict naming/layout to this package's flax variables.

Layout conversions: conv (O, I, H, W) -> (H, W, I, O); linear (O, I) -> (I, O);
BatchNorm weight/bias -> scale/bias params + running_mean/var -> batch_stats.
"""
from __future__ import annotations

import numpy as np


def _conv(w):
    return np.asarray(w).transpose(2, 3, 1, 0)


def _lin(w):
    return np.asarray(w).T


def _torch_block_names(layer: str, n_blocks: int):
    return [f"{layer}.{i}" for i in range(n_blocks)]


def _import_basic_block(sd, prefix: str, has_downsample: bool):
    p = {
        "Conv_0": {"kernel": _conv(sd[f"{prefix}.conv1.weight"])},
        "BatchNorm_0": {"scale": np.asarray(sd[f"{prefix}.bn1.weight"]),
                        "bias": np.asarray(sd[f"{prefix}.bn1.bias"])},
        "Conv_1": {"kernel": _conv(sd[f"{prefix}.conv2.weight"])},
        "BatchNorm_1": {"scale": np.asarray(sd[f"{prefix}.bn2.weight"]),
                        "bias": np.asarray(sd[f"{prefix}.bn2.bias"])},
    }
    bs = {
        "BatchNorm_0": {"mean": np.asarray(sd[f"{prefix}.bn1.running_mean"]),
                        "var": np.asarray(sd[f"{prefix}.bn1.running_var"])},
        "BatchNorm_1": {"mean": np.asarray(sd[f"{prefix}.bn2.running_mean"]),
                        "var": np.asarray(sd[f"{prefix}.bn2.running_var"])},
    }
    if has_downsample:
        p["Conv_2"] = {"kernel": _conv(sd[f"{prefix}.downsample.0.weight"])}
        p["BatchNorm_2"] = {"scale": np.asarray(sd[f"{prefix}.downsample.1.weight"]),
                            "bias": np.asarray(sd[f"{prefix}.downsample.1.bias"])}
        bs["BatchNorm_2"] = {"mean": np.asarray(sd[f"{prefix}.downsample.1.running_mean"]),
                             "var": np.asarray(sd[f"{prefix}.downsample.1.running_var"])}
    return p, bs


def _import_stage(sd, torch_layer: str, n_blocks: int, first_has_ds: bool):
    params, stats = {}, {}
    for i in range(n_blocks):
        has_ds = first_has_ds and i == 0
        p, bs = _import_basic_block(sd, f"{torch_layer}.{i}", has_ds)
        params[f"BasicBlock_{i}"] = p
        stats[f"BasicBlock_{i}"] = bs
    return params, stats


def _import_dense(sd, name: str):
    return {"kernel": _lin(sd[f"{name}.weight"]), "bias": np.asarray(sd[f"{name}.bias"])}


def import_encoder(sd, heads=("shape", "texture", "pose"), pred_wlh: bool = False,
                   layers=(3, 4, 6, 3)):
    """Reference ImgEncoder state_dict (prefix 'img_encoder.') -> flax
    (params, batch_stats) subtrees for models.encoder.ImgEncoder."""
    pre = "img_encoder."
    params = {"conv1": {"kernel": _conv(sd[pre + "conv1.weight"])},
              "bn1": {"scale": np.asarray(sd[pre + "bn1.weight"]),
                      "bias": np.asarray(sd[pre + "bn1.bias"])}}
    stats = {"bn1": {"mean": np.asarray(sd[pre + "bn1.running_mean"]),
                     "var": np.asarray(sd[pre + "bn1.running_var"])}}
    for li, (layer, n, ds) in enumerate(
            [("layer1", layers[0], False), ("layer2", layers[1], True),
             ("layer3", layers[2], True)]):
        p, bs = _import_stage(sd, pre + layer, n, ds)
        params[layer] = p
        stats[layer] = bs
    for h in heads:
        p, bs = _import_stage(sd, pre + f"layer4_{h}", layers[3], True)
        params[f"layer4_{h}"] = p
        stats[f"layer4_{h}"] = bs
        params[f"fc_{h}"] = _import_dense(sd, pre + f"fc_{h}")
    if "pose" in heads:
        params["fc_uv"] = _import_dense(sd, pre + "fc_uv")
    if pred_wlh:
        p, bs = _import_stage(sd, pre + "layer4_wlh", layers[3], True)
        params["layer4_wlh"] = p
        stats["layer4_wlh"] = bs
        params["fc_wlh_hidden"] = _import_dense(sd, pre + "fc_wlh.0")
        params["fc_wlh_out"] = _import_dense(sd, pre + "fc_wlh.2")
    return params, stats


def import_decoder(sd, shape_blocks: int, texture_blocks: int):
    """Reference CodeNeRF-style decoder state_dict (top-level names) -> flax
    params for models.nerf_mlp.CodeNeRFDecoder."""
    params = {
        "encoding_xyz": _import_dense(sd, "encoding_xyz.0"),
        "encoding_shape": _import_dense(sd, "encoding_shape"),
        "sigma": _import_dense(sd, "sigma.0"),
        "encoding_viewdir": _import_dense(sd, "encoding_viewdir.0"),
        "rgb_hidden": _import_dense(sd, "rgb.0"),
        "rgb_out": _import_dense(sd, "rgb.2"),
    }
    for j in range(1, shape_blocks + 1):
        params[f"shape_latent_layer_{j}"] = _import_dense(sd, f"shape_latent_layer_{j}.0")
        params[f"shape_layer_{j}"] = _import_dense(sd, f"shape_layer_{j}.0")
    for j in range(1, texture_blocks + 1):
        params[f"texture_latent_layer_{j}"] = _import_dense(sd, f"texture_latent_layer_{j}.0")
        params[f"texture_layer_{j}"] = _import_dense(sd, f"texture_layer_{j}.0")
    return params


def import_pose_refiner(sd, pose_blocks: int, regress_blocks: int):
    params = {"out_delta_layer": _import_dense(sd, "out_delta_layer")}
    for j in range(pose_blocks):
        params[f"pose_layer_{j}"] = _import_dense(sd, f"pose_layer_{j}.0")
    for j in range(regress_blocks):
        params[f"regress_layer_{j}"] = _import_dense(sd, f"regress_layer_{j}.0")
    return params


def import_supnerf_state_dict(model, state_dict) -> dict:
    """Reference SUPNeRF state_dict -> flax variables for models.SUPNeRF."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    enc_p, enc_bs = import_encoder(sd, pred_wlh=bool(model.pred_wlh))
    dec_p = import_decoder(sd, model.shape_blocks, model.texture_blocks)
    ref_p = import_pose_refiner(sd, model.pose_blocks, model.regress_blocks)
    return {
        "params": {"img_encoder": enc_p, "decoder": dec_p, "pose_refiner": ref_p},
        "batch_stats": {"img_encoder": enc_bs},
    }


def import_autorf_original_decoder(sd, shape_blocks: int, texture_blocks: int):
    """Reference ORIGINAL AutoRF decoder state_dict (feature-averaging
    decoder, model_autorf.py:123-186 — layer set: encoding_xyz,
    shape_layer_{0..n-2}, sigma, texture_layer_{0..n-2}, rgb; NO latent
    projection layers) -> flax params for models.nerf_mlp.AutoRFDecoder."""
    params = {
        "encoding_xyz": _import_dense(sd, "encoding_xyz.0"),
        "sigma": _import_dense(sd, "sigma.0"),
        "rgb": _import_dense(sd, "rgb.0"),
    }
    for j in range(shape_blocks - 1):
        params[f"shape_layer_{j}"] = _import_dense(sd, f"shape_layer_{j}.0")
    for j in range(texture_blocks - 1):
        params[f"texture_layer_{j}"] = _import_dense(sd, f"texture_layer_{j}.0")
    return params


def import_autorf_state_dict(model, state_dict) -> dict:
    from supnerf_tpu.models.autorf import AutoRF

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    enc_p, enc_bs = import_encoder(sd, heads=("shape", "texture"), pred_wlh=False)
    if isinstance(model, AutoRF):
        # the ORIGINAL feature-averaging decoder has a different layer set
        # than the CodeNeRF-style one the mix variant uses
        dec_p = import_autorf_original_decoder(
            sd, model.shape_blocks, model.texture_blocks)
    else:
        dec_p = import_decoder(sd, model.shape_blocks, model.texture_blocks)
    return {
        "params": {"img_encoder": enc_p, "decoder": dec_p},
        "batch_stats": {"img_encoder": enc_bs},
    }


def import_codenerf_state_dict(model, state_dict) -> dict:
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    return {"params": {"decoder": import_decoder(sd, model.shape_blocks,
                                                 model.texture_blocks)},
            "batch_stats": {}}


def load_reference_checkpoint(model, pth_path: str):
    """Load a reference .pth training checkpoint into (variables, mean_shape,
    mean_texture). Dispatches by model type."""
    import torch

    from supnerf_tpu.models.autorf import AutoRF, AutoRFMix
    from supnerf_tpu.models.codenerf import CodeNeRF
    from supnerf_tpu.models.supnerf import SUPNeRF

    saved = torch.load(pth_path, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() for k, v in saved["model_params"].items()}
    if isinstance(model, SUPNeRF):
        variables = import_supnerf_state_dict(model, sd)
    elif isinstance(model, (AutoRF, AutoRFMix)):
        variables = import_autorf_state_dict(model, sd)
    elif isinstance(model, CodeNeRF):
        variables = import_codenerf_state_dict(model, sd)
    else:
        raise TypeError(type(model))

    shape_w = saved["shape_code_params"]["weight"].numpy()
    tex_w = saved["texture_code_params"]["weight"].numpy()
    if "optimized_idx" in saved:
        mask = saved["optimized_idx"].numpy() > 0
        if mask.any():
            shape_w, tex_w = shape_w[mask], tex_w[mask]
    return variables, shape_w.mean(0), tex_w.mean(0)

# ---------------------------------------------------------------------------
# Export: flax variables -> reference torch state_dicts / .pth checkpoints
# (exact inverses of the importers above, emitting the reference's key set
# including BatchNorm num_batches_tracked so
# `reference_model.load_state_dict(sd, strict=True)` succeeds — the
# reference's load_pretrained_model is a strict load,
# /root/reference/src/trainer_unified_nuscenes.py:449-452).


def _conv_back(k):
    return np.ascontiguousarray(np.asarray(k).transpose(3, 2, 0, 1))


def _lin_back(k):
    return np.ascontiguousarray(np.asarray(k).T)


def _export_dense(out, name: str, p):
    out[f"{name}.weight"] = _lin_back(p["kernel"])
    out[f"{name}.bias"] = np.asarray(p["bias"])


def _export_bn(out, name: str, p, bs):
    out[f"{name}.weight"] = np.asarray(p["scale"])
    out[f"{name}.bias"] = np.asarray(p["bias"])
    out[f"{name}.running_mean"] = np.asarray(bs["mean"])
    out[f"{name}.running_var"] = np.asarray(bs["var"])
    out[f"{name}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def _export_basic_block(out, prefix: str, p, bs):
    out[f"{prefix}.conv1.weight"] = _conv_back(p["Conv_0"]["kernel"])
    _export_bn(out, f"{prefix}.bn1", p["BatchNorm_0"], bs["BatchNorm_0"])
    out[f"{prefix}.conv2.weight"] = _conv_back(p["Conv_1"]["kernel"])
    _export_bn(out, f"{prefix}.bn2", p["BatchNorm_1"], bs["BatchNorm_1"])
    if "Conv_2" in p:
        out[f"{prefix}.downsample.0.weight"] = _conv_back(p["Conv_2"]["kernel"])
        _export_bn(out, f"{prefix}.downsample.1", p["BatchNorm_2"],
                   bs["BatchNorm_2"])


def _export_stage(out, torch_layer: str, params, stats):
    for i in range(len(params)):
        _export_basic_block(out, f"{torch_layer}.{i}",
                            params[f"BasicBlock_{i}"], stats[f"BasicBlock_{i}"])


def export_encoder(params, stats, heads=("shape", "texture", "pose"),
                   pred_wlh: bool = False):
    """flax ImgEncoder (params, batch_stats) subtrees -> reference state_dict
    entries (prefix 'img_encoder.'). Inverse of import_encoder."""
    pre = "img_encoder."
    out = {pre + "conv1.weight": _conv_back(params["conv1"]["kernel"])}
    _export_bn(out, pre + "bn1", params["bn1"], stats["bn1"])
    for layer in ("layer1", "layer2", "layer3"):
        _export_stage(out, pre + layer, params[layer], stats[layer])
    for h in heads:
        _export_stage(out, pre + f"layer4_{h}", params[f"layer4_{h}"],
                      stats[f"layer4_{h}"])
        _export_dense(out, pre + f"fc_{h}", params[f"fc_{h}"])
    if "pose" in heads:
        _export_dense(out, pre + "fc_uv", params["fc_uv"])
    if pred_wlh:
        _export_stage(out, pre + "layer4_wlh", params["layer4_wlh"],
                      stats["layer4_wlh"])
        _export_dense(out, pre + "fc_wlh.0", params["fc_wlh_hidden"])
        _export_dense(out, pre + "fc_wlh.2", params["fc_wlh_out"])
    return out


def export_decoder(params, shape_blocks: int, texture_blocks: int):
    """Inverse of import_decoder (reference CodeNeRF-style decoder names)."""
    out = {}
    _export_dense(out, "encoding_xyz.0", params["encoding_xyz"])
    _export_dense(out, "encoding_shape", params["encoding_shape"])
    _export_dense(out, "sigma.0", params["sigma"])
    _export_dense(out, "encoding_viewdir.0", params["encoding_viewdir"])
    _export_dense(out, "rgb.0", params["rgb_hidden"])
    _export_dense(out, "rgb.2", params["rgb_out"])
    for j in range(1, shape_blocks + 1):
        _export_dense(out, f"shape_latent_layer_{j}.0",
                      params[f"shape_latent_layer_{j}"])
        _export_dense(out, f"shape_layer_{j}.0", params[f"shape_layer_{j}"])
    for j in range(1, texture_blocks + 1):
        _export_dense(out, f"texture_latent_layer_{j}.0",
                      params[f"texture_latent_layer_{j}"])
        _export_dense(out, f"texture_layer_{j}.0", params[f"texture_layer_{j}"])
    return out


def export_pose_refiner(params, pose_blocks: int, regress_blocks: int):
    out = {}
    _export_dense(out, "out_delta_layer", params["out_delta_layer"])
    for j in range(pose_blocks):
        _export_dense(out, f"pose_layer_{j}.0", params[f"pose_layer_{j}"])
    for j in range(regress_blocks):
        _export_dense(out, f"regress_layer_{j}.0", params[f"regress_layer_{j}"])
    return out


def export_autorf_original_decoder(params, shape_blocks: int,
                                   texture_blocks: int):
    """Inverse of import_autorf_original_decoder."""
    out = {}
    _export_dense(out, "encoding_xyz.0", params["encoding_xyz"])
    _export_dense(out, "sigma.0", params["sigma"])
    _export_dense(out, "rgb.0", params["rgb"])
    for j in range(shape_blocks - 1):
        _export_dense(out, f"shape_layer_{j}.0", params[f"shape_layer_{j}"])
    for j in range(texture_blocks - 1):
        _export_dense(out, f"texture_layer_{j}.0", params[f"texture_layer_{j}"])
    return out


def export_state_dict(model, variables) -> dict:
    """flax variables -> reference torch state_dict (numpy values). Dispatches
    by model type, mirroring load_reference_checkpoint."""
    from supnerf_tpu.models.autorf import AutoRF, AutoRFMix
    from supnerf_tpu.models.codenerf import CodeNeRF
    from supnerf_tpu.models.supnerf import SUPNeRF

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    if isinstance(model, SUPNeRF):
        sd = export_encoder(params["img_encoder"], stats["img_encoder"],
                            pred_wlh=bool(model.pred_wlh))
        sd.update(export_decoder(params["decoder"], model.shape_blocks,
                                 model.texture_blocks))
        sd.update(export_pose_refiner(params["pose_refiner"],
                                      model.pose_blocks, model.regress_blocks))
    elif isinstance(model, (AutoRF, AutoRFMix)):
        sd = export_encoder(params["img_encoder"], stats["img_encoder"],
                            heads=("shape", "texture"), pred_wlh=False)
        if isinstance(model, AutoRF):
            sd.update(export_autorf_original_decoder(
                params["decoder"], model.shape_blocks, model.texture_blocks))
        else:
            sd.update(export_decoder(params["decoder"], model.shape_blocks,
                                     model.texture_blocks))
    elif isinstance(model, CodeNeRF):
        sd = export_decoder(params["decoder"], model.shape_blocks,
                            model.texture_blocks)
    else:
        raise TypeError(type(model))
    return sd


def save_reference_checkpoint(model, variables, shape_codes, texture_codes,
                              path: str, *, niter: int = 0, nepoch: int = 0,
                              instoken2idx: dict | None = None,
                              optimized_idx=None):
    """Write a reference-format training checkpoint (.pth) that the
    reference's load_pretrained_model / resume_from_epoch consume directly
    (/root/reference/src/trainer_unified_nuscenes.py:476-490). Inverse of
    load_reference_checkpoint."""
    import torch

    sd = export_state_dict(model, variables)
    n_ins = int(np.asarray(shape_codes).shape[0])
    if optimized_idx is None:
        optimized_idx = np.ones(n_ins, np.int64)
    save_dict = {
        "model_params": {k: torch.from_numpy(np.array(v, order="C"))
                         for k, v in sd.items()},
        "shape_code_params": {
            "weight": torch.from_numpy(np.ascontiguousarray(shape_codes))},
        "texture_code_params": {
            "weight": torch.from_numpy(np.ascontiguousarray(texture_codes))},
        "niter": int(niter),
        "nepoch": int(nepoch),
        "instoken2idx": dict(instoken2idx or {}),
        "optimized_idx": torch.from_numpy(np.ascontiguousarray(optimized_idx)),
    }
    torch.save(save_dict, path)

