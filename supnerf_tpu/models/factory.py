"""Model construction from a config dict (the jsonfiles 'arch' +
'net_hyperparams' contract, e.g. jsonfiles/supnerf.nusc.vehicle.car.json)."""
from __future__ import annotations

from supnerf_tpu.models.autorf import AutoRF, AutoRFMix
from supnerf_tpu.models.codenerf import CodeNeRF
from supnerf_tpu.models.supnerf import SUPNeRF


def build_model(arch: str, net_hyperparams: dict):
    hp = dict(net_hyperparams)
    field_dtype = hp.get("field_dtype")
    if field_dtype is not None and isinstance(field_dtype, str):
        import jax.numpy as jnp

        field_dtype = {"bfloat16": jnp.bfloat16, "float32": None}[field_dtype]
    if arch == "supnerf":
        return SUPNeRF(
            shape_blocks=hp.get("shape_blocks", 5),
            texture_blocks=hp.get("texture_blocks", 5),
            pose_blocks=hp.get("pose_blocks", 3),
            regress_blocks=hp.get("regress_blocks", 3),
            latent_dim=hp.get("latent_dim", 256),
            num_xyz_freq=hp.get("num_xyz_freq", 10),
            num_dir_freq=hp.get("num_dir_freq", 4),
            norm_layer_type=hp.get("norm_layer_type", "BatchNorm2d"),
            pose_shortcut=bool(hp.get("pose_shortcut", 0)),
            pred_wlh=bool(hp.get("pred_wlh", 0)),
            field_dtype=field_dtype,
        )
    if arch in ("autorf", "autorfmix"):
        # the published AutoRF baseline IS the mix variant (AutoRF encoder +
        # CodeNeRF decoder); config files name it "autorfmix"
        return AutoRFMix(
            shape_blocks=hp.get("shape_blocks", 5),
            texture_blocks=hp.get("texture_blocks", 5),
            latent_dim=hp.get("latent_dim", 128),
            num_xyz_freq=hp.get("num_xyz_freq", 10),
            num_dir_freq=hp.get("num_dir_freq", 4),
            norm_layer_type=hp.get("norm_layer_type", "BatchNorm2d"),
        )
    if arch == "autorf_original":
        return AutoRF(
            shape_blocks=hp.get("shape_blocks", 5),
            texture_blocks=hp.get("texture_blocks", 5),
            latent_dim=hp.get("latent_dim", 128),
            num_xyz_freq=hp.get("num_xyz_freq", 10),
            num_dir_freq=hp.get("num_dir_freq", 4),
            norm_layer_type=hp.get("norm_layer_type", "BatchNorm2d"),
        )
    if arch == "codenerf":
        return CodeNeRF(
            shape_blocks=hp.get("shape_blocks", 2),
            texture_blocks=hp.get("texture_blocks", 1),
            W=hp.get("latent_dim", 256),
            latent_dim=hp.get("latent_dim", 256),
            num_xyz_freq=hp.get("num_xyz_freq", 10),
            num_dir_freq=hp.get("num_dir_freq", 4),
        )
    raise ValueError(f"Unknown arch: {arch}")
