"""AutoRF baselines (reference /root/reference/src/model_autorf.py).

AutoRF    = two-head ResNet encoder + original feature-averaging decoder.
AutoRFMix = two-head ResNet encoder + CodeNeRF-style decoder (the published
            AutoRF baseline configuration, model_autorf.py:190-250).
"""
from __future__ import annotations

import flax.linen as nn

from supnerf_tpu.models.encoder import ImgEncoder
from supnerf_tpu.models.nerf_mlp import AutoRFDecoder, CodeNeRFDecoder


class AutoRF(nn.Module):
    shape_blocks: int = 5
    texture_blocks: int = 5
    latent_dim: int = 128
    num_xyz_freq: int = 10
    num_dir_freq: int = 4
    norm_layer_type: str = "BatchNorm2d"

    def setup(self):
        self.img_encoder = ImgEncoder(
            latent_dim=self.latent_dim, heads=("shape", "texture"),
            norm="instance" if self.norm_layer_type == "InstanceNorm2d" else "batch",
        )
        self.decoder = AutoRFDecoder(
            shape_blocks=self.shape_blocks,
            texture_blocks=self.texture_blocks,
            latent_dim=self.latent_dim,
            num_xyz_freq=self.num_xyz_freq,
            num_dir_freq=self.num_dir_freq,
        )

    def __call__(self, xyz, viewdir, shape_feat, texture_feat):
        return self.decoder(xyz, viewdir, shape_feat, texture_feat)

    def encode_img(self, img, train: bool = True):
        out = self.img_encoder(img, train)
        return out["shape"], out["texture"]


class AutoRFMix(nn.Module):
    shape_blocks: int = 5
    texture_blocks: int = 5
    latent_dim: int = 128
    num_xyz_freq: int = 10
    num_dir_freq: int = 4
    norm_layer_type: str = "BatchNorm2d"

    def setup(self):
        self.img_encoder = ImgEncoder(
            latent_dim=self.latent_dim, heads=("shape", "texture"),
            norm="instance" if self.norm_layer_type == "InstanceNorm2d" else "batch",
        )
        self.decoder = CodeNeRFDecoder(
            shape_blocks=self.shape_blocks,
            texture_blocks=self.texture_blocks,
            W=self.latent_dim,
            latent_dim=self.latent_dim,
            num_xyz_freq=self.num_xyz_freq,
            num_dir_freq=self.num_dir_freq,
        )

    def __call__(self, xyz, viewdir, shapecode, texturecode):
        return self.decoder(xyz, viewdir, shapecode, texturecode)

    def encode_img(self, img, train: bool = True):
        out = self.img_encoder(img, train)
        return out["shape"], out["texture"]
