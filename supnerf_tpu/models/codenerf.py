"""CodeNeRF: the decoder-only baseline (reference /root/reference/src/model_codenerf.py:13-63).
Codes come from per-instance embedding tables (training) or the mean code (TTO)."""
from __future__ import annotations

import flax.linen as nn

from supnerf_tpu.models.nerf_mlp import CodeNeRFDecoder


class CodeNeRF(nn.Module):
    shape_blocks: int = 2
    texture_blocks: int = 1
    W: int = 256
    num_xyz_freq: int = 10
    num_dir_freq: int = 4
    latent_dim: int = 256

    def setup(self):
        self.decoder = CodeNeRFDecoder(
            shape_blocks=self.shape_blocks,
            texture_blocks=self.texture_blocks,
            W=self.W,
            latent_dim=self.latent_dim,
            num_xyz_freq=self.num_xyz_freq,
            num_dir_freq=self.num_dir_freq,
        )

    def __call__(self, xyz, viewdir, shapecode, texturecode):
        return self.decoder(xyz, viewdir, shapecode, texturecode)
