"""SUPNeRF: unified encoder + pose refiner + conditioned NeRF decoder.

Capability-equivalent of the reference SUPNeRF
(/root/reference/src/model_supnerf.py:165-269): a multi-head ResNet encoder
producing shape/texture/pose codes (+ direct box-corner UV, + optional wlh),
an iterative pose-delta regressor, and a CodeNeRF-style decoder.

Usage (linen):
    model = SUPNeRF(**net_hyperparams)
    vars_ = model.init(key, xyz, viewdir, shapecode, texturecode)
    sig, rgb = model.apply(vars_, xyz, viewdir, sc, tc)                  # field
    codes = model.apply(vars_, img, train, method=SUPNeRF.encode_img,
                        mutable=["batch_stats"])                         # encoder
    delta = model.apply(vars_, feat, uv, method=SUPNeRF.pose_update)     # refiner
"""
from __future__ import annotations

import flax.linen as nn

from supnerf_tpu.models.encoder import ImgEncoder
from supnerf_tpu.models.nerf_mlp import CodeNeRFDecoder, PoseRefinerMLP


class SUPNeRF(nn.Module):
    shape_blocks: int = 5
    texture_blocks: int = 5
    pose_blocks: int = 3
    regress_blocks: int = 3
    latent_dim: int = 256
    pose_dim: int = 16
    num_xyz_freq: int = 10
    num_dir_freq: int = 4
    norm_layer_type: str = "BatchNorm2d"
    pose_shortcut: bool = False
    pred_wlh: bool = False
    field_dtype: object = None  # compute dtype for the NeRF field (e.g. bfloat16)

    def setup(self):
        self.img_encoder = ImgEncoder(
            latent_dim=self.latent_dim,
            heads=("shape", "texture", "pose"),
            pred_wlh=bool(self.pred_wlh),
            pose_shortcut=bool(self.pose_shortcut),
            norm="instance" if self.norm_layer_type == "InstanceNorm2d" else "batch",
        )
        self.decoder = CodeNeRFDecoder(
            shape_blocks=self.shape_blocks,
            texture_blocks=self.texture_blocks,
            W=self.latent_dim,
            latent_dim=self.latent_dim,
            num_xyz_freq=self.num_xyz_freq,
            num_dir_freq=self.num_dir_freq,
            dtype=self.field_dtype,
        )
        self.pose_refiner = PoseRefinerMLP(
            pose_blocks=self.pose_blocks,
            regress_blocks=self.regress_blocks,
            W=self.latent_dim,
            pose_dim=self.pose_dim,
        )

    def __call__(self, xyz, viewdir, shapecode, texturecode):
        """NeRF field: (..., 3) points/dirs + broadcastable codes ->
        (sigmas (..., 1), rgbs (..., 3))."""
        return self.decoder(xyz, viewdir, shapecode, texturecode)

    def encode_img(self, img, train: bool = True):
        """img (B, H, W, 3) -> (shapecode, texturecode, posecode, uv (B,16),
        wlh (B,3) or None)."""
        out = self.img_encoder(img, train)
        return (
            out["shape"],
            out["texture"],
            out["pose"],
            out["uv"],
            out.get("wlh"),
        )

    def pose_update(self, im_feat, box_uv_src):
        """(B, latent) pose code + (B, 16) normalized projected corners ->
        (B, 6) raw pose delta (unscaled; see tto.refiner for composition)."""
        return self.pose_refiner(im_feat, box_uv_src)
