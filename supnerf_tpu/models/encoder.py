"""ResNet34-style multi-head image encoder in flax.linen (NHWC, TPU-native).

Capability-equivalent of the reference encoders
(/root/reference/src/model_supnerf.py:17-152 ImgEncoder with shape/texture/pose
[/wlh] heads and cross-task shortcut; /root/reference/src/model_autorf.py:10-111
two-head variant), re-designed for XLA: NHWC layout (channel-last feeds the MXU
convolution tiling), functional BatchNorm with batch-statistics normalization
(the reference never switches BN to eval mode — see models.layers.batch_norm).

Structure: conv7x7/2 + BN + ReLU + maxpool3x3/2, then BasicBlock stages
[3, 4, 6, C] at widths [64, 128, 256, 512], where the final 512-wide stage is
replicated per head (heads share the trunk through stage 3). Each head global-
average-pools and projects 512 -> latent_dim. A 16-d box-corner-UV regressor
hangs off the pose head; an optional wlh head adds its own stage-4 branch.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from supnerf_tpu.models.layers import InstanceNorm, TorchDense, batch_norm, conv_kaiming_init


def make_norm(norm: str, train: bool, name=None):
    if norm == "instance":
        return InstanceNorm(name=name)
    return batch_norm(train, name=name)


def conv3x3(features: int, stride: int = 1):
    return nn.Conv(
        features, (3, 3), strides=(stride, stride), padding=1, use_bias=False,
        kernel_init=conv_kaiming_init,
    )


def conv1x1(features: int, stride: int = 1):
    return nn.Conv(
        features, (1, 1), strides=(stride, stride), padding=0, use_bias=False,
        kernel_init=conv_kaiming_init,
    )


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        y = conv3x3(self.planes, self.stride)(x)
        y = make_norm(self.norm, train)(y)
        y = nn.relu(y)
        y = conv3x3(self.planes)(y)
        y = make_norm(self.norm, train)(y)
        if self.downsample:
            identity = conv1x1(self.planes, self.stride)(x)
            identity = make_norm(self.norm, train)(identity)
        return nn.relu(y + identity)


class ResStage(nn.Module):
    planes: int
    blocks: int
    stride: int = 1
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = True):
        needs_ds = self.stride != 1 or x.shape[-1] != self.planes
        x = BasicBlock(self.planes, self.stride, downsample=needs_ds,
                       norm=self.norm)(x, train)
        for _ in range(1, self.blocks):
            x = BasicBlock(self.planes, norm=self.norm)(x, train)
        return x


class ImgEncoder(nn.Module):
    """Multi-head ResNet encoder.

    heads: names of stage-4 branches, e.g. ("shape", "texture", "pose").
    pred_wlh adds a "wlh" branch with a deeper regression head.
    pose_shortcut subtracts the pose features from shape/texture feature maps
    (cross-task disentanglement, reference model_supnerf.py:123-126).

    __call__(img (B, H, W, 3), train) -> dict with per-head latent codes,
    "uv" (B, 16) if a pose head exists, and "wlh" (B, 3) if pred_wlh.
    """

    latent_dim: int = 256
    layers: Sequence[int] = (3, 4, 6, 3)
    heads: Sequence[str] = ("shape", "texture", "pose")
    pred_wlh: bool = False
    pose_shortcut: bool = False
    norm: str = "batch"  # "batch" (reference default) or "instance"

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    kernel_init=conv_kaiming_init, name="conv1")(x)
        x = make_norm(self.norm, train, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        x = ResStage(64, self.layers[0], norm=self.norm, name="layer1")(x, train)
        x = ResStage(128, self.layers[1], stride=2, norm=self.norm, name="layer2")(x, train)
        x = ResStage(256, self.layers[2], stride=2, norm=self.norm, name="layer3")(x, train)

        feats = {
            h: ResStage(512, self.layers[3], stride=2, norm=self.norm,
                        name=f"layer4_{h}")(x, train)
            for h in self.heads
        }
        if self.pred_wlh:
            feats["wlh"] = ResStage(512, self.layers[3], stride=2, norm=self.norm,
                                    name="layer4_wlh")(x, train)

        if self.pose_shortcut and "pose" in self.heads:
            for h in ("shape", "texture"):
                if h in feats:
                    feats[h] = feats[h] - feats["pose"]

        out = {}
        for h in self.heads:
            pooled = jnp.mean(feats[h], axis=(1, 2))
            out[h] = TorchDense(self.latent_dim, name=f"fc_{h}")(pooled)
        if "pose" in self.heads:
            out["uv"] = TorchDense(16, name="fc_uv")(out["pose"])
        if self.pred_wlh:
            pooled = jnp.mean(feats["wlh"], axis=(1, 2))
            hidden = nn.relu(TorchDense(self.latent_dim, name="fc_wlh_hidden")(pooled))
            out["wlh"] = TorchDense(3, name="fc_wlh_out")(hidden)
        return out
