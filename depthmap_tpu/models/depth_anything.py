"""Depth Anything v1 / v2: DINOv2 encoder + DPTHead.

Parity with reference ddepth_anything_v2/depth_anything_v2/dpt.py:38-186:
per-level 1x1 projections to out_channels, resize stack (4x/2x transposed
conv, identity, stride-2 conv), scratch 3x3 projections, 4 fusion blocks
with explicit size matching, head conv -> bilinear(align_corners=True) to
14x patch grid -> conv-relu-conv-relu.  v1 (depthmap_generation.py:221-236)
shares the architecture with taps on the last 4 blocks.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from depthmap_tpu.models.dinov2 import build_dinov2
from depthmap_tpu.models.layers import Conv
from depthmap_tpu.models.midas_blocks import (FeatureFusionBlockCustom,
                                              Scratch)
from depthmap_tpu.ops.resize import interpolate


class DPTHeadDA(nn.Module):
    in_channels: int
    features: int = 256
    out_channels: Sequence[int] = (256, 512, 1024, 1024)
    patch_size: int = 14

    @nn.compact
    def __call__(self, feats, grid, train: bool = False):
        gh, gw = grid
        outs = []
        for i, (patch_tokens, _cls) in enumerate(feats):
            b = patch_tokens.shape[0]
            h = patch_tokens.reshape(b, gh, gw, self.in_channels)
            h = Conv(self.out_channels[i], 1, name=f"project{i}")(h)
            if i == 0:
                h = nn.ConvTranspose(self.out_channels[0], (4, 4),
                                     strides=(4, 4), padding="VALID",
                                     name="resize0")(h)
            elif i == 1:
                h = nn.ConvTranspose(self.out_channels[1], (2, 2),
                                     strides=(2, 2), padding="VALID",
                                     name="resize1")(h)
            elif i == 3:
                h = Conv(self.out_channels[3], 3, 2, padding=1,
                         name="resize3")(h)
            outs.append(h)

        r1, r2, r3, r4 = Scratch(self.features, expand=False,
                                 name="scratch")(outs)
        p4 = FeatureFusionBlockCustom(self.features, name="refinenet4")(
            r4, size=r3.shape[1:3], train=train)
        p3 = FeatureFusionBlockCustom(self.features, name="refinenet3")(
            p4, r3, size=r2.shape[1:3], train=train)
        p2 = FeatureFusionBlockCustom(self.features, name="refinenet2")(
            p3, r2, size=r1.shape[1:3], train=train)
        p1 = FeatureFusionBlockCustom(self.features, name="refinenet1")(
            p2, r1, train=train)

        out = Conv(self.features // 2, 3, 1, padding=1, name="output_conv1")(p1)
        out = interpolate(out, (gh * self.patch_size, gw * self.patch_size),
                          "bilinear", True)
        out = Conv(32, 3, 1, padding=1, name="output_conv2_0")(out)
        out = nn.relu(out)
        # final depth accumulates in f32 (no 8-bit-mantissa banding in bf16)
        out = Conv(1, 1, name="output_conv2_2")(out.astype(jnp.float32))
        out = nn.relu(out)
        return out


class DepthAnything(nn.Module):
    encoder_variant: str = "vitl"
    features: int = 256
    out_channels: Sequence[int] = (256, 512, 1024, 1024)

    @nn.compact
    def __call__(self, x, train: bool = False):
        backbone = build_dinov2(self.encoder_variant)
        feats, grid = backbone.copy(name="pretrained")(x)
        head = DPTHeadDA(backbone.embed_dim, self.features,
                         tuple(self.out_channels), name="depth_head")
        out = head(feats, grid, train=train)
        out = nn.relu(out)   # reference applies relu again after the head
        return jnp.squeeze(out, axis=-1)


_DA2_CONFIGS = {
    "vits": dict(encoder_variant="vits", features=64,
                 out_channels=(48, 96, 192, 384)),
    "vitb": dict(encoder_variant="vitb", features=128,
                 out_channels=(96, 192, 384, 768)),
    "vitl": dict(encoder_variant="vitl", features=256,
                 out_channels=(256, 512, 1024, 1024)),
}


def build_depth_anything_v2(variant: str) -> DepthAnything:
    return DepthAnything(**_DA2_CONFIGS[variant])


def build_depth_anything_v1() -> DepthAnything:
    """depth_anything vitl14 (reference depthmap_generation.py:221-236)."""
    return DepthAnything(encoder_variant="vitl14_da1", features=256,
                         out_channels=(256, 512, 1024, 1024))
