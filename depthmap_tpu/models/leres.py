"""LeReS (res101): ResNeXt101-32x8d stride-32 encoder + FTB/FFM/AO decoder.

Parity with reference lib/network_auxi.py:15-290 (Decoder: FTB on the 1/32
feature -> conv -> 2x upsample, three FFM fusions at 1/16, 1/8, 1/4, AO head
to full res; all upsampling bilinear align_corners=True) and
lib/multi_depth_model_woauxi.py (RelDepthModel returns raw 1-channel depth).
Preprocess (src/depthmap_generation.py:406-440): squash-resize, RGB order,
ImageNet normalization.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from depthmap_tpu.models.layers import BatchNorm, Conv
from depthmap_tpu.models.resnet import ResNeXtBackbone
from depthmap_tpu.ops.resize import scale2x


class FTB(nn.Module):
    """Feature transform block: conv + residual conv-bn-relu-conv branch.

    Reference quirk (lib/network_auxi.py:100-124): conv_branch starts with
    ReLU(inplace=True), which mutates the conv1 output tensor *before* the
    residual addition `x + self.conv_branch(x)` reads it — so the skip
    connection carries relu(conv1(x)), not conv1(x).  Verified against the
    vendored torch module in tests/test_torch_parity.py."""
    mid: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.mid, 3, 1, padding=1, name="conv1")(x)
        x = nn.relu(x)   # in-place: relu lands on the residual too
        b = Conv(self.mid, 3, 1, padding=1, name="branch_conv1")(x)
        b = BatchNorm(name="branch_bn")(b, train)
        b = nn.relu(b)
        b = Conv(self.mid, 3, 1, padding=1, name="branch_conv2")(b)
        return nn.relu(x + b)


class FFM(nn.Module):
    """Feature fusion: FTB(low) + high, FTB, 2x bilinear upsample."""
    mid: int
    out: int

    @nn.compact
    def __call__(self, low_x, high_x, train: bool = False):
        x = FTB(self.mid, name="ftb1")(low_x, train)
        x = x + high_x
        x = FTB(self.out, name="ftb2")(x, train)
        return scale2x(x, "bilinear", align_corners=True)


class AO(nn.Module):
    """Adaptive output head: conv-bn-relu-conv + 2x upsample."""
    inchannels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.inchannels // 2, 3, 1, padding=1, name="conv1")(x)
        x = BatchNorm(name="bn")(x, train)
        x = nn.relu(x)
        x = Conv(1, 3, 1, padding=1, name="conv2")(x)
        return scale2x(x, "bilinear", align_corners=True)


class RelDepthModel(nn.Module):
    """LeReS relative depth model -> (N, H, W) depth (near = small)."""
    midchannels = (256, 256, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool = False):
        f4, f8, f16, f32 = ResNeXtBackbone(name="encoder")(x, train)
        m = self.midchannels
        x32x = FTB(m[3], name="conv_ftb")(f32, train)
        x32 = Conv(m[2], 3, 1, padding=1, name="conv1")(x32x)
        x16 = scale2x(x32, "bilinear", align_corners=True)
        x8 = FFM(m[2], m[2], name="ffm2")(f16, x16, train)
        x4 = FFM(m[1], m[1], name="ffm1")(f8, x8, train)
        x2 = FFM(m[0], m[0], name="ffm0")(f4, x4, train)
        out = AO(m[0], name="outconv")(x2, train)
        return jnp.squeeze(out, axis=-1)


def build_leres() -> RelDepthModel:
    return RelDepthModel()
