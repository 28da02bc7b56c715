"""ResNet-family encoders: ResNeXt101-32x8d (midas_v21, LeReS res101) with
MiDaS 4-layer feature taps.

Reference: dmidas/blocks.py:193-207 (_make_resnet_backbone splits a
torchvision resnext101_32x8d_wsl into layer1..layer4); LeReS uses the
stride-32 variant of the same trunk (lib/Resnext_torch.py).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from depthmap_tpu.models.layers import BatchNorm, Conv


class Bottleneck(nn.Module):
    planes: int            # base planes (64/128/256/512)
    stride: int = 1
    groups: int = 32
    width_per_group: int = 8
    expansion: int = 4
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.planes * (self.width_per_group / 64.0)) * self.groups
        out_ch = self.planes * self.expansion
        identity = x
        h = Conv(width, 1, 1, use_bias=False, name="conv1")(x)
        h = BatchNorm(name="bn1")(h, train)
        h = nn.relu(h)
        h = Conv(width, 3, self.stride, padding=1, groups=self.groups,
                 use_bias=False, name="conv2")(h)
        h = BatchNorm(name="bn2")(h, train)
        h = nn.relu(h)
        h = Conv(out_ch, 1, 1, use_bias=False, name="conv3")(h)
        h = BatchNorm(name="bn3")(h, train)
        if self.downsample:
            identity = Conv(out_ch, 1, self.stride, use_bias=False,
                            name="downsample_conv")(x)
            identity = BatchNorm(name="downsample_bn")(identity, train)
        return nn.relu(h + identity)


class ResNeXtBackbone(nn.Module):
    """4 feature taps at strides 4/8/16/32, channels 256/512/1024/2048."""
    layers: Tuple[int, ...] = (3, 4, 23, 3)   # resnext101
    groups: int = 32
    width_per_group: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = Conv(64, 7, 2, padding=3, use_bias=False, name="conv1")(x)
        h = BatchNorm(name="bn1")(h, train)
        h = nn.relu(h)
        # maxpool 3x3 stride 2 pad 1
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="VALID")
        feats = []
        planes = 64
        for li, n in enumerate(self.layers):
            stride = 1 if li == 0 else 2
            for bi in range(n):
                h = Bottleneck(planes, stride if bi == 0 else 1,
                               groups=self.groups,
                               width_per_group=self.width_per_group,
                               downsample=(bi == 0),
                               name=f"layer{li + 1}_{bi}")(h, train)
            feats.append(h)
            planes *= 2
        return tuple(feats)
