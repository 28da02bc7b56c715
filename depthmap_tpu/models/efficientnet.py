"""EfficientNet-Lite backbone (tf_efficientnet_lite3) with MiDaS feature taps.

The reference encoder is timm's tf_efficientnet_lite3 split into 4 layers
(dmidas/blocks.py:179-190: layer1 = stem+blocks[0:2], layer2 = blocks[2:3],
layer3 = blocks[3:5], layer4 = blocks[5:9]) feeding scratch channels
[32, 48, 136, 384].  Re-derived here from the EfficientNet-Lite recipe:
width 1.2 / depth 1.4, no squeeze-excite, ReLU6, stem/head repeats unscaled,
TF SAME padding, BN eps 1e-3.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence, Tuple

import flax.linen as nn

from depthmap_tpu.models.layers import ConvBnAct, ConvSame, BatchNorm, relu6


def _round_channels(c: float, divisor: int = 8) -> int:
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return new_c


@dataclass(frozen=True)
class BlockCfg:
    kernel: int
    stride: int
    expand: int
    channels: int
    repeats: int


def lite_config(width: float, depth: float) -> Tuple[BlockCfg, ...]:
    """EfficientNet-B0 stage table scaled the Lite way (first/last stage
    repeats fixed, no SE)."""
    base = [  # kernel, stride, expand, channels, repeats
        (3, 1, 1, 16, 1),
        (3, 2, 6, 24, 2),
        (5, 2, 6, 40, 2),
        (3, 2, 6, 80, 3),
        (5, 1, 6, 112, 3),
        (5, 2, 6, 192, 4),
        (3, 1, 6, 320, 1),
    ]
    out = []
    for i, (k, s, e, c, n) in enumerate(base):
        c = _round_channels(c * width)
        if i not in (0, len(base) - 1):   # lite: keep first/last repeats
            n = int(math.ceil(n * depth))
        out.append(BlockCfg(k, s, e, c, n))
    return tuple(out)


LITE3 = lite_config(width=1.2, depth=1.4)


class MBConv(nn.Module):
    """Inverted-residual block, Lite flavor (no SE, ReLU6)."""
    cfg: BlockCfg
    in_ch: int
    stride: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        shortcut = x
        h = x
        mid = self.in_ch * c.expand
        if c.expand != 1:
            h = ConvBnAct(mid, 1, 1, name="pw_exp")(h, train)
        # depthwise
        h = ConvBnAct(mid, c.kernel, self.stride, groups=mid, name="dw")(h, train)
        h = ConvBnAct(c.channels, 1, 1, act=None, name="pw_proj")(h, train)
        if self.stride == 1 and self.in_ch == c.channels:
            h = h + shortcut
        return h


class DSConv(nn.Module):
    """Depthwise-separable block (stage 0, expand=1)."""
    cfg: BlockCfg
    in_ch: int
    stride: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        shortcut = x
        h = ConvBnAct(self.in_ch, c.kernel, self.stride, groups=self.in_ch,
                      name="dw")(x, train)
        h = ConvBnAct(c.channels, 1, 1, act=None, name="pw")(h, train)
        if self.stride == 1 and self.in_ch == c.channels:
            h = h + shortcut
        return h


class EfficientNetLiteBackbone(nn.Module):
    """Returns the 4 MiDaS feature taps (strides 4, 8, 16, 32)."""
    cfgs: Tuple[BlockCfg, ...] = LITE3
    stem_ch: int = 32  # fixed in lite variants

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvBnAct(self.stem_ch, 3, 2, name="stem")(x, train)
        in_ch = self.stem_ch
        feats = []
        # taps after stage indices: layer1 = stages 0-1, layer2 = stage 2,
        # layer3 = stages 3-4, layer4 = stages 5-6
        taps = {1, 2, 4, 6}
        for si, cfg in enumerate(self.cfgs):
            for bi in range(cfg.repeats):
                stride = cfg.stride if bi == 0 else 1
                Block = DSConv if cfg.expand == 1 else MBConv
                h = Block(cfg, in_ch, stride, name=f"s{si}_b{bi}")(h, train)
                in_ch = cfg.channels
            if si in taps:
                feats.append(h)
        return tuple(feats)   # channels (32, 48, 136, 384) for lite3


def lite3_feature_channels() -> Tuple[int, int, int, int]:
    return (LITE3[1].channels, LITE3[2].channels, LITE3[4].channels,
            LITE3[6].channels)
