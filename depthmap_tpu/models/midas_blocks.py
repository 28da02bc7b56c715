"""MiDaS/DPT decoder blocks: scratch projections, residual conv units, and
RefineNet-style feature-fusion blocks.

Semantics per reference dmidas/blocks.py:
 * _make_scratch (:136-166): 3x3 pad-1 bias-free projections, optional
   channel expansion [F, 2F, 4F, 8F];
 * ResidualConvUnit / _custom (:244-282 / :320-381): act-conv-act-conv + skip;
 * FeatureFusionBlock / _custom (:285-316 / :384-439): sum skip, RCU,
   2x bilinear (align_corners=True), and (custom) 1x1 out_conv.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from depthmap_tpu.models.layers import BatchNorm, Conv
from depthmap_tpu.ops.resize import interpolate, scale2x


class Scratch(nn.Module):
    out_shape: int
    expand: bool = False
    groups: int = 1
    n_levels: int = 4

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        outs = []
        for i, f in enumerate(feats):
            mult = 2 ** i if self.expand and i < self.n_levels else 1
            if not self.expand:
                mult = 1
            outs.append(Conv(self.out_shape * mult, 3, 1, padding=1,
                             groups=self.groups, use_bias=False,
                             name=f"layer{i + 1}_rn")(f))
        return tuple(outs)


class ResidualConvUnitCustom(nn.Module):
    features: int
    bn: bool = False
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = self.act(x)
        out = Conv(self.features, 3, 1, padding=1, name="conv1")(out)
        if self.bn:
            out = BatchNorm(name="bn1")(out, train)
        out = self.act(out)
        out = Conv(self.features, 3, 1, padding=1, name="conv2")(out)
        if self.bn:
            out = BatchNorm(name="bn2")(out, train)
        return out + x


class FeatureFusionBlockCustom(nn.Module):
    """FeatureFusionBlock_custom: optional skip add, RCU2, 2x bilinear
    upsample (align_corners configurable), then 1x1 out_conv (halves channels
    when expand)."""
    features: int
    bn: bool = False
    expand: bool = False
    align_corners: bool = True

    @nn.compact
    def __call__(self, x, skip=None, size: Optional[Tuple[int, int]] = None,
                 train: bool = False):
        out = x
        if skip is not None:
            out = out + ResidualConvUnitCustom(
                self.features, self.bn, name="resConfUnit1")(skip, train)
        out = ResidualConvUnitCustom(
            self.features, self.bn, name="resConfUnit2")(out, train)
        if size is None:
            out = scale2x(out, "bilinear", self.align_corners)
        else:
            out = interpolate(out, size, "bilinear", self.align_corners)
        out_features = self.features // 2 if self.expand else self.features
        out = Conv(out_features, 1, 1, padding=0, name="out_conv")(out)
        return out


class ResidualConvUnit(nn.Module):
    """Classic (midas_v21) RCU: relu-conv-relu-conv + skip."""
    features: int

    @nn.compact
    def __call__(self, x):
        out = nn.relu(x)
        out = Conv(self.features, 3, 1, padding=1, name="conv1")(out)
        out = nn.relu(out)
        out = Conv(self.features, 3, 1, padding=1, name="conv2")(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    """Classic FeatureFusionBlock (midas_v21): skip via RCU1, RCU2,
    2x bilinear align_corners=True.  No out_conv."""
    features: int

    @nn.compact
    def __call__(self, x, skip=None):
        out = x
        if skip is not None:
            out = out + ResidualConvUnit(self.features,
                                         name="resConfUnit1")(skip)
        out = ResidualConvUnit(self.features, name="resConfUnit2")(out)
        return scale2x(out, "bilinear", align_corners=True)
