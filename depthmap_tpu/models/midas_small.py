"""midas_v21_small: EfficientNet-Lite3 encoder + expand FeatureFusion decoder.

Parity with reference dmidas/midas_net_custom.py:12-105 (features=64,
blocks={'expand': True}, non_negative=True, align_corners=True fusion,
output head conv3x3 -> 2x bilinear (align_corners=False) -> conv3x3 -> relu
-> conv1x1 -> relu).  Output: (N, H, W) inverse relative depth.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from depthmap_tpu.models.efficientnet import EfficientNetLiteBackbone
from depthmap_tpu.models.layers import Conv
from depthmap_tpu.models.midas_blocks import (FeatureFusionBlockCustom,
                                              Scratch)
from depthmap_tpu.ops.resize import scale2x


class MidasNetSmall(nn.Module):
    features: int = 64
    non_negative: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (N, H, W, 3) normalized image, H and W multiples of 32."""
        l1, l2, l3, l4 = EfficientNetLiteBackbone(name="pretrained")(x, train)
        r1, r2, r3, r4 = Scratch(self.features, expand=True,
                                 name="scratch")((l1, l2, l3, l4))
        F = self.features
        p4 = FeatureFusionBlockCustom(F * 8, expand=True,
                                      name="refinenet4")(r4, train=train)
        p3 = FeatureFusionBlockCustom(F * 4, expand=True,
                                      name="refinenet3")(p4, r3, train=train)
        p2 = FeatureFusionBlockCustom(F * 2, expand=True,
                                      name="refinenet2")(p3, r2, train=train)
        p1 = FeatureFusionBlockCustom(F, expand=False,
                                      name="refinenet1")(p2, r1, train=train)

        out = Conv(F // 2, 3, 1, padding=1, name="output_conv1")(p1)
        out = scale2x(out, "bilinear", align_corners=False)
        out = Conv(32, 3, 1, padding=1, name="output_conv2")(out)
        out = nn.relu(out)
        # final depth accumulates in f32 (no 8-bit-mantissa banding in bf16)
        out = Conv(1, 1, 1, padding=0, name="output_conv3")(
            out.astype(jnp.float32))
        if self.non_negative:
            out = nn.relu(out)
        return jnp.squeeze(out, axis=-1)
