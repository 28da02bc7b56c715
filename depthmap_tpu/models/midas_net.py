"""midas_v21: ResNeXt101-32x8d-WSL encoder + classic FeatureFusion decoder.

Parity with reference dmidas/midas_net.py:13-76 (features=256,
non_negative=True; head conv3x3 256->128 -> 2x bilinear (align_corners=False)
-> conv3x3 128->32 -> relu -> conv1x1 -> relu).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from depthmap_tpu.models.layers import Conv
from depthmap_tpu.models.midas_blocks import FeatureFusionBlock, Scratch
from depthmap_tpu.models.resnet import ResNeXtBackbone
from depthmap_tpu.ops.resize import scale2x


class MidasNet(nn.Module):
    features: int = 256
    non_negative: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (N, H, W, 3) normalized image -> (N, H, W) inverse depth."""
        l1, l2, l3, l4 = ResNeXtBackbone(name="pretrained")(x, train)
        r1, r2, r3, r4 = Scratch(self.features, expand=False,
                                 name="scratch")((l1, l2, l3, l4))
        p4 = FeatureFusionBlock(self.features, name="refinenet4")(r4)
        p3 = FeatureFusionBlock(self.features, name="refinenet3")(p4, r3)
        p2 = FeatureFusionBlock(self.features, name="refinenet2")(p3, r2)
        p1 = FeatureFusionBlock(self.features, name="refinenet1")(p2, r1)

        out = Conv(128, 3, 1, padding=1, name="output_conv1")(p1)
        out = scale2x(out, "bilinear", align_corners=False)
        out = Conv(32, 3, 1, padding=1, name="output_conv2")(out)
        out = nn.relu(out)
        # final depth accumulates in f32 (no 8-bit-mantissa banding in bf16)
        out = Conv(1, 1, 1, padding=0, name="output_conv3")(
            out.astype(jnp.float32))
        if self.non_negative:
            out = nn.relu(out)
        return jnp.squeeze(out, axis=-1)
