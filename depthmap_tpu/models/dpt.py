"""DPT depth models (MiDaS 3.0/3.1): generic scaffold over ViT/BEiT
backbones.

Assembly per reference dmidas/dpt_depth.py:31-169 +
dmidas/backbones/utils.py:144-249:
 * readout 'project': concat(token, cls) -> Linear(2C->C) -> GELU;
 * reassemble: 1x1 proj to per-level channels, then upsample 4x / 2x
   (transposed conv), identity, downsample conv (stride-2 3x3);
 * scratch 3x3 projections to `features`, 4 custom fusion blocks
   (align_corners=True) with explicit skip-size matching;
 * head: conv3x3 F->F/2, 2x bilinear (align_corners=True), conv3x3 ->32,
   relu, conv1x1 ->1, relu.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from depthmap_tpu.models.layers import Conv
from depthmap_tpu.models.midas_blocks import (FeatureFusionBlockCustom,
                                              Scratch)
from depthmap_tpu.ops.resize import scale2x


class ProjectReadout(nn.Module):
    """(B, 1+N, C) tokens -> (B, N, C): project cls into every token."""
    @nn.compact
    def __call__(self, tokens):
        cls = tokens[:, :1]
        toks = tokens[:, 1:]
        cat = jnp.concatenate(
            [toks, jnp.broadcast_to(cls, toks.shape)], axis=-1)
        h = nn.Dense(toks.shape[-1], name="project")(cat)
        return nn.gelu(h, approximate=False)


class Reassemble(nn.Module):
    """Token sequence -> spatial map at one of 4 scales."""
    out_ch: int
    level: int          # 0: 4x up, 1: 2x up, 2: identity, 3: 2x down
    readout: str = "project"

    @nn.compact
    def __call__(self, tokens, grid: Tuple[int, int]):
        gh, gw = grid
        if self.readout == "project":
            toks = ProjectReadout(name="readout")(tokens)
        elif self.readout == "ignore":
            toks = tokens[:, 1:]
        elif self.readout == "add":
            toks = tokens[:, 1:] + tokens[:, :1]
        else:
            raise ValueError(self.readout)
        b = toks.shape[0]
        h = toks.reshape(b, gh, gw, toks.shape[-1])
        h = Conv(self.out_ch, 1, name="proj")(h)
        if self.level == 0:
            h = nn.ConvTranspose(self.out_ch, (4, 4), strides=(4, 4),
                                 padding="VALID", name="resize")(h)
        elif self.level == 1:
            h = nn.ConvTranspose(self.out_ch, (2, 2), strides=(2, 2),
                                 padding="VALID", name="resize")(h)
        elif self.level == 3:
            h = Conv(self.out_ch, 3, 2, padding=1, name="resize")(h)
        return h


class DPTDepthModel(nn.Module):
    """Full DPT: backbone -> reassemble -> fusion -> head.

    with_zoe_taps additionally returns the MidasCore feature taps used by
    ZoeDepth (dzoedepth/models/base_models/midas.py:297-319: the head's
    post-relu 32ch activation 'out_conv', layer4_rn, and the four fusion
    outputs r4..r1)."""
    backbone: nn.Module
    reassemble_channels: Sequence[int] = (256, 512, 1024, 1024)
    features: int = 256
    non_negative: bool = True
    hybrid: bool = False   # first two features are already spatial
    with_zoe_taps: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, rel_bias=None):
        if rel_bias is not None:
            # precomputed BEiT relative-position biases (models/beit.py:
            # precompute_rel_biases) — input-independent, hoisted out of the
            # per-frame forward
            feats, grid = self.backbone(x, rel_bias=rel_bias)
        else:
            feats, grid = self.backbone(x)
        layers = []
        for i, f in enumerate(feats):
            if self.hybrid and i < 2:
                layers.append(f)     # resnet stage outputs, already NHWC
            else:
                layers.append(Reassemble(self.reassemble_channels[i], i,
                                         name=f"reassemble{i + 1}")(f, grid))
        rns = Scratch(self.features, expand=False, name="scratch")(layers)
        r1, r2, r3, r4 = rns

        p4 = FeatureFusionBlockCustom(self.features, name="refinenet4")(
            r4, size=r3.shape[1:3], train=train)
        p3 = FeatureFusionBlockCustom(self.features, name="refinenet3")(
            p4, r3, size=r2.shape[1:3], train=train)
        p2 = FeatureFusionBlockCustom(self.features, name="refinenet2")(
            p3, r2, size=r1.shape[1:3], train=train)
        p1 = FeatureFusionBlockCustom(self.features, name="refinenet1")(
            p2, r1, train=train)

        out = Conv(self.features // 2, 3, 1, padding=1, name="head_conv1")(p1)
        out = scale2x(out, "bilinear", align_corners=True)
        out = Conv(32, 3, 1, padding=1, name="head_conv2")(out)
        out_conv_act = nn.relu(out)
        # final depth values accumulate in f32 regardless of the compute
        # dtype: a bf16 output would quantize the 16-bit depth map to ~256
        # levels (visible banding)
        out = Conv(1, 1, name="head_conv3")(
            out_conv_act.astype(jnp.float32))
        if self.non_negative:
            out = nn.relu(out)
        depth = jnp.squeeze(out, axis=-1)
        if self.with_zoe_taps:
            return depth, (out_conv_act, r4, p4, p3, p2, p1)
        return depth


def build_dpt(variant: str) -> DPTDepthModel:
    """variant in {beitl16_512, beitl16_384, vitl16_384, vitb_rn50_384}
    (+ vitb16_384, beitb16_384 for completeness)."""
    if variant == "beitl16_512":
        from depthmap_tpu.models.beit import beit_large
        return DPTDepthModel(backbone=beit_large(512),
                             reassemble_channels=(256, 512, 1024, 1024))
    if variant == "beitl16_384":
        from depthmap_tpu.models.beit import beit_large
        return DPTDepthModel(backbone=beit_large(384),
                             reassemble_channels=(256, 512, 1024, 1024))
    if variant == "beitb16_384":
        from depthmap_tpu.models.beit import beit_base
        return DPTDepthModel(backbone=beit_base(384),
                             reassemble_channels=(96, 192, 384, 768))
    if variant == "vitl16_384":
        from depthmap_tpu.models.vit import VitBackbone
        return DPTDepthModel(
            backbone=VitBackbone(embed_dim=1024, depth=24, num_heads=16,
                                 hooks=(5, 11, 17, 23)),
            reassemble_channels=(256, 512, 1024, 1024))
    if variant == "vitb16_384":
        from depthmap_tpu.models.vit import VitBackbone
        return DPTDepthModel(
            backbone=VitBackbone(embed_dim=768, depth=12, num_heads=12,
                                 hooks=(2, 5, 8, 11)),
            reassemble_channels=(96, 192, 384, 768))
    if variant == "vitb_rn50_384":
        from depthmap_tpu.models.vit import HybridVitBackbone
        return DPTDepthModel(backbone=HybridVitBackbone(),
                             reassemble_channels=(256, 512, 768, 768),
                             hybrid=True)
    raise ValueError(f"Unknown DPT variant {variant!r}")
