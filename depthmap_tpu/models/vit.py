"""ViT backbones for DPT (MiDaS 3.0): vitl16_384, vitb16_384, and the
vitb_rn50_384 hybrid.

Semantics per reference dmidas/backbones/vit.py:
 * forward_flex (:33-73): absolute pos-embed whose grid part is bilinearly
   interpolated (align_corners=False) to the actual patch grid (:16-30);
 * features are block outputs at hook depths (pre final-norm);
 * the hybrid runs a ResNetV2-50 (weight-standardized convs + GroupNorm,
   stages (3,4,9)) as patch embed; hooks 1-2 are resnet stage outputs, hooks
   3-4 are ViT blocks 8/11 (:120-242).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from depthmap_tpu.models.transformer import Block, PatchEmbed
from depthmap_tpu.ops.resize import interpolate


def resize_pos_embed(pos_embed: jax.Array, gs_h: int, gs_w: int,
                     n_prefix: int = 1) -> jax.Array:
    """(1, n_prefix + gh*gw_old, C) -> (1, n_prefix + gs_h*gs_w, C)."""
    tok = pos_embed[:, :n_prefix]
    grid = pos_embed[0, n_prefix:]
    gs_old = int(round(float(grid.shape[0]) ** 0.5))
    grid = grid.reshape(gs_old, gs_old, -1)
    if (gs_h, gs_w) != (gs_old, gs_old):
        grid = interpolate(grid, (gs_h, gs_w), "bilinear", False)
    grid = grid.reshape(1, gs_h * gs_w, -1)
    return jnp.concatenate([tok, grid], axis=1)


class VitBackbone(nn.Module):
    """Plain ViT with cls token; returns block outputs at hook depths."""
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    hooks: Sequence[int] = (5, 11, 17, 23)
    train_grid: int = 24            # 384/16
    patch_size: int = 16
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        n = x.shape[0]
        tokens, (gh, gw) = PatchEmbed(self.embed_dim, self.patch_size,
                                      name="patch_embed")(x)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.embed_dim))
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, 1 + self.train_grid ** 2, self.embed_dim))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (n, 1, self.embed_dim)), tokens], axis=1)
        tokens = tokens + resize_pos_embed(pos, gh, gw)
        feats = []
        for i in range(self.depth):
            tokens = Block(self.num_heads, self.mlp_ratio,
                           name=f"block_{i}")(tokens)
            if i in self.hooks:
                feats.append(tokens)
        return tuple(feats), (gh, gw)


# --- ResNetV2 pieces for the hybrid ---------------------------------------

class StdConv(nn.Module):
    """Weight-standardized conv (timm StdConv2dSame) with TF SAME padding."""
    features: int
    kernel: int
    stride: int = 1
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        from depthmap_tpu.models.layers import tf_same_pads
        kern = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, x.shape[-1], self.features))
        mean = jnp.mean(kern, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(kern, axis=(0, 1, 2), keepdims=True)
        kern = (kern - mean) / jnp.sqrt(var + self.eps)
        ph = tf_same_pads(x.shape[1], self.kernel, self.stride)
        pw = tf_same_pads(x.shape[2], self.kernel, self.stride)
        return jax.lax.conv_general_dilated(
            x, kern, (self.stride, self.stride), [ph, pw],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class GroupNormAct(nn.Module):
    groups: int = 32
    eps: float = 1e-5
    act: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                         name="gn")(x)
        return nn.relu(x) if self.act else x


class ResNetV2Bottleneck(nn.Module):
    """timm ResNetV2 non-preact bottleneck: conv-norm-act x3 + skip."""
    out_ch: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        mid = self.out_ch // 4
        shortcut = x
        if self.downsample:
            shortcut = StdConv(self.out_ch, 1, self.stride,
                               name="downsample_conv")(x)
            shortcut = GroupNormAct(act=False, name="downsample_norm")(shortcut)
        h = StdConv(mid, 1, name="conv1")(x)
        h = GroupNormAct(name="norm1")(h)
        h = StdConv(mid, 3, self.stride, name="conv2")(h)
        h = GroupNormAct(name="norm2")(h)
        h = StdConv(self.out_ch, 1, name="conv3")(h)
        h = GroupNormAct(act=False, name="norm3")(h)
        return nn.relu(h + shortcut)


class ResNetV2Stages(nn.Module):
    """Stem + 3 stages (3, 4, 9 blocks); returns (stage1, stage2, final)."""
    layers: Tuple[int, ...] = (3, 4, 9)

    @nn.compact
    def __call__(self, x):
        h = StdConv(64, 7, 2, name="stem_conv")(x)
        h = GroupNormAct(name="stem_norm")(h)
        # timm MaxPool2dSame: TF SAME padding is asymmetric (extra row/col
        # on the bottom/right for even inputs), not (1, 1)
        from depthmap_tpu.models.layers import tf_same_pads
        ph = tf_same_pads(h.shape[1], 3, 2)
        pw = tf_same_pads(h.shape[2], 3, 2)
        h = jnp.pad(h, ((0, 0), ph, pw, (0, 0)),
                    constant_values=-jnp.inf)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="VALID")
        outs = []
        ch = 256
        for si, n in enumerate(self.layers):
            stride = 1 if si == 0 else 2
            for bi in range(n):
                h = ResNetV2Bottleneck(ch, stride if bi == 0 else 1,
                                       downsample=(bi == 0),
                                       name=f"stage{si}_b{bi}")(h)
            outs.append(h)
            ch *= 2
        return outs[0], outs[1], outs[2]


class HybridVitBackbone(nn.Module):
    """vitb_rn50_384: ResNetV2 stages 1-2 as features 1-2; ViT blocks 8/11 as
    features 3-4 (patch grid = resnet stride 16 output)."""
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    hooks: Sequence[int] = (8, 11)
    train_grid: int = 24
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        n = x.shape[0]
        s1, s2, feat = ResNetV2Stages(name="backbone")(x)
        # 1x1 patch proj on the stride-16 resnet feature
        h = nn.Conv(self.embed_dim, (1, 1), name="patch_proj")(feat)
        _, gh, gw, _ = h.shape
        tokens = h.reshape(n, gh * gw, self.embed_dim)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.embed_dim))
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, 1 + self.train_grid ** 2, self.embed_dim))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (n, 1, self.embed_dim)), tokens], axis=1)
        tokens = tokens + resize_pos_embed(pos, gh, gw)
        feats = []
        for i in range(self.depth):
            tokens = Block(self.num_heads, self.mlp_ratio,
                           name=f"block_{i}")(tokens)
            if i in self.hooks:
                feats.append(tokens)
        return (s1, s2, feats[0], feats[1]), (gh, gw)
