"""Hand-written torch oracle models for the timm-backed reference families.

timm is not installed in this environment, so the vendored dmidas model code
cannot be instantiated.  These oracles are independent torch
reimplementations of the documented reference math (file:line cites inline)
that reproduce the *checkpoint key layout* exactly — so the real
`models/convert.py` converters run unmodified on `oracle.state_dict()` and
the flax forwards can be checked end-to-end against a torch forward.

They are test-only code (never shipped) and live next to tests/oracles.py,
which plays the same role for the pixel kernels.
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# --------------------------------------------------------------------------
# BEiT backbone (timm layout; math per dmidas/backbones/beit.py:29-130)
# --------------------------------------------------------------------------

def gen_rel_pos_index(wh: int, ww: int) -> torch.Tensor:
    """timm.models.beit.gen_relative_position_index semantics."""
    num_rel = (2 * wh - 1) * (2 * ww - 1)
    coords = torch.stack(torch.meshgrid(torch.arange(wh), torch.arange(ww),
                                        indexing="ij"))
    flat = coords.flatten(1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    n = wh * ww
    index = torch.zeros((n + 1, n + 1), dtype=torch.long)
    index[1:, 1:] = rel.sum(-1)
    index[0, 0:] = num_rel
    index[0:, 0] = num_rel + 1
    index[0, 0] = num_rel + 2
    return index


class OracleBeitAttention(nn.Module):
    def __init__(self, dim, num_heads, train_window):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.window_size = train_window
        self.num_relative_distance = \
            (2 * train_window[0] - 1) * (2 * train_window[1] - 1) + 3
        self.qkv = nn.Linear(dim, dim * 3, bias=False)
        self.q_bias = nn.Parameter(torch.zeros(dim))
        self.k_bias = nn.Parameter(torch.zeros(dim), requires_grad=False)
        self.v_bias = nn.Parameter(torch.zeros(dim))
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros(self.num_relative_distance, num_heads))
        self.register_buffer(
            "relative_position_index",
            gen_rel_pos_index(*train_window), persistent=True)
        self.proj = nn.Linear(dim, dim)

    def _rel_pos_bias(self, window):
        """Arbitrary-window bias (dmidas/backbones/beit.py:29-62): resize the
        token-token sub-table laid out (1, W, H, C)->NCHW, bilinear, keep the
        3 cls rows verbatim."""
        twh, tww = self.window_size
        old_h, old_w = 2 * twh - 1, 2 * tww - 1
        new_h, new_w = 2 * window[0] - 1, 2 * window[1] - 1
        table = self.relative_position_bias_table
        old_sub = table[:self.num_relative_distance - 3]
        old_sub = old_sub.reshape(1, old_w, old_h, -1).permute(0, 3, 1, 2)
        new_sub = F.interpolate(old_sub, size=(new_h, new_w), mode="bilinear")
        new_sub = new_sub.permute(0, 2, 3, 1).reshape(new_h * new_w, -1)
        table = torch.cat(
            [new_sub, self.relative_position_bias_table[
                self.num_relative_distance - 3:]])
        idx = gen_rel_pos_index(*window)
        n = window[0] * window[1] + 1
        bias = table[idx.view(-1)].view(n, n, -1)
        return bias.permute(2, 0, 1).unsqueeze(0)

    def forward(self, x, window):
        b, n, c = x.shape
        qkv_bias = torch.cat((self.q_bias, self.k_bias, self.v_bias))
        qkv = F.linear(x, self.qkv.weight, qkv_bias)
        qkv = qkv.reshape(b, n, 3, self.num_heads, -1).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        attn = attn + self._rel_pos_bias(window)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b, n, -1)
        return self.proj(x)


class OracleMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class OracleBeitBlock(nn.Module):
    def __init__(self, dim, num_heads, train_window, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = OracleBeitAttention(dim, num_heads, train_window)
        self.gamma_1 = nn.Parameter(torch.ones(dim))
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = OracleMlp(dim, int(dim * mlp_ratio))
        self.gamma_2 = nn.Parameter(torch.ones(dim))

    def forward(self, x, window):
        x = x + self.gamma_1 * self.attn(self.norm1(x), window)
        x = x + self.gamma_2 * self.mlp(self.norm2(x))
        return x


class OracleBeit(nn.Module):
    """timm Beit body as consumed by the DPT hooks (the final norm layer is
    hook-dead in MiDaS; it may exist in real checkpoints and the converter
    tolerates it)."""

    def __init__(self, dim=1024, depth=24, num_heads=16, img_size=512,
                 patch_size=16):
        super().__init__()
        self.patch_size = patch_size
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch_size, patch_size)
        tw = img_size // patch_size
        self.blocks = nn.ModuleList(
            [OracleBeitBlock(dim, num_heads, (tw, tw))
             for _ in range(depth)])

    def forward_features_collect(self, x, hooks):
        """-> list of token tensors at the hooked block outputs."""
        window = (x.shape[2] // self.patch_size, x.shape[3] // self.patch_size)
        h = self.patch_embed.proj(x)
        h = h.flatten(2).transpose(1, 2)
        h = torch.cat((self.cls_token.expand(h.shape[0], -1, -1), h), dim=1)
        out = []
        for i, blk in enumerate(self.blocks):
            h = blk(h, window)
            if i in hooks:
                out.append(h)
        return out


# --------------------------------------------------------------------------
# ViT backbone (timm layout; math per dmidas/backbones/vit.py:16-125)
# --------------------------------------------------------------------------

class OracleVitAttention(nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        b, n, c = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.num_heads, -1)
        q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
        attn = ((q * self.scale) @ k.transpose(-2, -1)).softmax(dim=-1)
        return self.proj((attn @ v).transpose(1, 2).reshape(b, n, -1))


class OracleVitBlock(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = OracleVitAttention(dim, num_heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = OracleMlp(dim, int(dim * mlp_ratio))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


class OracleVit(nn.Module):
    def __init__(self, dim=1024, depth=24, num_heads=16, img_size=384,
                 patch_size=16):
        super().__init__()
        self.patch_size = patch_size
        gs = img_size // patch_size
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, gs * gs + 1, dim))
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch_size, patch_size)
        self.blocks = nn.ModuleList(
            [OracleVitBlock(dim, num_heads) for _ in range(depth)])

    def _resize_pos_embed(self, gh, gw):
        """dmidas/backbones/vit.py:16-30 _resize_pos_embed semantics."""
        posemb = self.pos_embed
        tok, grid = posemb[:, :1], posemb[0, 1:]
        gs_old = int(math.sqrt(grid.shape[0]))
        grid = grid.reshape(1, gs_old, gs_old, -1).permute(0, 3, 1, 2)
        grid = F.interpolate(grid, size=(gh, gw), mode="bilinear")
        grid = grid.permute(0, 2, 3, 1).reshape(1, gh * gw, -1)
        return torch.cat([tok, grid], dim=1)

    def forward_features_collect(self, x, hooks):
        gh, gw = x.shape[2] // self.patch_size, x.shape[3] // self.patch_size
        h = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        h = torch.cat((self.cls_token.expand(h.shape[0], -1, -1), h), dim=1)
        h = h + self._resize_pos_embed(gh, gw)
        out = []
        for i, blk in enumerate(self.blocks):
            h = blk(h)
            if i in hooks:
                out.append(h)
        return out


# --------------------------------------------------------------------------
# DPT reassemble + decoder (key layout per dmidas/backbones/utils.py:144-249
# and dmidas/blocks.py:136-420)
# --------------------------------------------------------------------------

class ProjectReadout(nn.Module):
    def __init__(self, vit_features):
        super().__init__()
        self.project = nn.Sequential(nn.Linear(2 * vit_features,
                                               vit_features), nn.GELU())

    def forward(self, tokens):
        cls = tokens[:, :1].expand_as(tokens[:, 1:])
        return self.project(torch.cat((tokens[:, 1:], cls), -1))


def _act_postprocess(vit_features, out_ch, level):
    """nn.Sequential mirroring utils.py:167-249: [readout, Transpose,
    Unflatten, 1x1 conv, resize]; indices 1/2 (Transpose/Unflatten) are
    parameter-free placeholders so the conv lands at index 3 like timm."""
    layers = [ProjectReadout(vit_features), nn.Identity(), nn.Identity(),
              nn.Conv2d(vit_features, out_ch, 1)]
    if level == 0:
        layers.append(nn.ConvTranspose2d(out_ch, out_ch, 4, 4))
    elif level == 1:
        layers.append(nn.ConvTranspose2d(out_ch, out_ch, 2, 2))
    elif level == 3:
        layers.append(nn.Conv2d(out_ch, out_ch, 3, 2, 1))
    return nn.Sequential(*layers)


class ResidualConvUnitCustom(nn.Module):
    def __init__(self, features):
        super().__init__()
        self.conv1 = nn.Conv2d(features, features, 3, 1, 1)
        self.conv2 = nn.Conv2d(features, features, 3, 1, 1)

    def forward(self, x):
        out = F.relu(x)
        out = self.conv1(out)
        out = F.relu(out)
        out = self.conv2(out)
        return out + x


class FeatureFusionBlockCustom(nn.Module):
    def __init__(self, features, with_rcu1=True):
        super().__init__()
        self.out_conv = nn.Conv2d(features, features, 1)
        if with_rcu1:
            self.resConfUnit1 = ResidualConvUnitCustom(features)
        self.resConfUnit2 = ResidualConvUnitCustom(features)

    def forward(self, x, skip=None, size=None):
        out = x
        if skip is not None:
            out = out + self.resConfUnit1(skip)
        out = self.resConfUnit2(out)
        if size is None:
            out = F.interpolate(out, scale_factor=2, mode="bilinear",
                                align_corners=True)
        else:
            out = F.interpolate(out, size=size, mode="bilinear",
                                align_corners=True)
        return self.out_conv(out)


class OracleDPT(nn.Module):
    """DPTDepthModel twin for ViT/BEiT backbones (dpt_depth.py:31-169)."""

    def __init__(self, backbone: str, img_size: int):
        super().__init__()
        cfg = {
            "beitl16_512": dict(dim=1024, depth=24, heads=16,
                                hooks=[5, 11, 17, 23],
                                rc=[256, 512, 1024, 1024]),
            "beitl16_384": dict(dim=1024, depth=24, heads=16,
                                hooks=[5, 11, 17, 23],
                                rc=[256, 512, 1024, 1024]),
            "beitb16_384": dict(dim=768, depth=12, heads=12,
                                hooks=[2, 5, 8, 11],
                                rc=[96, 192, 384, 768]),
            "vitl16_384": dict(dim=1024, depth=24, heads=16,
                               hooks=[5, 11, 17, 23],
                               rc=[256, 512, 1024, 1024]),
        }[backbone]
        # tiny-model override for fast tests
        self.hooks = cfg["hooks"]
        dim, depth = cfg["dim"], cfg["depth"]
        features = 256
        self.pretrained = nn.Module()
        if backbone.startswith("beit"):
            self.pretrained.model = OracleBeit(dim, depth, cfg["heads"],
                                               img_size)
        else:
            self.pretrained.model = OracleVit(dim, depth, cfg["heads"],
                                              img_size)
        for i, ch in enumerate(cfg["rc"]):
            setattr(self.pretrained, f"act_postprocess{i + 1}",
                    _act_postprocess(dim, ch, i))
        self.scratch = nn.Module()
        for i, ch in enumerate(cfg["rc"]):
            setattr(self.scratch, f"layer{i + 1}_rn",
                    nn.Conv2d(ch, features, 3, 1, 1, bias=False))
        self.scratch.refinenet1 = FeatureFusionBlockCustom(features)
        self.scratch.refinenet2 = FeatureFusionBlockCustom(features)
        self.scratch.refinenet3 = FeatureFusionBlockCustom(features)
        self.scratch.refinenet4 = FeatureFusionBlockCustom(features,
                                                           with_rcu1=False)
        self.scratch.output_conv = nn.Sequential(
            nn.Conv2d(features, features // 2, 3, 1, 1),
            nn.Identity(),      # Interpolate module (parameter-free)
            nn.Conv2d(features // 2, 32, 3, 1, 1),
            nn.ReLU(),
            nn.Conv2d(32, 1, 1),
            nn.ReLU(),
            nn.Identity(),
        )

    def forward(self, x):
        gh = x.shape[2] // self.pretrained.model.patch_size
        gw = x.shape[3] // self.pretrained.model.patch_size
        tokens = self.pretrained.model.forward_features_collect(x, self.hooks)
        layers = []
        for i, t in enumerate(tokens):
            post = getattr(self.pretrained, f"act_postprocess{i + 1}")
            h = post[0](t)                      # readout project
            h = h.transpose(1, 2).unflatten(2, (gh, gw))
            h = post[3:](h)                     # 1x1 proj + resize
            layers.append(h)
        l1 = self.scratch.layer1_rn(layers[0])
        l2 = self.scratch.layer2_rn(layers[1])
        l3 = self.scratch.layer3_rn(layers[2])
        l4 = self.scratch.layer4_rn(layers[3])
        p4 = self.scratch.refinenet4(l4, size=l3.shape[2:])
        p3 = self.scratch.refinenet3(p4, l3, size=l2.shape[2:])
        p2 = self.scratch.refinenet2(p3, l2, size=l1.shape[2:])
        p1 = self.scratch.refinenet1(p2, l1)
        out = self.scratch.output_conv[0](p1)
        out = F.interpolate(out, scale_factor=2, mode="bilinear",
                            align_corners=True)
        out = self.scratch.output_conv[2:](out)
        return out.squeeze(1)


# --------------------------------------------------------------------------
# midas_v21: ResNeXt101-32x8d trunk (vendored lib/Resnext_torch reused as
# the torchvision-layout encoder) + classic FeatureFusion decoder
# (dmidas/midas_net.py:13-76, blocks.py:192-207 layer split)
# --------------------------------------------------------------------------

class ResidualConvUnit(nn.Module):
    """dmidas/blocks.py ResidualConvUnit (non-custom)."""

    def __init__(self, features):
        super().__init__()
        self.conv1 = nn.Conv2d(features, features, 3, 1, 1)
        self.conv2 = nn.Conv2d(features, features, 3, 1, 1)

    def forward(self, x):
        out = F.relu(x)
        out = self.conv1(out)
        out = F.relu(out)
        out = self.conv2(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    """dmidas/blocks.py FeatureFusionBlock (non-custom): always creates both
    RCUs (refinenet4's resConfUnit1 exists in checkpoints but is unused)."""

    def __init__(self, features):
        super().__init__()
        self.resConfUnit1 = ResidualConvUnit(features)
        self.resConfUnit2 = ResidualConvUnit(features)

    def forward(self, x, skip=None):
        out = x
        if skip is not None:
            out = out + self.resConfUnit1(skip)
        out = self.resConfUnit2(out)
        return F.interpolate(out, scale_factor=2, mode="bilinear",
                             align_corners=True)


class OracleMidasNet(nn.Module):
    def __init__(self, features=256):
        super().__init__()
        import sys
        sys.path.insert(0, "/root/reference")
        from lib import Resnext_torch
        resnet = Resnext_torch.resnext101_32x8d(pretrained=False)
        self.pretrained = nn.Module()
        self.pretrained.layer1 = nn.Sequential(
            resnet.conv1, resnet.bn1, resnet.relu, resnet.maxpool,
            resnet.layer1)
        self.pretrained.layer2 = resnet.layer2
        self.pretrained.layer3 = resnet.layer3
        self.pretrained.layer4 = resnet.layer4
        self.scratch = nn.Module()
        for i, ch in enumerate([256, 512, 1024, 2048]):
            setattr(self.scratch, f"layer{i + 1}_rn",
                    nn.Conv2d(ch, features, 3, 1, 1, bias=False))
        for i in range(1, 5):
            setattr(self.scratch, f"refinenet{i}", FeatureFusionBlock(features))
        self.scratch.output_conv = nn.Sequential(
            nn.Conv2d(features, 128, 3, 1, 1),
            nn.Identity(),          # Interpolate module (parameter-free)
            nn.Conv2d(128, 32, 3, 1, 1),
            nn.ReLU(),
            nn.Conv2d(32, 1, 1),
            nn.ReLU(),
        )

    def forward(self, x):
        l1 = self.pretrained.layer1(x)
        l2 = self.pretrained.layer2(l1)
        l3 = self.pretrained.layer3(l2)
        l4 = self.pretrained.layer4(l3)
        r1 = self.scratch.layer1_rn(l1)
        r2 = self.scratch.layer2_rn(l2)
        r3 = self.scratch.layer3_rn(l3)
        r4 = self.scratch.layer4_rn(l4)
        p4 = self.scratch.refinenet4(r4)
        p3 = self.scratch.refinenet3(p4, r3)
        p2 = self.scratch.refinenet2(p3, r2)
        p1 = self.scratch.refinenet1(p2, r1)
        out = self.scratch.output_conv[0](p1)
        out = F.interpolate(out, scale_factor=2, mode="bilinear",
                            align_corners=False)   # Interpolate default
        out = self.scratch.output_conv[2:](out)
        return out.squeeze(1)


# --------------------------------------------------------------------------
# dpt_hybrid: timm vit_base_resnet50_384 = ResNetV2 (StdConv2dSame +
# GroupNorm32, non-preact, stages (3,4,9), 'same' stem) feeding ViT-B
# (dmidas/backbones/vit.py:120-242 glue; timm resnetv2 semantics)
# --------------------------------------------------------------------------

def _tf_same_pad(x, k, s):
    ih, iw = x.shape[-2:]
    ph = max(k - s, 0) if ih % s == 0 else max(k - ih % s, 0)
    pw = max(k - s, 0) if iw % s == 0 else max(k - iw % s, 0)
    return F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))


class StdConv2dSame(nn.Conv2d):
    """timm StdConv2dSame: weight standardization (eps 1e-6) + TF SAME."""

    def forward(self, x):
        w = self.weight
        mean = w.mean(dim=(1, 2, 3), keepdim=True)
        var = w.var(dim=(1, 2, 3), keepdim=True, unbiased=False)
        w = (w - mean) / torch.sqrt(var + 1e-6)
        x = _tf_same_pad(x, self.kernel_size[0], self.stride[0])
        return F.conv2d(x, w, self.bias, self.stride, 0)


class GroupNormAct(nn.GroupNorm):
    def __init__(self, ch, act=True):
        super().__init__(32, ch)
        self.act = act

    def forward(self, x):
        x = super().forward(x)
        return F.relu(x) if self.act else x


class RNV2Bottleneck(nn.Module):
    def __init__(self, in_ch, out_ch, stride):
        super().__init__()
        mid = out_ch // 4
        if stride != 1 or in_ch != out_ch:
            self.downsample = nn.Module()
            self.downsample.conv = StdConv2dSame(in_ch, out_ch, 1,
                                                 stride, bias=False)
            self.downsample.norm = GroupNormAct(out_ch, act=False)
        else:
            self.downsample = None
        self.conv1 = StdConv2dSame(in_ch, mid, 1, 1, bias=False)
        self.norm1 = GroupNormAct(mid)
        self.conv2 = StdConv2dSame(mid, mid, 3, stride, bias=False)
        self.norm2 = GroupNormAct(mid)
        self.conv3 = StdConv2dSame(mid, out_ch, 1, 1, bias=False)
        self.norm3 = GroupNormAct(out_ch, act=False)

    def forward(self, x):
        shortcut = x
        if self.downsample is not None:
            shortcut = self.downsample.norm(self.downsample.conv(x))
        h = self.norm1(self.conv1(x))
        h = self.norm2(self.conv2(h))
        h = self.norm3(self.conv3(h))
        return F.relu(h + shortcut)


class RNV2Stage(nn.Module):
    def __init__(self, in_ch, out_ch, n, stride):
        super().__init__()
        blocks = [RNV2Bottleneck(in_ch, out_ch, stride)]
        blocks += [RNV2Bottleneck(out_ch, out_ch, 1) for _ in range(n - 1)]
        self.blocks = nn.Sequential(*blocks)

    def forward(self, x):
        return self.blocks(x)


class OracleHybridVit(nn.Module):
    """pretrained.model twin of timm vit_base_resnet50_384 (key layout per
    convert_dpt_hybrid)."""

    def __init__(self, dim=768, depth=12, img_size=384):
        super().__init__()
        self.patch_size = 16
        self.patch_embed = nn.Module()
        backbone = nn.Module()
        backbone.stem = nn.Module()
        backbone.stem.conv = StdConv2dSame(3, 64, 7, 2, bias=False)
        backbone.stem.norm = GroupNormAct(64)
        backbone.stages = nn.ModuleList([
            RNV2Stage(64, 256, 3, 1),
            RNV2Stage(256, 512, 4, 2),
            RNV2Stage(512, 1024, 9, 2),
        ])
        self.patch_embed.backbone = backbone
        self.patch_embed.proj = nn.Conv2d(1024, dim, 1, 1)
        gs = img_size // 16
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, gs * gs + 1, dim))
        self.blocks = nn.ModuleList(
            [OracleVitBlock(dim, 12) for _ in range(depth)])

    def forward_collect(self, x, vit_hooks=(8, 11)):
        """-> (stage1_out, stage2_out, tokens@hook0, tokens@hook1)."""
        b = self.patch_embed.backbone
        h = b.stem.norm(b.stem.conv(x))
        h = F.max_pool2d(_tf_same_pad(h, 3, 2), 3, 2)
        s1 = b.stages[0](h)
        s2 = b.stages[1](s1)
        s3 = b.stages[2](s2)
        t = self.patch_embed.proj(s3).flatten(2).transpose(1, 2)
        t = torch.cat((self.cls_token.expand(t.shape[0], -1, -1), t), dim=1)
        gh, gw = x.shape[2] // 16, x.shape[3] // 16
        # _resize_pos_embed (dmidas/backbones/vit.py:16-30)
        tok, grid = self.pos_embed[:, :1], self.pos_embed[0, 1:]
        gs_old = int(math.sqrt(grid.shape[0]))
        grid = grid.reshape(1, gs_old, gs_old, -1).permute(0, 3, 1, 2)
        grid = F.interpolate(grid, size=(gh, gw), mode="bilinear")
        grid = grid.permute(0, 2, 3, 1).reshape(1, gh * gw, -1)
        t = t + torch.cat([tok, grid], dim=1)
        outs = []
        for i, blk in enumerate(self.blocks):
            t = blk(t)
            if i in vit_hooks:
                outs.append(t)
        return s1, s2, outs[0], outs[1]


class OracleDPTHybrid(nn.Module):
    """DPTDepthModel(backbone='vitb_rn50_384') twin (dpt_depth.py hooks
    [0,1,8,11]; act_postprocess1/2 Identity, 3 readout+proj, 4 +conv s2)."""

    def __init__(self, img_size=384):
        super().__init__()
        dim, features = 768, 256
        rc = [256, 512, 768, 768]
        self.pretrained = nn.Module()
        self.pretrained.model = OracleHybridVit(dim, 12, img_size)
        self.pretrained.act_postprocess1 = nn.Sequential(
            nn.Identity(), nn.Identity(), nn.Identity())
        self.pretrained.act_postprocess2 = nn.Sequential(
            nn.Identity(), nn.Identity(), nn.Identity())
        self.pretrained.act_postprocess3 = nn.Sequential(
            ProjectReadout(dim), nn.Identity(), nn.Identity(),
            nn.Conv2d(dim, rc[2], 1))
        self.pretrained.act_postprocess4 = nn.Sequential(
            ProjectReadout(dim), nn.Identity(), nn.Identity(),
            nn.Conv2d(dim, rc[3], 1),
            nn.Conv2d(rc[3], rc[3], 3, 2, 1))
        self.scratch = nn.Module()
        for i, ch in enumerate(rc):
            setattr(self.scratch, f"layer{i + 1}_rn",
                    nn.Conv2d(ch, features, 3, 1, 1, bias=False))
        self.scratch.refinenet1 = FeatureFusionBlockCustom(features)
        self.scratch.refinenet2 = FeatureFusionBlockCustom(features)
        self.scratch.refinenet3 = FeatureFusionBlockCustom(features)
        self.scratch.refinenet4 = FeatureFusionBlockCustom(features,
                                                           with_rcu1=False)
        self.scratch.output_conv = nn.Sequential(
            nn.Conv2d(features, features // 2, 3, 1, 1),
            nn.Identity(),
            nn.Conv2d(features // 2, 32, 3, 1, 1),
            nn.ReLU(),
            nn.Conv2d(32, 1, 1),
            nn.ReLU(),
            nn.Identity(),
        )

    def forward(self, x):
        gh, gw = x.shape[2] // 16, x.shape[3] // 16
        s1, s2, t3, t4 = self.pretrained.model.forward_collect(x)
        l3 = self.pretrained.act_postprocess3[0](t3)
        l3 = l3.transpose(1, 2).unflatten(2, (gh, gw))
        l3 = self.pretrained.act_postprocess3[3:](l3)
        l4 = self.pretrained.act_postprocess4[0](t4)
        l4 = l4.transpose(1, 2).unflatten(2, (gh, gw))
        l4 = self.pretrained.act_postprocess4[3:](l4)
        l1 = self.scratch.layer1_rn(s1)
        l2 = self.scratch.layer2_rn(s2)
        l3 = self.scratch.layer3_rn(l3)
        l4 = self.scratch.layer4_rn(l4)
        p4 = self.scratch.refinenet4(l4, size=l3.shape[2:])
        p3 = self.scratch.refinenet3(p4, l3, size=l2.shape[2:])
        p2 = self.scratch.refinenet2(p3, l2, size=l1.shape[2:])
        p1 = self.scratch.refinenet1(p2, l1)
        out = self.scratch.output_conv[0](p1)
        out = F.interpolate(out, scale_factor=2, mode="bilinear",
                            align_corners=True)
        out = self.scratch.output_conv[2:](out)
        return out.squeeze(1)


# --------------------------------------------------------------------------
# midas_v21_small: gen-efficientnet tf_efficientnet_lite3 (TF SAME padding,
# BN eps 1e-3, ReLU6, no SE) split per dmidas/blocks.py:179-190, + expand
# FeatureFusion decoder (dmidas/midas_net_custom.py:12-105)
# --------------------------------------------------------------------------

def _lite_round_channels(c, divisor=8):
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return new_c


class Conv2dSameTF(nn.Conv2d):
    """nn.Conv2d with TF SAME padding applied in forward (gen-efficientnet
    tf_ variants)."""

    def forward(self, x):
        x = _tf_same_pad(x, self.kernel_size[0], self.stride[0])
        return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                        self.dilation, self.groups)


class DSBlock(nn.Module):
    """DepthwiseSeparableConv (stage 0): conv_dw/bn1/act + conv_pw/bn2."""

    def __init__(self, in_ch, out_ch, k, s):
        super().__init__()
        self.conv_dw = Conv2dSameTF(in_ch, in_ch, k, s, groups=in_ch,
                                    bias=False)
        self.bn1 = nn.BatchNorm2d(in_ch, eps=1e-3)
        self.conv_pw = Conv2dSameTF(in_ch, out_ch, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_ch, eps=1e-3)
        self.residual = s == 1 and in_ch == out_ch

    def forward(self, x):
        h = F.relu6(self.bn1(self.conv_dw(x)))
        h = self.bn2(self.conv_pw(h))
        return h + x if self.residual else h


class IRBlock(nn.Module):
    """InvertedResidual: conv_pw/bn1/act + conv_dw/bn2/act + conv_pwl/bn3."""

    def __init__(self, in_ch, out_ch, k, s, expand):
        super().__init__()
        mid = in_ch * expand
        self.conv_pw = Conv2dSameTF(in_ch, mid, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid, eps=1e-3)
        self.conv_dw = Conv2dSameTF(mid, mid, k, s, groups=mid, bias=False)
        self.bn2 = nn.BatchNorm2d(mid, eps=1e-3)
        self.conv_pwl = Conv2dSameTF(mid, out_ch, 1, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out_ch, eps=1e-3)
        self.residual = s == 1 and in_ch == out_ch

    def forward(self, x):
        h = F.relu6(self.bn1(self.conv_pw(x)))
        h = F.relu6(self.bn2(self.conv_dw(h)))
        h = self.bn3(self.conv_pwl(h))
        return h + x if self.residual else h


def _lite3_stages():
    """(kernel, stride, expand, out_ch, repeats) per stage, width 1.2 /
    depth 1.4, first/last repeats unscaled (EfficientNet-Lite recipe)."""
    base = [(3, 1, 1, 16, 1), (3, 2, 6, 24, 2), (5, 2, 6, 40, 2),
            (3, 2, 6, 80, 3), (5, 1, 6, 112, 3), (5, 2, 6, 192, 4),
            (3, 1, 6, 320, 1)]
    out = []
    for i, (k, s, e, c, n) in enumerate(base):
        c = _lite_round_channels(c * 1.2)
        if i not in (0, len(base) - 1):
            n = math.ceil(n * 1.4)
        out.append((k, s, e, c, n))
    return out


class OracleMidasSmall(nn.Module):
    def __init__(self, features=64):
        super().__init__()
        stages = _lite3_stages()
        stem = Conv2dSameTF(3, 32, 3, 2, bias=False)
        bn1 = nn.BatchNorm2d(32, eps=1e-3)
        blocks = []
        in_ch = 32
        for (k, s, e, c, n) in stages:
            stage = []
            for bi in range(n):
                stride = s if bi == 0 else 1
                if e == 1:
                    stage.append(DSBlock(in_ch, c, k, stride))
                else:
                    stage.append(IRBlock(in_ch, c, k, stride, e))
                in_ch = c
            blocks.append(nn.Sequential(*stage))

        # dmidas split: layer1 = [conv_stem, bn1, act1, blocks0, blocks1]
        act1 = nn.ReLU6()
        self.pretrained = nn.Module()
        self.pretrained.layer1 = nn.Sequential(stem, bn1, act1, blocks[0],
                                               blocks[1])
        self.pretrained.layer2 = nn.Sequential(blocks[2])
        self.pretrained.layer3 = nn.Sequential(blocks[3], blocks[4])
        self.pretrained.layer4 = nn.Sequential(blocks[5], blocks[6])

        F_ = features
        rc = [32, 48, 136, 384]
        outc = [F_, F_ * 2, F_ * 4, F_ * 8]   # expand scratch
        self.scratch = nn.Module()
        for i in range(4):
            setattr(self.scratch, f"layer{i + 1}_rn",
                    nn.Conv2d(rc[i], outc[i], 3, 1, 1, bias=False))

        class FFBExpand(nn.Module):
            """FeatureFusionBlock_custom(expand=True): out_conv halves
            channels; scale-2 upsample (no size arg in midas_small)."""

            def __init__(self, feats, expand=True, with_rcu1=True):
                super().__init__()
                out_feats = feats // 2 if expand else feats
                self.out_conv = nn.Conv2d(feats, out_feats, 1)
                if with_rcu1:
                    self.resConfUnit1 = ResidualConvUnitCustom(feats)
                self.resConfUnit2 = ResidualConvUnitCustom(feats)

            def forward(self, x, skip=None):
                out = x
                if skip is not None:
                    out = out + self.resConfUnit1(skip)
                out = self.resConfUnit2(out)
                out = F.interpolate(out, scale_factor=2, mode="bilinear",
                                    align_corners=True)
                return self.out_conv(out)

        self.scratch.refinenet4 = FFBExpand(F_ * 8, True, with_rcu1=False)
        self.scratch.refinenet3 = FFBExpand(F_ * 4, True)
        self.scratch.refinenet2 = FFBExpand(F_ * 2, True)
        self.scratch.refinenet1 = FFBExpand(F_, False)
        self.scratch.output_conv = nn.Sequential(
            nn.Conv2d(F_, F_ // 2, 3, 1, 1),
            nn.Identity(),
            nn.Conv2d(F_ // 2, 32, 3, 1, 1),
            nn.ReLU(),
            nn.Conv2d(32, 1, 1),
            nn.ReLU(),
            nn.Identity(),
        )

    def forward(self, x):
        l1 = self.pretrained.layer1(x)
        l2 = self.pretrained.layer2(l1)
        l3 = self.pretrained.layer3(l2)
        l4 = self.pretrained.layer4(l3)
        r1 = self.scratch.layer1_rn(l1)
        r2 = self.scratch.layer2_rn(l2)
        r3 = self.scratch.layer3_rn(l3)
        r4 = self.scratch.layer4_rn(l4)
        p4 = self.scratch.refinenet4(r4)
        p3 = self.scratch.refinenet3(p4, r3)
        p2 = self.scratch.refinenet2(p3, r2)
        p1 = self.scratch.refinenet1(p2, r1)
        out = self.scratch.output_conv[0](p1)
        out = F.interpolate(out, scale_factor=2, mode="bilinear",
                            align_corners=False)
        out = self.scratch.output_conv[2:](out)
        return out.squeeze(1)
