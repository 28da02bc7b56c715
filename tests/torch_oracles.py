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
