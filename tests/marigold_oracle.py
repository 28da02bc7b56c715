"""Hand-written torch oracles with the DIFFUSERS checkpoint key layout for
the Marigold stack (SD2 AutoencoderKL + UNet2DConditionModel + DDIM).

diffusers is not installed in this environment, so — exactly like the timm
oracles in tests/torch_oracles.py — these are independent torch
reimplementations of the documented reference math
(dmarigold/marigold/marigold_pipeline.py:89-359 drives them through the
diffusers API) that reproduce the *state_dict key layout* of the shipped
Bingxin/Marigold checkpoint, so `depthmap_tpu/models/marigold/convert.py`
is exercised end-to-end on a real-layout state dict.

Scaled-down configs (base channels, context dim) keep CI fast; the layout
(4 levels, 2 resnets/level, 3 up-resnets, linear transformer projections,
GEGLU) is the SD2 one.  Test-only code; never shipped.
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# shared blocks
# ---------------------------------------------------------------------------

class ResnetBlock(nn.Module):
    """diffusers ResnetBlock2D: GN(32) -> silu -> conv -> [+temb] -> GN ->
    silu -> conv, 1x1 conv_shortcut when channels change."""

    def __init__(self, in_ch, out_ch, temb_ch=None, eps=1e-6):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        if temb_ch:
            self.time_emb_proj = nn.Linear(temb_ch, out_ch)
        self.norm2 = nn.GroupNorm(32, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class VaeAttention(nn.Module):
    """diffusers Attention in the VAE mid block: single head, linear
    to_q/to_k/to_v/to_out.0 over (N, HW, C), residual add."""

    def __init__(self, ch):
        super().__init__()
        self.group_norm = nn.GroupNorm(32, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])

    def forward(self, x):
        n, c, h, w = x.shape
        y = self.group_norm(x).reshape(n, c, h * w).transpose(1, 2)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        a = torch.softmax(q @ k.transpose(1, 2) * c ** -0.5, dim=-1)
        o = self.to_out[0](a @ v)
        return x + o.transpose(1, 2).reshape(n, c, h, w)


class _Downsampler(nn.Module):
    def __init__(self, ch, pad):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=pad)
        self.asymmetric = pad == 0

    def forward(self, x):
        if self.asymmetric:    # VAE: F.pad (0,1,0,1) then VALID stride-2
            x = F.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class _Upsampler(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class _Container(nn.Module):
    """Attribute bag so state_dict paths like down_blocks.0.resnets.1.…
    come out exactly as diffusers emits them."""


# ---------------------------------------------------------------------------
# AutoencoderKL
# ---------------------------------------------------------------------------

class OracleAutoencoderKL(nn.Module):
    def __init__(self, base=32, mults=(1, 2, 4, 4), latent=4):
        super().__init__()
        chans = [base * m for m in mults]

        enc = _Container()
        enc.conv_in = nn.Conv2d(3, chans[0], 3, padding=1)
        enc.down_blocks = nn.ModuleList()
        prev = chans[0]
        for i, ch in enumerate(chans):
            blk = _Container()
            blk.resnets = nn.ModuleList(
                [ResnetBlock(prev if j == 0 else ch, ch) for j in range(2)])
            if i < len(chans) - 1:
                blk.downsamplers = nn.ModuleList([_Downsampler(ch, pad=0)])
            enc.down_blocks.append(blk)
            prev = ch
        enc.mid_block = _Container()
        enc.mid_block.resnets = nn.ModuleList(
            [ResnetBlock(prev, prev), ResnetBlock(prev, prev)])
        enc.mid_block.attentions = nn.ModuleList([VaeAttention(prev)])
        enc.conv_norm_out = nn.GroupNorm(32, prev, eps=1e-6)
        enc.conv_out = nn.Conv2d(prev, 2 * latent, 3, padding=1)
        self.encoder = enc
        self.quant_conv = nn.Conv2d(2 * latent, 2 * latent, 1)
        self.post_quant_conv = nn.Conv2d(latent, latent, 1)

        dec = _Container()
        rev = list(reversed(chans))
        dec.conv_in = nn.Conv2d(latent, rev[0], 3, padding=1)
        dec.mid_block = _Container()
        dec.mid_block.resnets = nn.ModuleList(
            [ResnetBlock(rev[0], rev[0]), ResnetBlock(rev[0], rev[0])])
        dec.mid_block.attentions = nn.ModuleList([VaeAttention(rev[0])])
        dec.up_blocks = nn.ModuleList()
        prev = rev[0]
        for k, ch in enumerate(rev):
            blk = _Container()
            blk.resnets = nn.ModuleList(
                [ResnetBlock(prev if j == 0 else ch, ch) for j in range(3)])
            if k < len(rev) - 1:
                blk.upsamplers = nn.ModuleList([_Upsampler(ch)])
            dec.up_blocks.append(blk)
            prev = ch
        dec.conv_norm_out = nn.GroupNorm(32, prev, eps=1e-6)
        dec.conv_out = nn.Conv2d(prev, 3, 3, padding=1)
        self.decoder = dec

    def encode_moments(self, x):
        e = self.encoder
        h = e.conv_in(x)
        for blk in e.down_blocks:
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
        h = e.mid_block.resnets[0](h)
        h = e.mid_block.attentions[0](h)
        h = e.mid_block.resnets[1](h)
        h = e.conv_out(F.silu(e.conv_norm_out(h)))
        moments = self.quant_conv(h)
        mean, logvar = torch.chunk(moments, 2, dim=1)
        return mean, logvar

    def decode(self, z):
        d = self.decoder
        h = d.conv_in(self.post_quant_conv(z))
        h = d.mid_block.resnets[0](h)
        h = d.mid_block.attentions[0](h)
        h = d.mid_block.resnets[1](h)
        for blk in d.up_blocks:
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        return d.conv_out(F.silu(d.conv_norm_out(h)))


# ---------------------------------------------------------------------------
# UNet2DConditionModel (SD2 shape: linear transformer projections, GEGLU,
# 64-dim heads -> here dim_head configurable)
# ---------------------------------------------------------------------------

class CrossAttention(nn.Module):
    def __init__(self, q_dim, ctx_dim, heads, dim_head):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head = heads, dim_head
        self.to_q = nn.Linear(q_dim, inner, bias=False)
        self.to_k = nn.Linear(ctx_dim, inner, bias=False)
        self.to_v = nn.Linear(ctx_dim, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, q_dim)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        b, n, _ = x.shape
        m = ctx.shape[1]
        H, D = self.heads, self.dim_head

        def split(t, length):
            return t.reshape(b, length, H, D).permute(0, 2, 1, 3)
        q = split(self.to_q(x), n) * D ** -0.5
        k = split(self.to_k(ctx), m)
        v = split(self.to_v(ctx), m)
        a = torch.softmax(q @ k.transpose(-1, -2), dim=-1)
        o = (a @ v).permute(0, 2, 1, 3).reshape(b, n, H * D)
        return self.to_out[0](o)


class _GEGLU(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, ctx_dim, heads, dim_head):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = CrossAttention(dim, dim, heads, dim_head)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = CrossAttention(dim, ctx_dim, heads, dim_head)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = _Container()
        self.ff.net = nn.ModuleList(
            [_GEGLU(dim, dim * 4), nn.Identity(), nn.Linear(dim * 4, dim)])

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        x = x + self.ff.net[2](self.ff.net[0](self.norm3(x)))
        return x


class Transformer2D(nn.Module):
    """SD2 Transformer2DModel with use_linear_projection=True."""

    def __init__(self, ch, ctx_dim, heads, dim_head):
        super().__init__()
        self.norm = nn.GroupNorm(32, ch, eps=1e-6)
        self.proj_in = nn.Linear(ch, ch)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(ch, ctx_dim, heads, dim_head)])
        self.proj_out = nn.Linear(ch, ch)

    def forward(self, x, ctx):
        n, c, h, w = x.shape
        res = x
        y = self.norm(x).reshape(n, c, h * w).transpose(1, 2)
        y = self.proj_in(y)
        for blk in self.transformer_blocks:
            y = blk(y, ctx)
        y = self.proj_out(y)
        return res + y.transpose(1, 2).reshape(n, c, h, w)


class OracleMarigoldUNet(nn.Module):
    def __init__(self, base=32, mults=(1, 2, 4, 4), in_ch=8, out_ch=4,
                 ctx_dim=32, dim_head=8):
        super().__init__()
        chans = [base * m for m in mults]
        temb_ch = base * 4
        self.conv_in = nn.Conv2d(in_ch, chans[0], 3, padding=1)
        self.time_embedding = _Container()
        self.time_embedding.linear_1 = nn.Linear(base, temb_ch)
        self.time_embedding.linear_2 = nn.Linear(temb_ch, temb_ch)
        self.base = base

        self.down_blocks = nn.ModuleList()
        prev = chans[0]
        for i, ch in enumerate(chans):
            blk = _Container()
            blk.resnets = nn.ModuleList(
                [ResnetBlock(prev if j == 0 else ch, ch, temb_ch, eps=1e-5)
                 for j in range(2)])
            if i < len(chans) - 1:
                blk.attentions = nn.ModuleList(
                    [Transformer2D(ch, ctx_dim, ch // dim_head, dim_head)
                     for _ in range(2)])
                blk.downsamplers = nn.ModuleList([_Downsampler(ch, pad=1)])
            self.down_blocks.append(blk)
            prev = ch

        mid = _Container()
        mid.resnets = nn.ModuleList(
            [ResnetBlock(prev, prev, temb_ch, eps=1e-5),
             ResnetBlock(prev, prev, temb_ch, eps=1e-5)])
        mid.attentions = nn.ModuleList(
            [Transformer2D(prev, ctx_dim, prev // dim_head, dim_head)])
        self.mid_block = mid

        # skip-channel bookkeeping for the up path
        skip_chans = [chans[0]]
        for i, ch in enumerate(chans):
            skip_chans += [ch, ch]
            if i < len(chans) - 1:
                skip_chans.append(ch)

        self.up_blocks = nn.ModuleList()
        rev = list(reversed(chans))
        prev = rev[0]
        for k, ch in enumerate(rev):
            blk = _Container()
            resnets = []
            for j in range(3):
                skip = skip_chans.pop()
                resnets.append(ResnetBlock(prev + skip, ch, temb_ch,
                                           eps=1e-5))
                prev = ch
            blk.resnets = nn.ModuleList(resnets)
            if k > 0:
                blk.attentions = nn.ModuleList(
                    [Transformer2D(ch, ctx_dim, ch // dim_head, dim_head)
                     for _ in range(3)])
            if k < len(rev) - 1:
                blk.upsamplers = nn.ModuleList([_Upsampler(ch)])
            self.up_blocks.append(blk)

        self.conv_norm_out = nn.GroupNorm(32, chans[0], eps=1e-5)
        self.conv_out = nn.Conv2d(chans[0], out_ch, 3, padding=1)

    def _time_embed(self, t):
        half = self.base // 2
        freqs = torch.exp(-math.log(10000.0)
                          * torch.arange(half, dtype=torch.float32) / half)
        args = t[:, None].float() * freqs[None]
        emb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
        emb = self.time_embedding.linear_1(emb)
        return self.time_embedding.linear_2(F.silu(emb))

    def forward(self, x, t, ctx):
        temb = self._time_embed(t)
        h = self.conv_in(x)
        skips = [h]
        for blk in self.down_blocks:
            for j, r in enumerate(blk.resnets):
                h = r(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ctx)
                skips.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
                skips.append(h)
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, ctx)
        h = self.mid_block.resnets[1](h, temb)
        for blk in self.up_blocks:
            for j, r in enumerate(blk.resnets):
                h = r(torch.cat([h, skips.pop()], dim=1), temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ctx)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


# ---------------------------------------------------------------------------
# DDIMScheduler (diffusers semantics: scaled_linear betas,
# set_alpha_to_one=False, steps_offset=1, clip_sample=False, eta=0)
# ---------------------------------------------------------------------------

class OracleDDIMScheduler:
    def __init__(self, num_train_timesteps=1000, beta_start=0.00085,
                 beta_end=0.012, prediction_type="v_prediction",
                 steps_offset=1):
        betas = torch.linspace(beta_start ** 0.5, beta_end ** 0.5,
                               num_train_timesteps,
                               dtype=torch.float64) ** 2
        self.alphas_cumprod = torch.cumprod(1.0 - betas, dim=0)
        self.final_alpha_cumprod = self.alphas_cumprod[0]
        self.num_train_timesteps = num_train_timesteps
        self.prediction_type = prediction_type
        self.steps_offset = steps_offset
        self.timesteps = None

    def set_timesteps(self, n):
        step = self.num_train_timesteps // n
        self.timesteps = ((np.arange(0, n) * step).round()[::-1].copy()
                          .astype(np.int64) + self.steps_offset)
        return self.timesteps

    def step(self, model_output, timestep, sample):
        prev_t = timestep - self.num_train_timesteps // len(self.timesteps)
        a_t = self.alphas_cumprod[timestep].item()
        a_prev = (self.alphas_cumprod[prev_t].item() if prev_t >= 0
                  else self.final_alpha_cumprod.item())
        sqrt_at, sqrt_1mat = a_t ** 0.5, (1 - a_t) ** 0.5
        if self.prediction_type == "v_prediction":
            pred_x0 = sqrt_at * sample - sqrt_1mat * model_output
            eps = sqrt_at * model_output + sqrt_1mat * sample
        else:
            pred_x0 = (sample - sqrt_1mat * model_output) / sqrt_at
            eps = model_output
        return a_prev ** 0.5 * pred_x0 + (1 - a_prev) ** 0.5 * eps, pred_x0
