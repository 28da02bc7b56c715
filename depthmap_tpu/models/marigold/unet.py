"""SD2-style UNet2DConditionModel for Marigold, in flax.

Marigold's UNet takes an 8-channel latent (RGB latent ++ noisy depth latent,
reference dmarigold/marigold/marigold_pipeline.py:300-317) and the empty-
prompt CLIP embedding (1024-dim context).  Architecture: channels
(320, 640, 1280, 1280), three CrossAttnDownBlocks + DownBlock, mid with
cross-attn, mirrored up path, 64-dim attention heads, GEGLU feed-forward.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def timestep_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class ResBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x, temb):
        h = nn.silu(nn.GroupNorm(32, epsilon=1e-5, name="norm1")(x))
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv1")(h)
        h = h + nn.Dense(self.out_ch, name="time_emb_proj")(
            nn.silu(temb))[:, None, None, :]
        h = nn.silu(nn.GroupNorm(32, epsilon=1e-5, name="norm2")(h))
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="shortcut")(x)
        return x + h


class CrossAttention(nn.Module):
    heads: int
    dim_head: int = 64

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, name="to_v")(context)
        b, n, _ = q.shape
        m = k.shape[1]

        def heads(t, length):
            return t.reshape(b, length, self.heads, self.dim_head
                             ).transpose(0, 2, 1, 3)
        # shared dispatcher: XLA softmax for small N / tiny-kv cross-attn,
        # Pallas flash for the large-N self-attention at the top latent
        # levels (SD2 keeps attention at the full latent resolution — the
        # materialized scores would dominate the whole pipeline's runtime)
        from depthmap_tpu.models.attention import attention
        o = attention(heads(q, n), heads(k, m), heads(v, m),
                      scale=self.dim_head ** -0.5)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return nn.Dense(x.shape[-1], name="to_out")(o)


class GEGLU(nn.Module):
    dim_out: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, name="proj")(x)
        a, g = jnp.split(h, 2, axis=-1)
        return a * nn.gelu(g, approximate=False)


class TransformerBlock(nn.Module):
    heads: int
    dim_head: int = 64

    @nn.compact
    def __call__(self, x, context):
        # torch nn.LayerNorm default eps (1e-5), not flax's 1e-6
        x = x + CrossAttention(self.heads, self.dim_head, name="attn1")(
            nn.LayerNorm(epsilon=1e-5, name="norm1")(x))
        x = x + CrossAttention(self.heads, self.dim_head, name="attn2")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x), context)
        h = nn.LayerNorm(epsilon=1e-5, name="norm3")(x)
        h = GEGLU(x.shape[-1] * 4, name="ff_geglu")(h)
        x = x + nn.Dense(x.shape[-1], name="ff_out")(h)
        return x


class SpatialTransformer(nn.Module):
    heads: int
    dim_head: int = 64
    depth: int = 1

    @nn.compact
    def __call__(self, x, context):
        n, h, w, c = x.shape
        res = x
        x = nn.GroupNorm(32, epsilon=1e-6, name="norm")(x)
        x = x.reshape(n, h * w, c)
        x = nn.Dense(c, name="proj_in")(x)   # SD2 uses linear projections
        for i in range(self.depth):
            x = TransformerBlock(self.heads, self.dim_head,
                                 name=f"block{i}")(x, context)
        x = nn.Dense(c, name="proj_out")(x)
        return res + x.reshape(n, h, w, c)


class MarigoldUNet(nn.Module):
    in_channels: int = 8
    out_channels: int = 4
    base: int = 320
    mults: Sequence[int] = (1, 2, 4, 4)
    context_dim: int = 1024
    dim_head: int = 64

    @nn.compact
    def __call__(self, x, t, context):
        """x: (N, H, W, 8); t: (N,) timesteps; context: (N, 77, 1024)."""
        temb = timestep_embedding(t, self.base)
        temb = nn.Dense(self.base * 4, name="time_fc1")(temb)
        temb = nn.Dense(self.base * 4, name="time_fc2")(nn.silu(temb))

        h = nn.Conv(self.base, (3, 3), padding=1, name="conv_in")(x)
        skips = [h]
        # down
        for i, m in enumerate(self.mults):
            ch = self.base * m
            attn = i < len(self.mults) - 1
            for j in range(2):
                h = ResBlock(ch, name=f"down{i}_res{j}")(h, temb)
                if attn:
                    h = SpatialTransformer(
                        ch // self.dim_head, self.dim_head,
                        name=f"down{i}_attn{j}")(h, context)
                skips.append(h)
            if i < len(self.mults) - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1,
                            name=f"down{i}_downsample")(h)
                skips.append(h)
        # mid
        ch = self.base * self.mults[-1]
        h = ResBlock(ch, name="mid_res0")(h, temb)
        h = SpatialTransformer(ch // self.dim_head, self.dim_head,
                               name="mid_attn")(h, context)
        h = ResBlock(ch, name="mid_res1")(h, temb)
        # up
        for i, m in reversed(list(enumerate(self.mults))):
            ch = self.base * m
            attn = i < len(self.mults) - 1
            for j in range(3):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = ResBlock(ch, name=f"up{i}_res{j}")(h, temb)
                if attn:
                    h = SpatialTransformer(
                        ch // self.dim_head, self.dim_head,
                        name=f"up{i}_attn{j}")(h, context)
            if i > 0:
                n, hh, ww, cc = h.shape
                # upsample to the NEXT SKIP's spatial size, not blind 2x —
                # diffusers passes upsample_size from the skip stack when
                # dims aren't divisible by 2^levels (UNet2DConditionModel
                # forward_upsample_size); blind doubling breaks odd latents
                th, tw = skips[-1].shape[1:3]
                h = jax.image.resize(h, (n, th, tw, cc), "nearest")
                h = nn.Conv(cc, (3, 3), padding=1, name=f"up{i}_upsample")(h)

        h = nn.silu(nn.GroupNorm(32, epsilon=1e-5, name="norm_out")(h))
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       name="conv_out")(h)
