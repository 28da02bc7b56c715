"""Stable-Diffusion AutoencoderKL (the Marigold VAE) in flax.

Standard SD architecture: 128 base channels, multipliers (1, 2, 4, 4), two
ResnetBlocks per level, mid block with single-head attention, GroupNorm(32) +
SiLU.  Encoder produces 2*4 moments (mean/logvar); Marigold uses the mean
(reference dmarigold/marigold/marigold_pipeline.py:300-317 encode,
:345-359 decode).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

VAE_SCALE = 0.18215


def gn(x, name=None, groups=32):
    return nn.GroupNorm(num_groups=groups, epsilon=1e-6, name=name)(x)


class ResnetBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x):
        h = nn.silu(nn.GroupNorm(32, epsilon=1e-6, name="norm1")(x))
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv1")(h)
        h = nn.silu(nn.GroupNorm(32, epsilon=1e-6, name="norm2")(h))
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        y = nn.GroupNorm(32, epsilon=1e-6, name="norm")(x)
        q = nn.Dense(c, name="q")(y.reshape(n, h * w, c))
        k = nn.Dense(c, name="k")(y.reshape(n, h * w, c))
        v = nn.Dense(c, name="v")(y.reshape(n, h * w, c))
        a = jax.nn.softmax(
            jnp.einsum("bnc,bmc->bnm", q, k,
                       preferred_element_type=jnp.float32) * c ** -0.5,
            axis=-1).astype(v.dtype)
        o = jnp.einsum("bnm,bmc->bnc", a, v)
        o = nn.Dense(c, name="proj_out")(o)
        return x + o.reshape(n, h, w, c)


class Encoder(nn.Module):
    base: int = 128
    mults: Sequence[int] = (1, 2, 4, 4)
    latent_ch: int = 4

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.base, (3, 3), padding=1, name="conv_in")(x)
        for i, m in enumerate(self.mults):
            ch = self.base * m
            for j in range(2):
                h = ResnetBlock(ch, name=f"down{i}_block{j}")(h)
            if i < len(self.mults) - 1:
                # SD uses asymmetric (0,1) pad + stride-2 conv
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            name=f"down{i}_downsample")(h)
        h = ResnetBlock(h.shape[-1], name="mid_block1")(h)
        h = AttnBlock(name="mid_attn")(h)
        h = ResnetBlock(h.shape[-1], name="mid_block2")(h)
        h = nn.silu(nn.GroupNorm(32, epsilon=1e-6, name="norm_out")(h))
        h = nn.Conv(2 * self.latent_ch, (3, 3), padding=1,
                    name="conv_out")(h)
        h = nn.Conv(2 * self.latent_ch, (1, 1), name="quant_conv")(h)
        mean, logvar = jnp.split(h, 2, axis=-1)
        return mean, logvar


class Decoder(nn.Module):
    base: int = 128
    mults: Sequence[int] = (1, 2, 4, 4)

    @nn.compact
    def __call__(self, z):
        h = nn.Conv(z.shape[-1], (1, 1), name="post_quant_conv")(z)
        ch = self.base * self.mults[-1]
        h = nn.Conv(ch, (3, 3), padding=1, name="conv_in")(h)
        h = ResnetBlock(ch, name="mid_block1")(h)
        h = AttnBlock(name="mid_attn")(h)
        h = ResnetBlock(ch, name="mid_block2")(h)
        for i, m in reversed(list(enumerate(self.mults))):
            ch = self.base * m
            for j in range(3):
                h = ResnetBlock(ch, name=f"up{i}_block{j}")(h)
            if i > 0:
                n, hh, ww, cc = h.shape
                h = jax.image.resize(h, (n, hh * 2, ww * 2, cc), "nearest")
                h = nn.Conv(cc, (3, 3), padding=1, name=f"up{i}_upsample")(h)
        h = nn.silu(nn.GroupNorm(32, epsilon=1e-6, name="norm_out")(h))
        return nn.Conv(3, (3, 3), padding=1, name="conv_out")(h)
