"""Shared transformer building blocks for the ViT-family backbones
(ViT-L/B, BEiT, DINOv2): patch embedding, MHSA with optional q/k/v bias
asymmetry and additive attention bias, MLP, layer-scaled residual blocks."""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from depthmap_tpu.models.attention import attention


class PatchEmbed(nn.Module):
    """Conv patchify: (N, H, W, 3) -> (N, h*w, C)."""
    embed_dim: int
    patch_size: int = 16

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    name="proj")(x)
        n, h, w, c = x.shape
        return x.reshape(n, h * w, c), (h, w)


class Mlp(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out, name="fc2")(x)
        return x


class Attention(nn.Module):
    """MHSA.  qkv packed like timm; BEiT flavor has a trainable q/v bias and
    a fixed all-zero k bias (k_bias non-trainable in the checkpoint)."""
    num_heads: int
    qkv_bias: bool = True
    beit_style_bias: bool = False   # q_bias/v_bias trainable, k zero
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, bias: Optional[jax.Array] = None):
        b, n, c = x.shape
        d = c // self.num_heads
        use_plain_bias = self.qkv_bias and not self.beit_style_bias
        qkv = nn.Dense(3 * c, use_bias=use_plain_bias, name="qkv")(x)
        if self.beit_style_bias:
            q_bias = self.param("q_bias", nn.initializers.zeros, (c,))
            v_bias = self.param("v_bias", nn.initializers.zeros, (c,))
            qkv = qkv + jnp.concatenate(
                [q_bias, jnp.zeros_like(q_bias), v_bias])
        qkv = qkv.reshape(b, n, 3, self.num_heads, d)
        q, k, v = (jnp.moveaxis(qkv, (2, 3), (0, 2))[i] for i in range(3))
        out = attention(q, k, v, bias=bias, impl=self.attn_impl)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, name="proj")(out)


class Block(nn.Module):
    """Pre-norm transformer block with optional layer scale (BEiT gamma)."""
    num_heads: int
    mlp_ratio: float = 4.0
    layer_scale: bool = False
    beit_style_bias: bool = False
    qkv_bias: bool = True
    ln_eps: float = 1e-6

    @nn.compact
    def __call__(self, x, bias: Optional[jax.Array] = None):
        c = x.shape[-1]
        h = nn.LayerNorm(epsilon=self.ln_eps, name="norm1")(x)
        h = Attention(self.num_heads, qkv_bias=self.qkv_bias,
                      beit_style_bias=self.beit_style_bias,
                      name="attn")(h, bias)
        if self.layer_scale:
            gamma_1 = self.param("gamma_1", nn.initializers.ones, (c,))
            h = gamma_1 * h
        x = x + h
        h = nn.LayerNorm(epsilon=self.ln_eps, name="norm2")(x)
        h = Mlp(int(c * self.mlp_ratio), c, name="mlp")(h)
        if self.layer_scale:
            gamma_2 = self.param("gamma_2", nn.initializers.ones, (c,))
            h = gamma_2 * h
        return x + h
