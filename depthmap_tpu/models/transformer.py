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


class _DenseParams(nn.Module):
    """Kernel/bias holder with nn.Dense's exact param tree (so converted
    checkpoints keyed 'qkv/kernel' etc. load unchanged) — the contraction
    itself is expressed by the caller, which lets Attention emit q/k/v
    straight into the (B, H, N, D) kernel layout."""
    in_features: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,)) if self.use_bias else None
        return kernel, bias


class Attention(nn.Module):
    """MHSA.  qkv packed like timm; BEiT flavor has a trainable q/v bias and
    a fixed all-zero k bias (k_bias non-trainable in the checkpoint).

    Layout: q/k/v are emitted directly in (B, H, N, D) by per-slice einsums
    of the packed qkv kernel, and the attention output is consumed by an
    (H, D, C) einsum out-projection — no (B,N,3,H,D)->(3,B,H,N,D) moveaxis
    and no output transpose.  Measured on v5e at BEiT-L-512 b8: 76.2 ->
    69.4 ms per 24-block stack vs the packed-dense + moveaxis formulation
    (benchmarks/block_fusion.py); same contraction lengths, so numerics
    shift only by f32-accumulation ordering."""
    num_heads: int
    qkv_bias: bool = True
    beit_style_bias: bool = False   # q_bias/v_bias trainable, k zero
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, bias: Optional[jax.Array] = None):
        b, n, c = x.shape
        h = self.num_heads
        d = c // h
        use_plain_bias = self.qkv_bias and not self.beit_style_bias
        wqkv, bqkv = _DenseParams(c, 3 * c, use_plain_bias, name="qkv")()
        if self.beit_style_bias:
            q_bias = self.param("q_bias", nn.initializers.zeros, (c,))
            v_bias = self.param("v_bias", nn.initializers.zeros, (c,))
        elif use_plain_bias:
            q_bias = bqkv[:c]
            v_bias = bqkv[2 * c:]
        wq = wqkv[:, :c].reshape(c, h, d)
        wk = wqkv[:, c:2 * c].reshape(c, h, d)
        wv = wqkv[:, 2 * c:].reshape(c, h, d)
        q = jnp.einsum("bnc,chd->bhnd", x, wq)
        k = jnp.einsum("bnc,chd->bhnd", x, wk)
        v = jnp.einsum("bnc,chd->bhnd", x, wv)
        if self.beit_style_bias or use_plain_bias:
            q = q + q_bias.reshape(h, d)[None, :, None]
            v = v + v_bias.reshape(h, d)[None, :, None]
            if use_plain_bias:
                k = k + bqkv[c:2 * c].reshape(h, d)[None, :, None]
        out = attention(q, k, v, bias=bias, impl=self.attn_impl)
        wproj, bproj = _DenseParams(c, c, True, name="proj")()
        return jnp.einsum("bhnd,hdc->bnc", out,
                          wproj.reshape(h, d, c)) + bproj


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
