"""DINOv2 vision transformer backbone (Depth Anything v1/v2 encoder).

Semantics per reference ddepth_anything_v2/depth_anything_v2/dinov2.py:
 * patch 14, img_size 518 (37x37 grid + cls), LayerScale init 1.0, pre-norm
   blocks, LayerNorm eps 1e-6, plain MLP FFN (SwiGLU only for vitg);
 * pos-embed interpolation (:179-210): bicubic via torch's *scale_factor*
   path with the DINO +0.1 offset (scale = (g + 0.1) / sqrt(N)), no
   antialias;
 * get_intermediate_layers(norm=True) (:297-320): every tapped block output
   gets the final LayerNorm before use.
"""
from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from depthmap_tpu.models.transformer import Block, PatchEmbed
from depthmap_tpu.ops.resize import interpolate


class DinoV2Backbone(nn.Module):
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    hooks: Sequence[int] = (4, 11, 17, 23)
    patch_size: int = 14
    train_img_size: int = 518
    mlp_ratio: float = 4.0
    interpolate_offset: float = 0.1

    @nn.compact
    def __call__(self, x):
        n, h, w, _ = x.shape
        tokens, (gh, gw) = PatchEmbed(self.embed_dim, self.patch_size,
                                      name="patch_embed")(x)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.embed_dim))
        grid_n = self.train_img_size // self.patch_size
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 1 + grid_n * grid_n, self.embed_dim))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (n, 1, self.embed_dim)), tokens], axis=1)
        tokens = tokens + self._interp_pos(pos, gh, gw, grid_n)

        norm = nn.LayerNorm(epsilon=1e-6, name="norm")
        feats = []
        for i in range(self.depth):
            tokens = Block(self.num_heads, self.mlp_ratio, layer_scale=True,
                           name=f"block_{i}")(tokens)
            if i in self.hooks:
                # reference applies the final norm to every tapped output
                normed = norm(tokens)
                feats.append((normed[:, 1:], normed[:, 0]))
        return tuple(feats), (gh, gw)

    def _interp_pos(self, pos, gh, gw, grid_n):
        if (gh, gw) == (grid_n, grid_n):
            return pos
        cls_pos = pos[:, :1]
        grid = pos[0, 1:].reshape(grid_n, grid_n, self.embed_dim)
        sh = (gh + self.interpolate_offset) / grid_n
        sw = (gw + self.interpolate_offset) / grid_n
        grid = interpolate(grid, (gh, gw), "bicubic", False,
                           scales=(sh, sw))
        return jnp.concatenate(
            [cls_pos, grid.reshape(1, gh * gw, self.embed_dim)], axis=1)


DINOV2_CONFIGS = {
    "vits": dict(embed_dim=384, depth=12, num_heads=6, hooks=(2, 5, 8, 11)),
    "vitb": dict(embed_dim=768, depth=12, num_heads=12, hooks=(2, 5, 8, 11)),
    "vitl": dict(embed_dim=1024, depth=24, num_heads=16,
                 hooks=(4, 11, 17, 23)),
    # Depth Anything v1 taps the LAST four blocks (get_intermediate_layers(4))
    "vitl14_da1": dict(embed_dim=1024, depth=24, num_heads=16,
                       hooks=(20, 21, 22, 23)),
}


def build_dinov2(variant: str) -> DinoV2Backbone:
    return DinoV2Backbone(**DINOV2_CONFIGS[variant])
