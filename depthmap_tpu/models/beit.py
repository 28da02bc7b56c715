"""BEiT backbone for MiDaS 3.1 (dpt_beit_large_512/384, dpt_beit_base_384).

Semantics per reference dmidas/backbones/beit.py:
 * no absolute pos-embed; every block adds a *relative position bias* to the
   attention logits (:65-91);
 * arbitrary input sizes are supported by bilinearly resizing each block's
   (2Wh-1)x(2Ww-1) bias table to the new window (:29-62) — the last 3 table
   rows (cls interactions) are kept verbatim;
 * blocks carry LayerScale (gamma_1/gamma_2) and a q/v-only qkv bias.

The relative-position *index* is a static function of the window size and is
baked as a numpy constant at trace time; the bias gather runs on-device so
the whole forward stays one XLA program per resolution bucket.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from depthmap_tpu.models.transformer import Block, PatchEmbed
from depthmap_tpu.ops.resize import interpolate


@functools.lru_cache(maxsize=None)
def gen_relative_position_index(wh: int, ww: int) -> np.ndarray:
    """(wh*ww+1, wh*ww+1) int32 index into the bias table; the 3 extra table
    entries encode cls->token, token->cls, cls->cls."""
    num_rel = (2 * wh - 1) * (2 * ww - 1)
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww),
                                  indexing="ij"))          # (2, wh, ww)
    flat = coords.reshape(2, -1)                           # (2, wh*ww)
    rel = flat[:, :, None] - flat[:, None, :]              # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    n = wh * ww
    index = np.zeros((n + 1, n + 1), dtype=np.int64)
    index[1:, 1:] = rel.sum(-1)
    # timm layout: token-token in [0, num_rel); cls->token = num_rel;
    # token->cls = num_rel+1; cls->cls = num_rel+2
    index[0, 0:] = num_rel
    index[0:, 0] = num_rel + 1
    index[0, 0] = num_rel + 2
    return index.astype(np.int32)


class RelPosBias(nn.Module):
    """Per-block relative position bias with train-window table and
    arbitrary-window bilinear resize."""
    num_heads: int
    train_window: Tuple[int, int]   # (Wh, Ww) the checkpoint was trained at

    @nn.compact
    def __call__(self, window: Tuple[int, int],
                 table_only: bool = False) -> jax.Array:
        twh, tww = self.train_window
        old_num = (2 * twh - 1) * (2 * tww - 1) + 3
        table = self.param("relative_position_bias_table",
                           nn.initializers.zeros, (old_num, self.num_heads))
        wh, ww = window
        new_h, new_w = 2 * wh - 1, 2 * ww - 1
        if (wh, ww) != (twh, tww):
            # reference resizes with the table laid out (1, W, H, C) —
            # width-major — then bilinear to (new_h, new_w); replicate that
            sub = table[:old_num - 3]
            sub = sub.reshape(2 * tww - 1, 2 * twh - 1, self.num_heads)
            sub = interpolate(sub, (new_h, new_w), "bilinear", False)
            sub = sub.reshape(new_h * new_w, self.num_heads)
            table = jnp.concatenate([sub, table[old_num - 3:]], axis=0)
        if table_only:
            # streamed-bias path: attention gathers per q-chunk from this
            # (num_rel + 3, H) table (models/attention.py RelBiasSpec)
            return table
        # Materialize bias[(r1,c1),(r2,c2)] = T2[r1-r2+wh-1, c1-c2+ww-1]
        # via two gathers over the SMALL relative axes (wh² and ww² indices
        # with multi-KB row payloads) instead of one (N+1)²-index gather of
        # 16-element rows: the flat-index gather is scalar-unit bound on TPU
        # and measured 190 s for BEiT-L's 24 blocks at 512² — this exact
        # reformulation (same table entries) runs at HBM bandwidth.
        nh = self.num_heads
        num_rel = new_h * new_w
        t2 = table[:num_rel].reshape(new_h, new_w * nh)
        ri = jnp.arange(wh, dtype=jnp.int32)
        ridx = (ri[:, None] - ri[None, :] + wh - 1).reshape(-1)
        x1 = t2[ridx]                              # (wh², (2ww-1)·H)
        ci = jnp.arange(ww, dtype=jnp.int32)
        cidx = (ci[:, None] - ci[None, :] + ww - 1).reshape(-1)
        x2 = x1.reshape(wh * wh, new_w, nh)[:, cidx]   # (wh², ww², H)
        body = x2.reshape(wh, wh, ww, ww, nh).transpose(0, 2, 1, 3, 4)
        ntok = wh * ww
        body = body.reshape(ntok, ntok, nh)
        # cls interactions: row 0 = cls->token (table[num_rel]), col 0 =
        # token->cls (num_rel+1), corner = cls->cls (num_rel+2) — matching
        # gen_relative_position_index's overwrite order
        ct = jnp.broadcast_to(table[num_rel], (1, ntok, nh))
        tc = jnp.broadcast_to(table[num_rel + 1], (ntok, 1, nh))
        cc = table[num_rel + 2].reshape(1, 1, nh)
        top = jnp.concatenate([cc, ct], axis=1)        # (1, N, H)
        rest = jnp.concatenate([tc, body], axis=1)     # (ntok, N, H)
        bias = jnp.concatenate([top, rest], axis=0)    # (N, N, H)
        return bias.transpose(2, 0, 1)[None]   # (1, H, N, N)


class BeitBackbone(nn.Module):
    """Returns features at the 4 hook depths (token sequences incl. cls)."""
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    hooks: Sequence[int] = (5, 11, 17, 23)
    train_img_size: int = 512
    patch_size: int = 16
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, rel_bias: Optional[Tuple[jax.Array, ...]] = None):
        """rel_bias: optional tuple of `depth` precomputed (1, H, N, N) bias
        tensors.  The per-block table gather is input-independent (a pure
        function of the params and the window), and at 512 px it costs ~45%
        of the whole backbone runtime — precompute once per resolution
        bucket with :func:`precompute_rel_biases` and pass it in."""
        n, h, w, _ = x.shape
        tokens, (gh, gw) = PatchEmbed(self.embed_dim, self.patch_size,
                                      name="patch_embed")(x)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.embed_dim))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (n, 1, self.embed_dim)), tokens], axis=1)

        tw = self.train_img_size // self.patch_size
        # Streamed bias above a materialization budget (VERDICT r2 #6): one
        # (H, N, N) block bias at bf16 crosses ~256 MB near N ~ 2900 (about
        # 880 px) and transients OOM a 16 GB chip well before Boost's
        # r_max = 1600 whole-image pass (N = 6913 -> 1.5 GB per block).
        # Past the budget, attention receives the resized TABLE and gathers
        # per q-chunk (models/attention.py attention_rel_streamed).
        import os
        n_tok = gh * gw + 1
        stream_budget = int(os.environ.get("DEPTHMAP_BIAS_STREAM_BYTES",
                                           256 << 20))
        stream = (rel_bias is None and
                  self.num_heads * n_tok * n_tok * x.dtype.itemsize
                  > stream_budget)
        feats = []
        for i in range(self.depth):
            if rel_bias is not None:
                bias = rel_bias[i]
            elif stream:
                from depthmap_tpu.models.attention import RelBiasSpec
                bias = RelBiasSpec(
                    RelPosBias(self.num_heads, (tw, tw),
                               name=f"rel_pos_bias_{i}")((gh, gw),
                                                         table_only=True),
                    gh, gw)
            else:
                bias = RelPosBias(self.num_heads, (tw, tw),
                                  name=f"rel_pos_bias_{i}")((gh, gw))
            tokens = Block(self.num_heads, self.mlp_ratio, layer_scale=True,
                           beit_style_bias=True, name=f"block_{i}")(
                               tokens, bias)
            if i in self.hooks:
                feats.append(tokens)
        return tuple(feats), (gh, gw)


def beit_large(img_size: int, hooks=(5, 11, 17, 23)) -> BeitBackbone:
    return BeitBackbone(embed_dim=1024, depth=24, num_heads=16, hooks=hooks,
                        train_img_size=img_size)


def beit_base(img_size: int = 384, hooks=(2, 5, 8, 11)) -> BeitBackbone:
    return BeitBackbone(embed_dim=768, depth=12, num_heads=12, hooks=hooks,
                        train_img_size=img_size)


def precompute_rel_biases(backbone: BeitBackbone, backbone_params,
                          window: Tuple[int, int],
                          dtype=None) -> Tuple[jax.Array, ...]:
    """All `depth` relative-position biases for one window, computed once.

    backbone_params: the *backbone's* params subtree (containing
    rel_pos_bias_{i}).  Returns a tuple of (1, H, N, N) arrays ready to pass
    as ``rel_bias`` to BeitBackbone/DPTDepthModel — sidestepping the ~1M-index
    table gather per block per forward."""
    tw = backbone.train_img_size // backbone.patch_size

    @jax.jit
    def compute(params):
        out = []
        for i in range(backbone.depth):
            sub = {"params": params[f"rel_pos_bias_{i}"]}
            b = RelPosBias(backbone.num_heads, (tw, tw)).apply(sub, window)
            out.append(b.astype(dtype) if dtype is not None else b)
        return tuple(out)

    return compute(backbone_params)
