"""ZoeDepth metric-depth models (zoedepth_n / k / nk).

Re-expression of the reference stack:
 * MidasCore feature taps over DPT_BEiT_L_384 (dzoedepth/models/base_models/
   midas.py:189-379) — here the taps come straight out of our DPTDepthModel
   (with_zoe_taps);
 * SeedBinRegressor(Unnormed) / Projector  (layers/localbins_layers.py:29-120)
 * AttractorLayer(Unnormed) with exp/inv attractors (layers/attractor.py)
 * ConditionalLogBinomial probability head  (layers/dist_layers.py:36-130)
 * single head (zoedepth/zoedepth_v1.py:124-202) or NK dual-expert routing by
   a patch-transformer domain classifier (zoedepth_nk/zoedepth_nk_v1.py,
   layers/patch_transformer.py)
 * TTA inference: reflect pad sqrt(h/2)*3 + horizontal flip averaging
   (models/depth_model.py:57-128), in-model resize (bilinear,
   align_corners=True) + 0.5/0.5 normalization (midas.py:175-186).

Config values per config_zoedepth*.json: n_bins 64, softplus centers,
n_attractors [16,8,4,1], alpha 1000, gamma 2, kind mean, type inv,
min_temp 0.0212, max_temp 50; N: max_depth 10 @384x512; K: max_depth 80
@384x768; NK: dual nyu(10)/kitti(80) @384x512.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from depthmap_tpu.models.dpt import DPTDepthModel, build_dpt
from depthmap_tpu.models.layers import Conv
from depthmap_tpu.ops.resize import interpolate
from depthmap_tpu.pipeline.preprocess import resize_get_size


def inv_attractor(dx, alpha=300.0, gamma=2):
    return dx / (1.0 + alpha * dx ** gamma)


def exp_attractor(dx, alpha=300.0, gamma=2):
    return jnp.exp(-alpha * jnp.abs(dx) ** gamma) * dx


class SeedBinRegressorUnnormed(nn.Module):
    n_bins: int = 64
    mlp_dim: int = 256

    @nn.compact
    def __call__(self, x):
        h = Conv(self.mlp_dim, 1, name="conv1")(x)
        h = nn.relu(h)
        h = Conv(self.n_bins, 1, name="conv2")(h)
        centers = nn.softplus(h)
        return centers, centers


class SeedBinRegressorNormed(nn.Module):
    n_bins: int = 64
    mlp_dim: int = 256
    min_depth: float = 1e-3
    max_depth: float = 10.0

    @nn.compact
    def __call__(self, x):
        h = Conv(self.mlp_dim, 1, name="conv1")(x)
        h = nn.relu(h)
        h = Conv(self.n_bins, 1, name="conv2")(h)
        B = nn.relu(h) + 1e-3
        widths_normed = B / jnp.sum(B, axis=-1, keepdims=True)
        widths = (self.max_depth - self.min_depth) * widths_normed
        edges = jnp.cumsum(
            jnp.pad(widths, ((0, 0), (0, 0), (0, 0), (1, 0)),
                    constant_values=self.min_depth), axis=-1)
        centers = 0.5 * (edges[..., :-1] + edges[..., 1:])
        return widths_normed, centers


class Projector(nn.Module):
    out_features: int
    mlp_dim: int = 128

    @nn.compact
    def __call__(self, x):
        h = Conv(self.mlp_dim, 1, name="conv1")(x)
        h = nn.relu(h)
        return Conv(self.out_features, 1, name="conv2")(h)


class AttractorLayerUnnormed(nn.Module):
    n_attractors: int = 16
    mlp_dim: int = 128
    alpha: float = 300.0
    gamma: int = 2
    kind: str = "mean"
    attractor_type: str = "inv"

    @nn.compact
    def __call__(self, x, b_prev, prev_b_embedding=None):
        if prev_b_embedding is not None:
            prev_b_embedding = interpolate(prev_b_embedding, x.shape[1:3],
                                           "bilinear", True)
            x = x + prev_b_embedding
        h = Conv(self.mlp_dim, 1, name="conv1")(x)
        h = nn.relu(h)
        A = nn.softplus(Conv(self.n_attractors, 1, name="conv2")(h))

        b_prev = interpolate(b_prev, x.shape[1:3], "bilinear", True)
        dist = inv_attractor if self.attractor_type == "inv" else exp_attractor
        # (N, H, W, A, 1) - (N, H, W, 1, nbins) -> attract every bin center
        dx = A[..., :, None] - b_prev[..., None, :]
        # Reference quirk (attractor.py:55-63): dist() is invoked WITHOUT
        # alpha/gamma, so the @torch.jit.script defaults (300, 2) always
        # apply — the configured attractor_alpha=1000 never reaches the
        # math.  Verified against the vendored module in
        # tests/test_torch_oracle_parity.py.
        delta = dist(dx, 300.0, 2)
        delta = jnp.mean(delta, axis=-2) if self.kind == "mean" \
            else jnp.sum(delta, axis=-2)
        b_new = b_prev + delta
        return b_new, b_new


class AttractorLayerNormed(nn.Module):
    """Bounded-bin attractor (reference layers/attractor.py:60-139,
    bin_centers_type='normed' — used by zoedepth_k).

    Reference quirk kept: `A_normed = A / A.sum(dim=2)` is computed and then
    immediately overwritten by `A[:, :, 0]` — the attractor points are the
    raw (+eps) first element of each (value, norm) pair, NOT normalized."""
    n_attractors: int = 16
    mlp_dim: int = 128
    alpha: float = 300.0
    gamma: int = 2
    kind: str = "sum"
    attractor_type: str = "exp"
    min_depth: float = 1e-3
    max_depth: float = 10.0

    @nn.compact
    def __call__(self, x, b_prev, prev_b_embedding=None):
        if prev_b_embedding is not None:
            prev_b_embedding = interpolate(prev_b_embedding, x.shape[1:3],
                                           "bilinear", True)
            x = x + prev_b_embedding
        h = Conv(self.mlp_dim, 1, name="conv1")(x)
        h = nn.relu(h)
        A = nn.relu(Conv(2 * self.n_attractors, 1, name="conv2")(h)) + 1e-3
        n, hh, ww, _ = A.shape
        A = A.reshape(n, hh, ww, self.n_attractors, 2)[..., 0]

        b_prev = interpolate(b_prev, x.shape[1:3], "bilinear", True)
        dist = inv_attractor if self.attractor_type == "inv" else exp_attractor
        dx = A[..., :, None] - b_prev[..., None, :]
        # same quirk as AttractorLayerUnnormed: jit-script defaults (300, 2)
        delta = dist(dx, 300.0, 2)
        delta = jnp.mean(delta, axis=-2) if self.kind == "mean" \
            else jnp.sum(delta, axis=-2)
        b_new = b_prev + delta
        centers = (self.max_depth - self.min_depth) * b_new + self.min_depth
        centers = jnp.sort(centers, axis=-1)
        centers = jnp.clip(centers, self.min_depth, self.max_depth)
        return b_new, centers


def log_binom_coeff(n, k, eps=1e-7):
    n = n + eps
    k = k + eps
    return n * jnp.log(n) - k * jnp.log(k) - (n - k) * jnp.log(n - k + eps)


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _log_binom_table(K: int) -> tuple:
    """Static log(nCk) Stirling table (reference dist_layers.py:29-33).
    Precomputed in numpy: XLA's constant folding of the jnp expression
    produces NaN for k = K-1 ((n-k)*log(n-k+eps) with n-k == 0)."""
    n = np.float32(K - 1) + np.float32(1e-7)
    k = np.arange(K, dtype=np.float32) + np.float32(1e-7)
    return tuple((n * np.log(n) - k * np.log(k)
                  - (n - k) * np.log(n - k + np.float32(1e-7))).tolist())


class ConditionalLogBinomial(nn.Module):
    n_classes: int = 64
    bottleneck_factor: int = 2
    condition_dim: int = 128
    min_temp: float = 0.0212
    max_temp: float = 50.0

    @nn.compact
    def __call__(self, x, cond):
        cat = jnp.concatenate([x, cond], axis=-1)
        bottleneck = (x.shape[-1] + cond.shape[-1]) // self.bottleneck_factor
        h = Conv(bottleneck, 1, name="mlp_conv1")(cat)
        h = nn.gelu(h, approximate=False)
        pt = nn.softplus(Conv(4, 1, name="mlp_conv2")(h))
        p, t = pt[..., :2], pt[..., 2:]
        p = p + 1e-4
        p = p[..., 0] / (p[..., 0] + p[..., 1])
        t = t + 1e-4
        t = t[..., 0] / (t[..., 0] + t[..., 1])
        t = (self.max_temp - self.min_temp) * t + self.min_temp

        K = self.n_classes
        k_idx = jnp.arange(K, dtype=jnp.float32)
        p = jnp.clip(p, 1e-4, 1.0)[..., None]
        one_minus_p = jnp.clip(1.0 - p, 1e-4, 1.0)
        y = jnp.asarray(_log_binom_table(K)) + \
            k_idx * jnp.log(p) + (K - 1 - k_idx) * jnp.log(one_minus_p)
        return jax.nn.softmax(y / t[..., None], axis=-1)


class PatchTransformerEncoder(nn.Module):
    """1x1-patch transformer + class token for NK domain routing
    (layers/patch_transformer.py:29-100; torch post-LN encoder layers)."""
    embedding_dim: int = 128
    num_heads: int = 4
    num_layers: int = 4
    ff_dim: int = 1024

    @nn.compact
    def __call__(self, x):
        n, h, w, _ = x.shape
        emb = Conv(self.embedding_dim, 1, name="embedding_conv")(x)
        emb = emb.reshape(n, h * w, self.embedding_dim)
        # class token = zero pad at sequence start (F.pad on channel-flat seq)
        emb = jnp.pad(emb, ((0, 0), (1, 0), (0, 0)))
        s = emb.shape[1]
        pos = self._positional_encoding(s, self.embedding_dim)
        emb = emb + pos
        for i in range(self.num_layers):
            emb = self._layer(emb, i)
        return emb[:, 0]   # class-token embedding

    def _positional_encoding(self, s, e):
        position = np.arange(s, dtype=np.float32)[:, None]
        index = np.arange(0, e, 2, dtype=np.float32)[None, :]
        div = np.exp(index * (-math.log(10000.0) / e))
        pe = position * div
        return jnp.asarray(np.concatenate([np.sin(pe), np.cos(pe)], axis=1))

    def _layer(self, x, i):
        # torch TransformerEncoderLayer (post-norm, relu)
        c = x.shape[-1]
        qkv = nn.Dense(3 * c, name=f"l{i}_in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, s, _ = x.shape
        hd = c // self.num_heads

        def heads(t):
            return t.reshape(b, s, self.num_heads, hd).transpose(0, 2, 1, 3)
        att = jax.nn.softmax(
            jnp.einsum("bhsd,bhtd->bhst", heads(q) * hd ** -0.5, heads(k)),
            axis=-1)
        o = jnp.einsum("bhst,bhtd->bhsd", att, heads(v))
        o = o.transpose(0, 2, 1, 3).reshape(b, s, c)
        o = nn.Dense(c, name=f"l{i}_out_proj")(o)
        x = nn.LayerNorm(name=f"l{i}_norm1")(x + o)
        f = nn.Dense(self.ff_dim, name=f"l{i}_linear1")(x)
        f = nn.relu(f)
        f = nn.Dense(c, name=f"l{i}_linear2")(f)
        return nn.LayerNorm(name=f"l{i}_norm2")(x + f)


class ZoeCoreHead(nn.Module):
    """The seed-bins -> attractors -> log-binomial pipeline for one domain."""
    n_bins: int = 64
    bin_embedding_dim: int = 128
    min_depth: float = 1e-3
    max_depth: float = 10.0
    n_attractors: Sequence[int] = (16, 8, 4, 1)
    alpha: float = 1000.0
    gamma: int = 2
    kind: str = "mean"
    attractor_type: str = "inv"
    mlp_dim_seed: int = 256
    attractor_mlp_dim: int = 128
    clb_bottleneck_factor: int = 2
    bin_centers_type: str = "softplus"   # 'normed' for zoedepth_k

    @nn.compact
    def __call__(self, btlnck, seed_embedding, embeddings):
        """btlnck: bottleneck feature; seed_embedding: seed projector output;
        embeddings: per-level projector outputs (computed by the caller so
        they can be shared between NK experts).

        Returns (final_b_centers, last_embedding): for 'softplus' the
        unnormed chain's centers ARE the running b_prev; for 'normed' the
        chain runs on normalized centers and the scaled/sorted/clipped
        centers from the last attractor are returned
        (reference zoedepth_v1.py:150-169)."""
        if self.bin_centers_type == "normed":
            _, seed_b_centers = SeedBinRegressorNormed(
                self.n_bins, self.mlp_dim_seed, self.min_depth,
                self.max_depth, name="seed_bin_regressor")(btlnck)
            b_prev = (seed_b_centers - self.min_depth) / \
                (self.max_depth - self.min_depth)
        else:
            _, seed_b_centers = SeedBinRegressorUnnormed(
                self.n_bins, self.mlp_dim_seed,
                name="seed_bin_regressor")(btlnck)
            b_prev = seed_b_centers
        prev_b_embedding = seed_embedding
        b_centers = b_prev
        for i, b_embedding in enumerate(embeddings):
            if self.bin_centers_type == "normed":
                b_prev, b_centers = AttractorLayerNormed(
                    self.n_attractors[i], self.attractor_mlp_dim, self.alpha,
                    self.gamma, self.kind, self.attractor_type,
                    self.min_depth, self.max_depth,
                    name=f"attractor_{i}")(b_embedding, b_prev,
                                           prev_b_embedding)
            else:
                b_prev, b_centers = AttractorLayerUnnormed(
                    self.n_attractors[i], self.attractor_mlp_dim, self.alpha,
                    self.gamma, self.kind, self.attractor_type,
                    name=f"attractor_{i}")(b_embedding, b_prev,
                                           prev_b_embedding)
            prev_b_embedding = b_embedding
        return b_centers, embeddings[-1]


class ZoeDepth(nn.Module):
    """Single-head ZoeDepth (n / k)."""
    core: DPTDepthModel
    n_bins: int = 64
    bin_embedding_dim: int = 128
    min_depth: float = 1e-3
    max_depth: float = 10.0
    min_temp: float = 0.0212
    max_temp: float = 50.0
    alpha: float = 1000.0
    attractor_kind: str = "mean"
    attractor_type: str = "inv"
    bin_centers_type: str = "softplus"   # 'normed' for zoedepth_k
    # Selective precision (VERDICT r2 #7): the relative-depth core runs in
    # this dtype (bf16 on TPU), the metric head (bins / attractors /
    # log-binomial) always computes f32 — the reference keeps zoedepth_n
    # fully f32 because whole-model half "completely trips"
    # (depthmap_generation.py:262-276); the drift lives in the head, not
    # the backbone (measured in PARITY.md).
    core_dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False, rel_bias=None):
        if self.core_dtype is not None:
            x = x.astype(self.core_dtype)
        rel_depth, taps = self.core(x, train=train, rel_bias=rel_bias)
        rel_depth = rel_depth.astype(jnp.float32)
        taps = [t.astype(jnp.float32) for t in taps]
        out_conv_act, btlnck, *x_blocks = taps

        btlnck = Conv(btlnck.shape[-1], 1, name="conv2")(btlnck)
        seed_emb = Projector(self.bin_embedding_dim,
                             name="seed_projector")(btlnck)
        embeddings = [
            Projector(self.bin_embedding_dim, name=f"projector_{i}")(xb)
            for i, xb in enumerate(x_blocks)]
        b_centers, b_embedding = ZoeCoreHead(
            self.n_bins, self.bin_embedding_dim, self.min_depth,
            self.max_depth, alpha=self.alpha, kind=self.attractor_kind,
            attractor_type=self.attractor_type,
            bin_centers_type=self.bin_centers_type, name="head")(
                btlnck, seed_emb, embeddings)

        last = out_conv_act
        rel_cond = interpolate(rel_depth[..., None], last.shape[1:3],
                               "bilinear", True)
        last = jnp.concatenate([last, rel_cond], axis=-1)
        b_embedding = interpolate(b_embedding, last.shape[1:3],
                                  "bilinear", True)
        probs = ConditionalLogBinomial(
            self.n_bins, condition_dim=self.bin_embedding_dim,
            min_temp=self.min_temp, max_temp=self.max_temp, name="clb")(
                last, b_embedding)
        b_centers = interpolate(b_centers, probs.shape[1:3], "bilinear", True)
        # sum over bins in f32: metric depth must not quantize through bf16
        metric = jnp.sum(probs.astype(jnp.float32) *
                         b_centers.astype(jnp.float32), axis=-1)
        return metric   # (N, H, W) depth in meters


class ZoeDepthNK(nn.Module):
    """Dual-expert ZoeDepth with transformer domain router."""
    core: DPTDepthModel
    n_bins: int = 64
    bin_embedding_dim: int = 128
    min_temp: float = 0.0212
    max_temp: float = 50.0
    alpha: float = 1000.0
    core_dtype: Optional[Any] = None   # see ZoeDepth.core_dtype

    @nn.compact
    def __call__(self, x, train: bool = False, rel_bias=None):
        if self.core_dtype is not None:
            x = x.astype(self.core_dtype)
        rel_depth, taps = self.core(x, train=train, rel_bias=rel_bias)
        rel_depth = rel_depth.astype(jnp.float32)
        taps = [t.astype(jnp.float32) for t in taps]
        out_conv_act, btlnck, *x_blocks = taps
        btlnck = Conv(btlnck.shape[-1], 1, name="conv2")(btlnck)

        embedding = PatchTransformerEncoder(
            name="patch_transformer")(btlnck)
        h = nn.Dense(128, name="mlp_classifier_0")(embedding)
        h = nn.relu(h)
        domain_logits = nn.Dense(2, name="mlp_classifier_2")(h)
        domain_vote = jax.nn.softmax(
            jnp.sum(domain_logits, axis=0, keepdims=True), axis=-1)
        use_kitti = jnp.argmax(domain_vote, axis=-1)[0] == 1

        seed_emb = Projector(self.bin_embedding_dim,
                             mlp_dim=self.bin_embedding_dim // 2,
                             name="seed_projector")(btlnck)
        embeddings = [Projector(self.bin_embedding_dim,
                                mlp_dim=self.bin_embedding_dim // 2,
                                name=f"projector_{i}")(xb)
                      for i, xb in enumerate(x_blocks)]

        def expert(domain):
            # NK quirk (zoedepth_nk_v1.py:141-148): n_attractors[i] is passed
            # as n_bins, so every attractor layer keeps the default 16
            b_centers, b_embedding = ZoeCoreHead(
                self.n_bins, self.bin_embedding_dim,
                n_attractors=(16, 16, 16, 16),
                alpha=self.alpha, kind="mean", attractor_type="inv",
                mlp_dim_seed=self.bin_embedding_dim // 2,
                attractor_mlp_dim=self.bin_embedding_dim,
                name=f"head_{domain}")(btlnck, seed_emb, embeddings)
            last = out_conv_act
            b_emb = interpolate(b_embedding, last.shape[1:3], "bilinear", True)
            probs = ConditionalLogBinomial(
                self.n_bins, bottleneck_factor=4,
                condition_dim=self.bin_embedding_dim,
                min_temp=self.min_temp, max_temp=self.max_temp,
                name=f"clb_{domain}")(last, b_emb)
            b_c = interpolate(b_centers, last.shape[1:3], "bilinear", True)
            # f32 bin sum (see ZoeDepth.__call__)
            return jnp.sum(probs.astype(jnp.float32) *
                           b_c.astype(jnp.float32), axis=-1)

        nyu = expert("nyu")
        kitti = expert("kitti")
        return jnp.where(use_kitti, kitti, nyu)


class ZoeDepthInference(nn.Module):
    """Full inference wrapper: in-model resize + normalize + pad/flip TTA."""
    model: nn.Module
    img_size: Tuple[int, int] = (384, 512)   # (H, W)

    @staticmethod
    def net_input_size(h: int, w: int, net_size: Optional[Tuple[int, int]],
                       img_size: Tuple[int, int]) -> Tuple[int, int]:
        """(new_h, new_w) the padded+flip-TTA batch is resized to — a pure
        function of static shapes, shared with DepthPredictor so the BEiT
        rel-pos biases can be precomputed per resolution bucket."""
        net_h, net_w = net_size if net_size is not None else img_size
        pad_h = int(np.sqrt(h / 2) * 3)
        pad_w = int(np.sqrt(w / 2) * 3)
        new_w, new_h = resize_get_size(w + 2 * pad_w, h + 2 * pad_h,
                                       net_w, net_h, "minimal", True, 32)
        return new_h, new_w

    @nn.compact
    def __call__(self, x01, net_size: Optional[Tuple[int, int]] = None,
                 train: bool = False, rel_bias=None):
        """x01: (N, H, W, 3) RGB in [0,1] -> (N, H, W) metric depth."""
        n, h, w, _ = x01.shape
        pad_h = int(np.sqrt(h / 2) * 3)
        pad_w = int(np.sqrt(w / 2) * 3)
        xp = jnp.pad(x01, ((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)),
                     mode="reflect")
        # flip TTA as one batch of 2N
        xb = jnp.concatenate([xp, xp[:, :, ::-1]], axis=0)
        new_h, new_w = self.net_input_size(h, w, net_size, self.img_size)
        xr = interpolate(xb, (new_h, new_w), "bilinear", True)
        xr = (xr - 0.5) / 0.5
        pred = self.model(xr, train=train, rel_bias=rel_bias)
        pred = interpolate(pred[..., None], (xp.shape[1], xp.shape[2]),
                           "bicubic", False)[..., 0]
        if pad_h > 0:
            pred = pred[:, pad_h:-pad_h]
        if pad_w > 0:
            pred = pred[:, :, pad_w:-pad_w]
        return (pred[:n] + pred[n:, :, ::-1]) / 2.0


def build_zoedepth(variant: str) -> ZoeDepthInference:
    """variant in {n, k, nk}."""
    import dataclasses
    core = dataclasses.replace(build_dpt("beitl16_384"), with_zoe_taps=True)
    if variant == "n":
        return ZoeDepthInference(
            ZoeDepth(core, max_depth=10.0), img_size=(384, 512))
    if variant == "k":
        # kitti config: bin_centers_type='normed' (config_zoedepth_kitti.json)
        return ZoeDepthInference(
            ZoeDepth(core, max_depth=80.0, bin_centers_type="normed"),
            img_size=(384, 768))
    if variant == "nk":
        return ZoeDepthInference(ZoeDepthNK(core), img_size=(384, 512))
    raise ValueError(variant)
