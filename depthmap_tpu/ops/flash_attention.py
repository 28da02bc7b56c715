"""Flash attention (Pallas TPU) with additive attention bias.

Replaces the reference's materialized N x N attention (BEiT:
dmidas/backbones/beit.py:77 `attn = q @ k.T + rel_pos_bias`; DINOv2:
dinov2_layers/attention.py:29) with an online-softmax tiled kernel: the
scores tile lives only in VMEM, the bias streams in tile-by-tile, and
softmax statistics are carried in f32 scratch.

Supports arbitrary sequence lengths: whole-row UNPADDED blocks (block dims
equal to the array dims are Mosaic-legal) with a scratch-free plain-softmax
kernel when the row fits VMEM — the production BEiT/DINOv2/ViT case — and a
lane-padded online-softmax scan with key masking otherwise.  The softmax
runs in log2 space (log2e folded into the scale/bias FMA, bare exp2).
Interpret mode keeps it runnable on CPU for tests.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_LANES = 128
_LOG2E = 1.4426950408889634


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref,
            m_scr, l_scr, acc_scr, *, scale, kv_len, block_k, n_kv):
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # keep the MXU in the input dtype (bf16 at full rate on v5e) and
    # accumulate in f32.  The softmax runs in log2 space: log2(e) folds
    # into the post-matmul scale (and the bias FMA), so the transcendental
    # is a bare exp2 — exp(x) lowers to exp2(x*log2e) anyway, and the score
    # tile is the kernel's VPU-bound hot volume (round-5 sweep: the exp
    # passes cost ~0.5 ms/layer at BEiT-512 shapes, the bias stream ~0.05).
    q = q_ref[0, 0]                                # (bq, d)
    k = k_ref[0, 0]                                # (bk, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * (scale * _LOG2E)
    if bias_ref is not None:
        s = s + bias_ref[0, 0].astype(jnp.float32) * _LOG2E

    # mask padded keys: garbage columns only exist in the final kv block at
    # col >= kv_len, so restrict the iota/compare/select to the static
    # lane-aligned slab that contains them ([slab, block_k) of the tile) —
    # for non-final blocks every slab column is < kv_len and the select is
    # the identity, so no per-block condition is needed.  Masking the whole
    # (bq, bk) tile cost ~3 VPU passes over the full score volume.
    if kv_len < n_kv * block_k:
        valid_final = kv_len - (n_kv - 1) * block_k
        slab = (valid_final // _LANES) * _LANES
        sub = s[:, slab:]
        col = (kv_idx * block_k + slab
               + jax.lax.broadcasted_iota(jnp.int32, sub.shape, 1))
        sub = jnp.where(col < kv_len, sub, _MASK_VALUE)
        # (dynamic_update_slice has no Mosaic lowering; lane-dim concat does)
        s = jnp.concatenate([s[:, :slab], sub], axis=1) if slab else sub

    m_prev = m_scr[...]                            # (bq, LANES)
    l_prev = l_scr[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)     # (bq, 1)
    m_next = jnp.maximum(m_prev, m_curr)           # broadcast over lanes
    alpha = jnp.exp2(m_prev - m_next)
    p = jnp.exp2(s - m_next[:, :1])                # (bq, bk)
    l_corr = alpha * l_prev
    l_next = l_corr + jnp.sum(p, axis=1, keepdims=True)
    m_scr[...] = m_next
    l_scr[...] = l_next

    v = v_ref[0, 0]
    if kv_len % block_k:
        # unpadded inputs: the edge block's out-of-range v rows are
        # undefined memory (can be NaN/Inf) and p ~ 0 there does NOT
        # neutralize them (0 * inf = nan) — zero them explicitly
        vrow = kv_idx * block_k + jax.lax.broadcasted_iota(
            jnp.int32, v.shape, 0)
        v = jnp.where(vrow < kv_len, v, jnp.zeros_like(v))
    acc_scr[...] = acc_scr[...] * alpha[:, :1] + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    @pl.when(kv_idx == n_kv - 1)
    def _emit():
        l = l_scr[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)


def _kernel_single(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, kv_len,
                   block_k):
    """One kv block covers the whole row (the production BEiT/DINOv2/ViT
    case with unpadded whole-row blocks): plain log2-space softmax with no
    online-rescale machinery and no m/l/acc scratch round-trips."""
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * (scale * _LOG2E)
    if bias_ref is not None:
        s = s + bias_ref[0, 0].astype(jnp.float32) * _LOG2E
    if kv_len < block_k:                      # padded cols (interpret path)
        slab = (kv_len // _LANES) * _LANES
        sub = s[:, slab:]
        col = slab + jax.lax.broadcasted_iota(jnp.int32, sub.shape, 1)
        sub = jnp.where(col < kv_len, sub, _MASK_VALUE)
        s = jnp.concatenate([s[:, :slab], sub], axis=1) if slab else sub
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    v = v_ref[0, 0]
    if kv_len < block_k:
        vrow = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        v = jnp.where(vrow < kv_len, v, jnp.zeros_like(v))
    acc = jax.lax.dot(p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    o_ref[0, 0] = (acc * l_inv).astype(o_ref.dtype)


def auto_blocks(n: int, dtype=None, cap: Optional[int] = None):
    """Pick (block_q, block_k) for sequence length n: a single whole-row
    UNPADDED tile when it fits VMEM comfortably (s tile = bq*bk*4B), else a
    512x1152 scan.  Unpadded block dims are legal in Mosaic when they equal
    the array dims, and they beat the lane-rounded whole-row tile (round-5
    sweep at BEiT-512 N=1025: 0.63 vs 0.75 ms/layer): the score tile
    shrinks ~20% and the padded-col mask select disappears; the blocked
    scan lost to whole-row outright (0.75 vs 1.0+ ms/layer).

    The whole-row cap is dtype-aware: f32 inputs double the q/k/v/bias tile
    footprint.  PADDED whole-row 1152 f32 overflowed the 16 MB scoped vmem
    (21.55M observed), which set the old f32 cap at 768 — unpadded tiles
    shrink the footprint enough that whole-row f32 fits and wins through
    N=1025 (measured on v5e: 0.72 vs 0.87 ms/layer for the 512x1152 scan
    at ZoeDepth-beit384 shapes; bit-identical), so the f32 cap is now
    1152."""
    padded = -(-n // _LANES) * _LANES
    if cap is None:
        itemsize = jnp.dtype(dtype).itemsize if dtype is not None else 2
        cap = 1536 if itemsize <= 2 else 1152
    if padded <= cap:
        return n, n
    return 512, 1152


def _pad_to(x, axis, mult):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "interpret"))
def flash_attention(q, k, v, bias: Optional[jax.Array] = None,
                    scale: Optional[float] = None,
                    block_q: Optional[int] = None,
                    block_k: Optional[int] = None,
                    interpret: Optional[bool] = None):
    """q, k, v: (B, H, N, D); bias broadcastable to (B, H, N, N)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    b, h, n, d = q.shape
    kv_len = k.shape[2]
    if block_q is None or block_k is None:
        abq, abk = auto_blocks(max(n, kv_len), q.dtype)
        if abq == abk == max(n, kv_len):
            # whole-row fits: each side's block must equal ITS OWN array
            # dim for Mosaic's equal-to-array-dims legality (q and kv
            # lengths differ in cross-attention)
            abq, abk = n, kv_len
        block_q = block_q or abq
        block_k = block_k or abk

    # Mosaic masks partial edge blocks (loads of the out-of-range region
    # are undefined but the kernel already masks padded keys, and padded
    # query rows never store), so q/k/v/bias ride in UNPADDED — the
    # explicit jnp.pad copies cost ~175 MB of HBM traffic per BEiT-L-512
    # layer.  Interpret mode (CPU tests) keeps the explicit pads: its
    # edge-block emulation zero-fills, which turns garbage-row exp()
    # overflow into exact zeros but is not guaranteed either way.
    if interpret:
        qp = _pad_to(q, 2, block_q)
        kp = _pad_to(k, 2, block_k)
        vp = _pad_to(v, 2, block_k)
    else:
        qp, kp, vp = q, k, v
    nq = -(-qp.shape[2] // block_q)
    nkv = -(-kp.shape[2] // block_k)

    # grid order (h, qi, b, ki): batch iterates faster than (h, qi) so a
    # batch-shared bias tile keeps the same block index across consecutive
    # steps and Pallas's revisiting optimization skips the re-fetch — at
    # BEiT-512/b32 this avoids ~1.8 GB of redundant bias reads per forward
    in_specs = [
        pl.BlockSpec((1, 1, block_q, d),
                     lambda h_, qi, b_, ki: (b_, h_, qi, 0)),
        pl.BlockSpec((1, 1, block_k, d),
                     lambda h_, qi, b_, ki: (b_, h_, ki, 0)),
        pl.BlockSpec((1, 1, block_k, d),
                     lambda h_, qi, b_, ki: (b_, h_, ki, 0)),
    ]
    args = [qp, kp, vp]
    if bias is not None:
        if bias.ndim == 3:
            # (H, N, N) head-bias: add the batch axis explicitly — without
            # it the leading dim would be misread as batch and each batch
            # element would index a different head's bias block
            bias = bias[None]
        bias = jnp.broadcast_to(bias, (bias.shape[0], h, n, kv_len))
        if interpret:
            bias = _pad_to(_pad_to(bias, 2, block_q), 3, block_k)
        bb = bias.shape[0]
        in_specs.append(pl.BlockSpec(
            (1, 1, block_q, block_k),
            lambda h_, qi, b_, ki: ((b_ if bb > 1 else 0), h_, qi, ki)))
        args.append(bias)
        if nkv == 1:
            kernel = functools.partial(_kernel_single, scale=scale,
                                       kv_len=kv_len, block_k=block_k)
        else:
            kernel = functools.partial(_kernel, scale=scale, kv_len=kv_len,
                                       block_k=block_k, n_kv=nkv)
    elif nkv == 1:
        kernel = functools.partial(
            lambda qr, kr, vr, o, **kw:
            _kernel_single(qr, kr, vr, None, o, **kw),
            scale=scale, kv_len=kv_len, block_k=block_k)
    else:
        kernel = functools.partial(
            lambda qr, kr, vr, o, m, l, a, **kw:
            _kernel(qr, kr, vr, None, o, m, l, a, **kw),
            scale=scale, kv_len=kv_len, block_k=block_k, n_kv=nkv)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        grid=(h, nq, b, nkv),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda h_, qi, b_, ki: (b_, h_, qi, 0)),
        scratch_shapes=[] if nkv == 1 else [
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary",
                                 "arbitrary")),
        interpret=interpret,
    )(*args)
    return out[:, :, :n, :]


# A packed-qkv kernel variant (q/k/v blocks index-mapped straight out of
# the (B, N, 3, H, D) qkv-dense output, zero XLA-level transposes) was
# prototyped in round 5 and is bit-identical to this kernel in interpret
# mode, but Mosaic rejects the required block shape (second-to-last block
# dim 1 vs the overall H axis: blocks must have last-two dims divisible by
# (8, 128) or equal to the array dims).  The einsum attention layout in
# models/transformer.py captures most of the win at the XLA level instead
# (benchmarks/block_fusion.py: 76.2 -> 69.4 ms per 24-block stack).
