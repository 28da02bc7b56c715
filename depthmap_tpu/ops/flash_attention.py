"""Flash attention (Pallas TPU) with additive attention bias.

Replaces the reference's materialized N x N attention (BEiT:
dmidas/backbones/beit.py:77 `attn = q @ k.T + rel_pos_bias`; DINOv2:
dinov2_layers/attention.py:29) with an online-softmax tiled kernel: the
scores tile lives only in VMEM, the bias streams in tile-by-tile, and
softmax statistics are carried in f32 scratch.

Supports arbitrary sequence lengths by padding to the 128-lane tile and
masking the padded keys.  Interpret mode keeps it runnable on CPU for tests.
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


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref,
            m_scr, l_scr, acc_scr, *, scale, kv_len, block_k, n_kv):
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # keep the MXU in the input dtype (bf16 at full rate on v5e) and
    # accumulate in f32; the scale is applied post-matmul in f32
    q = q_ref[0, 0]                                # (bq, d)
    k = k_ref[0, 0]                                # (bk, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (bq, bk) f32
    if bias_ref is not None:
        s = s + bias_ref[0, 0].astype(jnp.float32)

    # mask padded keys
    col = kv_idx * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, _MASK_VALUE)

    m_prev = m_scr[...]                            # (bq, LANES)
    l_prev = l_scr[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)     # (bq, 1)
    m_next = jnp.maximum(m_prev, m_curr)           # broadcast over lanes
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:, :1])                 # (bq, bk)
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


def auto_blocks(n: int, dtype=None, cap: Optional[int] = None):
    """Pick (block_q, block_k) for sequence length n: a single whole-row
    tile when it fits VMEM comfortably (s tile = bq*bk*4B), else a 512x1152
    scan.  Measured on v5e at BEiT-512 (N=1025, H=16, b32): whole-row 8.3
    ms/layer vs 11.5 ms for XLA's materialized softmax.

    The whole-row cap is dtype-aware: f32 inputs double the q/k/v/bias tile
    footprint, and whole-row 1152 f32 overflows the 16 MB scoped vmem
    (observed at ZoeDepth's f32-policy N=769 -> padded 1152: 21.55M)."""
    padded = -(-n // _LANES) * _LANES
    if cap is None:
        itemsize = jnp.dtype(dtype).itemsize if dtype is not None else 2
        cap = 1536 if itemsize <= 2 else 768
    if padded <= cap:
        return padded, padded
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
        kernel = functools.partial(_kernel, scale=scale, kv_len=kv_len,
                                   block_k=block_k, n_kv=nkv)
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
        scratch_shapes=[
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
