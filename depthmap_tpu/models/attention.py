"""Multi-head attention for the ViT backbones.

Two interchangeable implementations:
 * ``attention_xla`` — plain einsum softmax; XLA fuses it well for the
   moderate sequence lengths of this zoo (N <= ~4100 at 1024 px);
 * ``flash_attention`` — Pallas TPU kernel (ops/flash_attention.py) with
   online softmax and additive-bias support (BEiT relative position bias,
   reference dmidas/backbones/beit.py:65-91 materializes the full N x N
   matrix; the Pallas path streams it tile by tile).

``attention()`` dispatches: Pallas on TPU, XLA elsewhere (tests run on CPU).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class RelBiasSpec(NamedTuple):
    """Streamed BEiT relative-position bias (VERDICT r2 #6).

    At large windows the materialized (H, N, N) bias dominates HBM (BEiT-L
    @1536x1152: 24 blocks x 16 x 6913^2 — tens of GB even one block at a
    time), which forced Boost's whole-image cap.  Instead of an array, the
    backbone hands attention the window-resized TABLE plus the grid shape;
    attention q-chunks and gathers each chunk's (chunk, N) bias tile on the
    fly — peak bias memory is one chunk, any N fits."""
    table: jax.Array    # (num_rel + 3, H), already window-resized
    gh: int
    gw: int


def attention_rel_streamed(q, k, v, spec: RelBiasSpec,
                           scale: Optional[float] = None,
                           chunk: int = 512,
                           use_flash: Optional[bool] = None):
    """Exact attention with the rel-pos bias resolved per q-chunk.

    bias[t1, t2] = table[index(t1, t2)] with index the standard BEiT
    relative-position formula (models/beit.py gen_relative_position_index)
    — computed here from per-token (row, col) integer vectors instead of
    the (N, N) index array, so nothing quadratic materializes beyond one
    (chunk, N) tile.  Each chunk runs through the Pallas flash kernel on
    TPU (full-key online softmax per chunk is exact)."""
    b, h, n, d = q.shape
    if scale is None:
        scale = d ** -0.5
    gh, gw = int(spec.gh), int(spec.gw)
    num_rel = (2 * gh - 1) * (2 * gw - 1)
    chunk = min(chunk, -(-n // 128) * 128)

    t = jnp.arange(n, dtype=jnp.int32)
    rows_k = jnp.maximum(t - 1, 0) // gw
    cols_k = jnp.maximum(t - 1, 0) % gw
    k_cls = t == 0

    nch = -(-n // chunk)
    npad = nch * chunk
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, npad - n), (0, 0)))
    tq = jnp.arange(npad, dtype=jnp.int32)
    rows_q = jnp.maximum(tq - 1, 0) // gw
    cols_q = jnp.maximum(tq - 1, 0) % gw
    qs = qp.reshape(b, h, nch, chunk, d).transpose(2, 0, 1, 3, 4)
    # gather/stream the bias tiles in the compute dtype: the hoisted-bias
    # path already stores biases in compute dtype, and the flash kernel
    # accumulates scores in f32 either way — halves the dominant per-chunk
    # gather traffic under bf16
    table = spec.table.astype(q.dtype)

    def body(args):
        qc, rqc, cqc, tqc = args
        dr = rqc[:, None] - rows_k[None, :] + (gh - 1)
        dc = cqc[:, None] - cols_k[None, :] + (gw - 1)
        idx = dr * (2 * gw - 1) + dc
        idx = jnp.where(k_cls[None, :], num_rel + 1, idx)
        idx = jnp.where((tqc == 0)[:, None], num_rel, idx)
        idx = jnp.where((tqc == 0)[:, None] & k_cls[None, :],
                        num_rel + 2, idx)
        # padded queries (tqc >= n) may index out of range; clamp — their
        # output rows are sliced away below
        idx = jnp.clip(idx, 0, num_rel + 2)
        bias_c = table[idx]                       # (chunk, n, H)
        bias_c = bias_c.transpose(2, 0, 1)[None]  # (1, H, chunk, n)
        flash_ok = use_flash if use_flash is not None else _on_tpu()
        if flash_ok:
            try:
                from depthmap_tpu.ops.flash_attention import flash_attention
                return flash_attention(qc, k, v, bias=bias_c, scale=scale)
            except Exception:
                pass
        return attention_xla(qc, k, v, bias_c, scale)

    outs = jax.lax.map(body, (qs,
                              rows_q.reshape(nch, chunk),
                              cols_q.reshape(nch, chunk),
                              tq.reshape(nch, chunk)))
    out = outs.transpose(1, 2, 0, 3, 4).reshape(b, h, npad, d)
    return out[:, :, :n]


def attention_xla(q, k, v, bias: Optional[jax.Array] = None,
                  scale: Optional[float] = None):
    """q, k, v: (B, H, N, D); bias: broadcastable to (B, H, N, N)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                   preferred_element_type=jnp.float32)
    if bias is not None:
        s = s + bias
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v)


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _flash_override() -> Optional[bool]:
    """DEPTHMAP_FLASH_ATTENTION: '1'/'true' forces the Pallas kernel on,
    '0'/'false' forces it off, unset -> auto policy."""
    import os
    v = os.environ.get("DEPTHMAP_FLASH_ATTENTION")
    if v is None or v == "":
        return None
    return v in ("1", "true", "on")


def attention(q, k, v, bias: Optional[jax.Array] = None,
              scale: Optional[float] = None, impl: str = "auto"):
    """Auto policy (measured on v5e, BEiT-512 N=1025 b32): the Pallas flash
    kernel with a whole-row tile and the batch-innermost grid runs the
    bias-carrying attention at 8.3 ms/layer vs 11.5 ms for XLA's
    materialized softmax, and compiles in ~1.5 s — so it is the production
    default on TPU whenever a rel-pos bias is present and the sequence is
    long enough for tiling to pay.  Plain (bias-free) attention stays on
    XLA, which fuses it well at this zoo's lengths."""
    if isinstance(bias, RelBiasSpec):
        # the kill switch / explicit impl govern the per-chunk kernel here
        # too (the chunked gather itself has no Pallas dependence)
        override = _flash_override()
        flash_ok = (impl != "xla" and override is not False
                    and (impl == "flash" or override is True or _on_tpu()))
        return attention_rel_streamed(q, k, v, bias, scale,
                                      use_flash=flash_ok)
    if impl == "xla":
        return attention_xla(q, k, v, bias, scale)
    override = _flash_override()
    # bias-free policy: XLA fuses small-N softmax attention well, but past
    # ~2k tokens the materialized (B, H, N, M) scores dominate HBM traffic
    # (Marigold's SD2 UNet top level @768: N = 6912 -> 4.8 GB of f32 scores
    # per op); the flash kernel streams them.  Cross-attention with tiny kv
    # (77-token CLIP context) stays on XLA.
    use_flash = impl == "flash" or override is True or (
        impl == "auto" and override is None and _on_tpu()
        and ((bias is not None and q.shape[2] >= 256)
             or (bias is None and q.shape[2] >= 2048
                 and k.shape[2] >= 1024)))
    if not use_flash or override is False:
        return attention_xla(q, k, v, bias, scale)
    try:
        from depthmap_tpu.ops.flash_attention import flash_attention
        return flash_attention(q, k, v, bias=bias, scale=scale)
    except Exception:
        return attention_xla(q, k, v, bias, scale)
