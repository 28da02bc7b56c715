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
from typing import Optional

import jax
import jax.numpy as jnp


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
    if impl == "xla":
        return attention_xla(q, k, v, bias, scale)
    override = _flash_override()
    use_flash = impl == "flash" or override is True or (
        impl == "auto" and override is None and _on_tpu()
        and bias is not None and q.shape[2] >= 256)
    if not use_flash or override is False:
        return attention_xla(q, k, v, bias, scale)
    try:
        from depthmap_tpu.ops.flash_attention import flash_attention
        return flash_attention(q, k, v, bias=bias, scale=scale)
    except Exception:
        return attention_xla(q, k, v, bias, scale)
