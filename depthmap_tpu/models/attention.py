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


def _flash_enabled() -> bool:
    # Default OFF: XLA's fused attention matches the Pallas kernel's runtime
    # at this zoo's sequence lengths (N <= ~4k), while Mosaic compilation of
    # 24 bias-carrying flash blocks is prohibitively slow.  Opt in with
    # DEPTHMAP_FLASH_ATTENTION=1.
    import os
    return os.environ.get("DEPTHMAP_FLASH_ATTENTION", "0") in ("1", "true",
                                                               "on")


def attention(q, k, v, bias: Optional[jax.Array] = None,
              scale: Optional[float] = None, impl: str = "auto"):
    use_flash = impl == "flash" or (impl == "auto" and _flash_enabled())
    if not use_flash:
        return attention_xla(q, k, v, bias, scale)
    try:
        from depthmap_tpu.ops.flash_attention import flash_attention
        return flash_attention(q, k, v, bias=bias, scale=scale)
    except Exception:
        return attention_xla(q, k, v, bias, scale)
