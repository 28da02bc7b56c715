"""16-bit depth conversion and clip/renormalize semantics.

Reference numerics reproduced exactly:
 - ``convert_to_i16``           src/core.py:44-50
 - ``convert_i16_to_rgb``       src/core.py:52-58
 - clip modes Range/Outliers    src/core.py:196-203
 - broken-map blackout          src/core.py:189,204-206
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_MAX16 = 65536.0


def convert_to_i16(arr: jax.Array) -> jax.Array:
    """[0;1] float depth -> uint16 (round-down, overflow-safe).

    out = clip(arr * 65536 + 0.0001, 0, 65535.9).astype(uint16)
    """
    arr = arr.astype(jnp.float32)
    out = jnp.clip(arr * _MAX16 + 0.0001, 0.0, _MAX16 - 0.1)
    return out.astype(jnp.uint16)


def convert_i16_to_rgb(image: jax.Array, channels: int = 3) -> jax.Array:
    """uint16 single-channel -> uint8 RGB (each channel = value/256, truncated)."""
    c = (image.astype(jnp.float32) / 256.0).astype(jnp.uint8)
    return jnp.stack([c] * channels, axis=-1)


def normalize01(x: jax.Array) -> jax.Array:
    """(x - min) / (max - min); safe when max == min (returns zeros)."""
    x = x.astype(jnp.float32)
    lo = jnp.min(x)
    hi = jnp.max(x)
    rng = hi - lo
    return jnp.where(rng > 0, (x - lo) / jnp.where(rng > 0, rng, 1.0), 0.0)


def clip_depth(out: jax.Array, mode: str, far: float, near: float) -> jax.Array:
    """Clip/renormalize a raw prediction before 16-bit conversion.

    mode "Range":    normalize to [0;1] then clip to [far, near].
    mode "Outliers": clip to the [far*100, near*100] percentiles.
    Always followed by a final normalize-to-[0;1] (as in the funnel).
    """
    out = out.astype(jnp.float32)
    if mode == "Range":
        out = normalize01(out)
        out = jnp.clip(out, far, near)
    elif mode == "Outliers":
        fb = jnp.percentile(out, far * 100.0)
        nb = jnp.percentile(out, near * 100.0)
        out = jnp.clip(out, fb, nb)
    else:
        raise ValueError(f"Unknown clipdepth mode {mode!r}")
    return normalize01(out)


def finalize_depth(raw: jax.Array, invert: bool = False,
                   clip: bool = False, clip_mode: str = "Range",
                   clip_far: float = 0.0, clip_near: float = 1.0) -> jax.Array:
    """Full post-prediction path of the funnel (src/core.py:189-211):
    optional negate (models that predict depth, not disparity), optional clip,
    normalize to [0;1]; a constant map becomes all-zero ("broken" map)."""
    out = raw.astype(jnp.float32)
    if invert:
        out = -out
    broken = jnp.abs(jnp.max(out) - jnp.min(out)) <= jnp.finfo(jnp.float32).eps
    if clip:
        out = clip_depth(out, clip_mode, clip_far, clip_near)
    else:
        out = normalize01(out)
    return jnp.where(broken, jnp.zeros_like(out), out)


def invert_i16(img: jax.Array) -> jax.Array:
    """cv2.bitwise_not on uint16 (reference src/core.py:241)."""
    return (~img.astype(jnp.uint16))


# numpy twins (host-side oracles; used by tests and the CPU fallback path)

def convert_to_i16_np(arr: np.ndarray) -> np.ndarray:
    out = np.clip(arr * _MAX16 + 0.0001, 0, _MAX16 - 0.1)
    return out.astype("uint16")
