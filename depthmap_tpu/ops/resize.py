"""Image resizing with exact torch.nn.functional.interpolate semantics.

The reference upsamples model outputs with torch bicubic/bilinear
(align_corners True or False depending on family — e.g.
src/depthmap_generation.py:488-494 bicubic align_corners=False for MiDaS,
:558 bilinear align_corners=True for Depth Anything v2).  JAX's
``jax.image.resize`` uses different kernel/phase conventions (Keys a=-0.5,
always half-pixel), so we build the interpolation as two separable
weight-matrix contractions instead: W_h @ x @ W_w^T.  Sizes are static under
jit, so the (out, in) weight matrices are numpy constants baked at trace
time, and the contraction runs on the MXU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """torch/cv2 bicubic convolution kernel (Catmull-Rom family, a=-0.75)."""
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w = np.where(
        ax <= 1, (a + 2) * ax3 - (a + 3) * ax2 + 1,
        np.where(ax < 2, a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a, 0.0))
    return w


@functools.lru_cache(maxsize=None)
def _resize_matrix(in_size: int, out_size: int, mode: str,
                   align_corners: bool,
                   scale: float | None = None) -> np.ndarray:
    """(out_size, in_size) float32 interpolation matrix, torch semantics.

    ``scale`` reproduces torch's scale_factor path (used by DINOv2
    pos-embed interpolation with its +0.1 offset): src = (dst+0.5)/scale-0.5
    with the *given* scale instead of out/in.
    """
    if in_size == out_size and scale is None:
        return np.eye(out_size, dtype=np.float32)
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            src = np.zeros(1)
        else:
            src = dst * (in_size - 1) / (out_size - 1)
    elif scale is not None:
        src = (dst + 0.5) / scale - 0.5
    else:
        src = (dst + 0.5) * in_size / out_size - 0.5

    W = np.zeros((out_size, in_size), dtype=np.float64)
    if mode == "nearest":
        # torch 'nearest' (legacy): floor(dst * in / out)
        idx = np.floor(dst * in_size / out_size).astype(int)
        idx = np.clip(idx, 0, in_size - 1)
        W[np.arange(out_size), idx] = 1.0
        return W.astype(np.float32)

    if mode == "bilinear":
        s = np.clip(src, 0, in_size - 1) if not align_corners else src
        # torch clamps src to >= 0 for align_corners=False
        s = np.maximum(src, 0.0)
        i0 = np.floor(s).astype(int)
        frac = s - i0
        i0c = np.clip(i0, 0, in_size - 1)
        i1c = np.clip(i0 + 1, 0, in_size - 1)
        for o in range(out_size):
            W[o, i0c[o]] += 1 - frac[o]
            W[o, i1c[o]] += frac[o]
        return W.astype(np.float32)

    if mode == "bicubic":
        i0 = np.floor(src).astype(int)
        frac = src - i0
        for tap in range(-1, 3):
            w = _cubic_kernel(tap - frac)
            idx = np.clip(i0 + tap, 0, in_size - 1)
            for o in range(out_size):
                W[o, idx[o]] += w[o]
        return W.astype(np.float32)

    raise ValueError(f"Unknown mode {mode!r}")


def interpolate(x: jax.Array, size, mode: str = "bilinear",
                align_corners: bool = False, scales=None) -> jax.Array:
    """torch F.interpolate parity for NHWC (or HWC / HW) arrays.

    ``size`` is (out_h, out_w); spatial axes are (-3, -2) for >=3D inputs,
    (0, 1) for 2D.  ``scales=(sh, sw)`` forwards torch's explicit
    scale_factor coordinate mapping.
    """
    out_h, out_w = int(size[0]), int(size[1])
    if x.ndim == 2:
        h_ax, w_ax = 0, 1
    else:
        h_ax, w_ax = x.ndim - 3, x.ndim - 2
    in_h, in_w = x.shape[h_ax], x.shape[w_ax]
    sh, sw = scales if scales is not None else (None, None)
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    Wh = jnp.asarray(_resize_matrix(in_h, out_h, mode, align_corners, sh),
                     dtype)
    Ww = jnp.asarray(_resize_matrix(in_w, out_w, mode, align_corners, sw),
                     dtype)
    # interpolation must not degrade to bf16 on the MXU — force f32 accumulate
    y = jnp.tensordot(Wh, x.astype(dtype), axes=((1,), (h_ax,)),
                      precision="highest")
    y = jnp.moveaxis(y, 0, h_ax)
    y = jnp.tensordot(Ww, y, axes=((1,), (w_ax,)), precision="highest")
    y = jnp.moveaxis(y, 0, w_ax)
    return y


def scale2x(x: jax.Array, mode: str = "bilinear",
            align_corners: bool = False) -> jax.Array:
    """F.interpolate(scale_factor=2) equivalent."""
    h_ax = x.ndim - 3 if x.ndim >= 3 else 0
    w_ax = h_ax + 1
    return interpolate(x, (2 * x.shape[h_ax], 2 * x.shape[w_ax]), mode,
                       align_corners)
