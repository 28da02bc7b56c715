"""Image resizing with exact torch.nn.functional.interpolate semantics.

The reference upsamples model outputs with torch bicubic/bilinear
(align_corners True or False depending on family — e.g.
src/depthmap_generation.py:488-494 bicubic align_corners=False for MiDaS,
:558 bilinear align_corners=True for Depth Anything v2).  JAX's
``jax.image.resize`` uses different kernel/phase conventions, so the
interpolation is built from torch's exact tap positions/weights.

Implementation: separable gather-based taps — for every output position the
(2 bilinear / 4 bicubic) source rows are gathered and combined with
precomputed weights.  O(out) work per axis (bandwidth-bound on the VPU)
instead of the O(out x in) dense-matrix contraction of a matmul resize —
the DPT decoders upsample large feature maps every block, so this is on the
model hot path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """torch/cv2 bicubic convolution kernel (a=-0.75)."""
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    return np.where(
        ax <= 1, (a + 2) * ax3 - (a + 3) * ax2 + 1,
        np.where(ax < 2, a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a, 0.0))


@functools.lru_cache(maxsize=None)
def _resize_taps(in_size: int, out_size: int, mode: str, align_corners: bool,
                 scale: float | None = None):
    """((T, out) int32 indices, (T, out) float32 weights), torch semantics.

    ``scale`` reproduces torch's explicit scale_factor coordinate mapping
    (used by DINOv2 pos-embed interpolation with its +0.1 offset).
    """
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners:
        src = np.zeros(1) if out_size == 1 else \
            dst * (in_size - 1) / (out_size - 1)
    elif scale is not None:
        src = (dst + 0.5) / scale - 0.5
    else:
        src = (dst + 0.5) * in_size / out_size - 0.5

    if mode == "nearest":
        # torch nearest with an explicit scale_factor maps floor(dst/scale)
        # (align_corners is ignored by torch for this mode)
        ratio = (1.0 / scale) if scale is not None else in_size / out_size
        idx = np.clip(np.floor(dst * ratio), 0,
                      in_size - 1).astype(np.int32)
        return idx[None], np.ones((1, out_size), np.float32)

    if mode == "bilinear":
        s = np.maximum(src, 0.0)   # torch clamps the low side
        i0 = np.floor(s).astype(np.int64)
        frac = s - i0
        idx = np.stack([np.clip(i0, 0, in_size - 1),
                        np.clip(i0 + 1, 0, in_size - 1)])
        w = np.stack([1 - frac, frac])
        return idx.astype(np.int32), w.astype(np.float32)

    if mode == "bicubic":
        i0 = np.floor(src).astype(np.int64)
        frac = src - i0
        idx = np.stack([np.clip(i0 + t, 0, in_size - 1)
                        for t in range(-1, 3)])
        w = np.stack([_cubic_kernel(t - frac) for t in range(-1, 3)])
        return idx.astype(np.int32), w.astype(np.float32)

    raise ValueError(f"Unknown mode {mode!r}")


@functools.lru_cache(maxsize=None)
def _resize_matrix(in_size: int, out_size: int, mode: str,
                   align_corners: bool, scale: float | None = None):
    """Dense (out, in) tap matrix: W[o, i] = summed weight of source i for
    output o (duplicate clipped-edge taps accumulate, matching the gather
    formulation exactly)."""
    idx, w = _resize_taps(in_size, out_size, mode, align_corners, scale)
    W = np.zeros((out_size, in_size), np.float32)
    for t in range(idx.shape[0]):
        np.add.at(W, (np.arange(out_size), idx[t]), w[t])
    return W


@functools.lru_cache(maxsize=1)
def _use_matmul_resize() -> bool:
    """TPU: spatial-axis gathers are ~2x slower than a dense tap-matrix
    contraction on the MXU (measured on v5e, 256->512 bilinear 128ch b8:
    gather 11.2 ms vs einsum 5.9 ms).  CPU (tests, parity oracles) keeps the
    2/4-tap gather path.  DEPTHMAP_MATMUL_RESIZE=0/1 overrides."""
    import os
    v = os.environ.get("DEPTHMAP_MATMUL_RESIZE")
    if v not in (None, ""):
        return v in ("1", "true", "on")
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


# a (4096 x 4096) f32 tap matrix is 64 MB — beyond this the dense
# formulation stops paying for itself
_MATMUL_RESIZE_CAP = 4096 * 4096


def _axis_resize_matmul(x: jax.Array, axis: int, out_size: int, mode: str,
                        align_corners: bool, scale=None) -> jax.Array:
    in_size = x.shape[axis]
    W = jnp.asarray(_resize_matrix(in_size, out_size, mode, align_corners,
                                   scale)).astype(x.dtype)
    letters = "abcdefgh"[:x.ndim]
    lx = "".join(letters)
    lo = lx.replace(letters[axis], "z")
    # f32 accumulation; 'highest' costs nothing extra at these shapes
    out = jnp.einsum(f"{lx},z{letters[axis]}->{lo}", x, W,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return out.astype(x.dtype)


def _axis_resize(x: jax.Array, axis: int, out_size: int, mode: str,
                 align_corners: bool, scale=None) -> jax.Array:
    in_size = x.shape[axis]
    if in_size == out_size and scale is None:
        # identity taps are exact for matching sizes in all torch modes
        # (incl. bicubic: the kernel weights collapse to [0, 1, 0, 0])
        return x
    if (_use_matmul_resize() and jnp.issubdtype(x.dtype, jnp.floating)
            and in_size * out_size <= _MATMUL_RESIZE_CAP):
        return _axis_resize_matmul(x, axis, out_size, mode, align_corners,
                                   scale)
    idx, w = _resize_taps(in_size, out_size, mode, align_corners, scale)
    wshape = [1] * x.ndim
    wshape[axis] = out_size
    out = None
    for t in range(idx.shape[0]):
        g = jnp.take(x, jnp.asarray(idx[t]), axis=axis)
        wt = jnp.asarray(w[t]).reshape(wshape).astype(g.dtype)
        out = g * wt if out is None else out + g * wt
    return out


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
    sh, sw = scales if scales is not None else (None, None)
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    x = x.astype(dtype)
    x = _axis_resize(x, h_ax, out_h, mode, align_corners, sh)
    x = _axis_resize(x, w_ax, out_w, mode, align_corners, sw)
    return x


def scale2x(x: jax.Array, mode: str = "bilinear",
            align_corners: bool = False) -> jax.Array:
    """F.interpolate(scale_factor=2) equivalent."""
    h_ax = x.ndim - 3 if x.ndim >= 3 else 0
    w_ax = h_ax + 1
    return interpolate(x, (2 * x.shape[h_ax], 2 * x.shape[w_ax]), mode,
                       align_corners)
