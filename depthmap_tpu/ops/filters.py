"""Separable image filters with OpenCV-parity kernels and borders.

The reference normal-map stage uses cv2.GaussianBlur(k,(k,k),k) and
cv2.Sobel(..., ksize) with BORDER_DEFAULT (= REFLECT_101) — see
src/normalmap_generation.py:24-29.  We reproduce the exact kernel
coefficients host-side (float64) and run the convolutions as XLA ops so they
fuse with the rest of the normal-map pipeline on TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def gaussian_kernel1d(ksize: int, sigma: float) -> tuple:
    """cv2.getGaussianKernel equivalent (sigma > 0 branch), float64."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    i = np.arange(ksize, dtype=np.float64)
    x = i - (ksize - 1) * 0.5
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    k /= k.sum()
    return tuple(k.tolist())


@functools.lru_cache(maxsize=None)
def deriv_kernel1d(order: int, ksize: int) -> tuple:
    """cv2.getDerivKernels equivalent for Sobel: binomial smoothing
    [1,1]^(ksize-1-order) convolved with difference [-1,1]^order."""
    assert ksize % 2 == 1 and ksize >= 1
    if ksize == 1:
        base = {0: [1.0], 1: [-1.0, 0.0, 1.0]}[order]  # cv2: 1x3 for ksize=1
        return tuple(base)
    k = np.array([1.0])
    for _ in range(ksize - 1 - order):
        k = np.convolve(k, [1.0, 1.0])
    for _ in range(order):
        k = np.convolve(k, [-1.0, 1.0])
    return tuple(k.tolist())


def _reflect101_pad(x: jax.Array, py: int, px: int) -> jax.Array:
    """cv2 BORDER_REFLECT_101 == numpy 'reflect'."""
    pad = [(py, py), (px, px)] + [(0, 0)] * (x.ndim - 2)
    return jnp.pad(x, pad, mode="reflect")


def sep_filter2d(x: jax.Array, kx, ky) -> jax.Array:
    """Separable correlation (cv2.sepFilter2D semantics: kernels applied as
    correlation, REFLECT_101 border).  kx runs along axis 1 (width), ky along
    axis 0 (height).  Works on (H, W) or (H, W, C)."""
    kx = jnp.asarray(kx, dtype=x.dtype)
    ky = jnp.asarray(ky, dtype=x.dtype)
    rx = (kx.shape[0] - 1) // 2
    ry = (ky.shape[0] - 1) // 2
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    xp = _reflect101_pad(x, ry, rx)
    # NHWC conv with depthwise identity: run the two 1-D passes as dots.
    # horizontal pass (correlation: no kernel flip)
    def corr(arr, k, axis):
        n = k.shape[0]
        out = jnp.zeros_like(arr[tuple(
            slice(None) if a != axis else slice(n - 1, arr.shape[axis])
            for a in range(arr.ndim))])
        for i in range(n):
            sl = tuple(
                slice(None) if a != axis else slice(i, arr.shape[axis] - (n - 1 - i))
                for a in range(arr.ndim))
            out = out + k[i] * arr[sl]
        return out

    h = corr(xp, kx, axis=1)
    v = corr(h, ky, axis=0)
    return v[..., 0] if squeeze else v


def gaussian_blur(x: jax.Array, ksize: int, sigma: float | None = None) -> jax.Array:
    """cv2.GaussianBlur(x, (ksize, ksize), sigma) parity (sigmaY = sigmaX)."""
    if ksize is None or ksize <= 0:
        return x
    if ksize % 2 == 0:
        # cv2 asserts "ksize.width must be positive and odd"; the separable
        # correlation below would silently shrink the image by one pixel
        raise ValueError(f"gaussian_blur ksize must be odd, got {ksize}")
    if sigma is None:
        sigma = float(ksize)
    k = gaussian_kernel1d(int(ksize), float(sigma))
    return sep_filter2d(x, k, k)


def sobel(x: jax.Array, dx: int, dy: int, ksize: int = 3) -> jax.Array:
    """cv2.Sobel(x, CV_64F/CV_32F, dx, dy, ksize) parity."""
    kx = deriv_kernel1d(dx, ksize)
    ky = deriv_kernel1d(dy, ksize)
    return sep_filter2d(x, kx, ky)


def np_gradient_2d(x: jax.Array):
    """numpy.gradient for a 2-D array: returns (d/dy, d/dx), central
    differences in the interior and one-sided at the edges."""
    def grad(arr, axis):
        upper = jnp.take(arr, jnp.arange(2, arr.shape[axis]), axis=axis)
        lower = jnp.take(arr, jnp.arange(0, arr.shape[axis] - 2), axis=axis)
        interior = (upper - lower) / 2.0
        first = (jnp.take(arr, jnp.array([1]), axis=axis)
                 - jnp.take(arr, jnp.array([0]), axis=axis))
        last = (jnp.take(arr, jnp.array([arr.shape[axis] - 1]), axis=axis)
                - jnp.take(arr, jnp.array([arr.shape[axis] - 2]), axis=axis))
        return jnp.concatenate([first, interior, last], axis=axis)
    return grad(x, 0), grad(x, 1)
