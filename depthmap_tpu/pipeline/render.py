"""Software mesh renderer for trajectory videos (vispy/OpenGL replacement).

The reference renders the LDI mesh per frame with vispy -> OpenGL/EGL
(inpaint/mesh.py:2369-2560).  Here rendering is a jit-compiled JAX z-buffer
splat: vertices are projected with the perspective camera, splatted with a
3x3 footprint at SSAA scale using scatter-min on depth, then blurred and
box-downsampled exactly like the reference post-processing
(GaussianBlur(ssaa//2*2+1) + INTER_AREA resize, mesh.py:2505-2509).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("size",))
def _splat(verts, colors, cam_t, tan_half_fov, size: int):
    """verts: (N, 3) with z<0; colors (N, 3) in [0,1]; cam_t: (3,) camera
    translation.  Returns (size, size, 3) uint8 framebuffer (gray bg)."""
    p = verts - cam_t
    z = -p[:, 2]
    valid = z > 1e-6
    zs = jnp.where(valid, z, 1.0)
    ndc_x = (p[:, 0] / zs) / tan_half_fov
    ndc_y = (p[:, 1] / zs) / tan_half_fov
    px = (ndc_x * 0.5 + 0.5) * (size - 1)
    py = (0.5 - ndc_y * 0.5) * (size - 1)
    xi = jnp.round(px).astype(jnp.int32)
    yi = jnp.round(py).astype(jnp.int32)
    inb = valid & (xi >= -1) & (xi <= size) & (yi >= -1) & (yi <= size)

    zbuf = jnp.full((size * size,), jnp.inf, jnp.float32)
    BIG = jnp.int32(size * size)  # out-of-bounds bucket (dropped)

    # 3x3 splat footprint
    idxs = []
    zvals = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            xo = xi + dx
            yo = yi + dy
            ok = inb & (xo >= 0) & (xo < size) & (yo >= 0) & (yo < size)
            idxs.append(jnp.where(ok, yo * size + xo, BIG))
            zvals.append(jnp.where(ok, z, jnp.inf))
    flat_idx = jnp.concatenate(idxs)
    flat_z = jnp.concatenate(zvals)
    zbuf = zbuf.at[flat_idx].min(flat_z, mode="drop")

    # winner: vertex whose z equals the buffer value at its pixel
    eps = 1e-4
    rgb = jnp.full((size * size, 3), 0.5, jnp.float32)  # gray background
    n_rep = len(idxs)
    flat_colors = jnp.tile(colors, (n_rep, 1))
    won = flat_z <= zbuf[jnp.clip(flat_idx, 0, size * size - 1)] * (1 + eps)
    write_idx = jnp.where(won & (flat_idx < BIG), flat_idx, BIG)
    rgb = rgb.at[write_idx].set(flat_colors, mode="drop")
    return rgb.reshape(size, size, 3)


class MeshRenderer:
    """Per-mesh renderer with the reference's canvas/crop conventions."""

    def __init__(self, verts, colors, faces, fov_rad: float,
                 canvas_size: int, ssaa: int = 1):
        self.verts = jnp.asarray(verts, jnp.float32)
        colors = np.asarray(colors, np.float32)
        if colors.max() > 1.0 + 1e-6:
            colors = colors / 255.0
        self.colors = jnp.asarray(colors[:, :3])
        self.fov_rad = fov_rad
        self.ssaa = max(int(ssaa), 1)
        self.size = int(canvas_size * self.ssaa)

    def render(self, cam_t, fov_rad: Optional[float] = None) -> np.ndarray:
        fov = fov_rad if fov_rad is not None else self.fov_rad
        img = _splat(self.verts, self.colors, jnp.asarray(cam_t, jnp.float32),
                     float(np.tan(fov / 2.0)), self.size)
        img = np.asarray(img)
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        k = int(self.ssaa // 2 * 2 + 1)
        if k > 1:
            img = cv2.GaussianBlur(img, (k, k), 0)
        out_size = self.size // self.ssaa
        img = cv2.resize(img, (out_size, out_size),
                         interpolation=cv2.INTER_AREA)
        return img
