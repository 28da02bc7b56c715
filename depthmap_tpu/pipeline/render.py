"""Software mesh renderer for trajectory videos (vispy/OpenGL replacement).

The reference renders the LDI mesh per frame with vispy -> OpenGL/EGL
(inpaint/mesh.py:2369-2560): triangles, perspective camera, SSAA canvas,
then GaussianBlur(ssaa//2*2+1) + INTER_AREA downsample (mesh.py:2505-2509).

Here the default renderer is a jit-compiled JAX barycentric z-buffer
TRIANGLE rasterizer: faces are projected with the perspective camera, each
covered by a static KxK tap footprint around its bbox origin (K measured
from the mesh at init), depth is scatter-min'ed at SSAA scale, then colors
are resolved perspective-correct where a face's interpolated depth wins the
buffer.  The earlier point-splat survives as the fast path
(``method="splat"``); fidelity numbers for both are in PARITY.md.
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
    translation.  Returns (size, size, 3) float framebuffer (gray bg)."""
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


def _project(verts, cam_t, tan_half_fov, size):
    """Screen coords + camera depth for the shared pinhole convention."""
    p = verts - cam_t
    z = -p[:, 2]
    zs = jnp.where(z > 1e-6, z, 1.0)
    px = ((p[:, 0] / zs) / tan_half_fov * 0.5 + 0.5) * (size - 1)
    py = (0.5 - (p[:, 1] / zs) / tan_half_fov * 0.5) * (size - 1)
    return px, py, z


def _face_taps(px, py, z, colors, face_chunk, size: int, K: int):
    """Per-face tap indices / depths / colors for one chunk of faces.

    Each face covers the KxK integer-pixel block anchored at the floor of
    its screen bbox minimum; taps outside the triangle (or the canvas, or
    from degenerate/behind-camera/oversized faces) map to the drop bucket.
    Returns flat (C*K*K,) idx, ztap and (C*K*K, 3) color arrays.
    """
    i0, i1, i2 = face_chunk[:, 0], face_chunk[:, 1], face_chunk[:, 2]
    ax, ay, az = px[i0], py[i0], z[i0]
    bx, by, bz = px[i1], py[i1], z[i1]
    cx, cy, cz = px[i2], py[i2], z[i2]
    ca, cb, cc = colors[i0], colors[i1], colors[i2]

    # signed double-area; both windings render (the reference's GL canvas
    # does not cull — LDI background layers face the camera either way)
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    x0 = jnp.floor(jnp.minimum(ax, jnp.minimum(bx, cx))).astype(jnp.int32)
    y0 = jnp.floor(jnp.minimum(ay, jnp.minimum(by, cy))).astype(jnp.int32)
    ext_x = jnp.ceil(jnp.maximum(ax, jnp.maximum(bx, cx))).astype(jnp.int32) - x0
    ext_y = jnp.ceil(jnp.maximum(ay, jnp.maximum(by, cy))).astype(jnp.int32) - y0
    ok_face = ((az > 1e-6) & (bz > 1e-6) & (cz > 1e-6)
               & (jnp.abs(area) > 1e-12)
               & (ext_x < K) & (ext_y < K))

    inv_area = jnp.where(jnp.abs(area) > 1e-12, 1.0 / area, 0.0)
    iza, izb, izc = 1.0 / az, 1.0 / bz, 1.0 / cz

    dx = jnp.arange(K, dtype=jnp.int32)
    xg = x0[:, None] + dx[None, :]                      # (C, K)
    yg = y0[:, None] + dx[None, :]                      # (C, K)
    xf = xg.astype(jnp.float32)[:, None, :]             # (C, 1, K)
    yf = yg.astype(jnp.float32)[:, :, None]             # (C, K, 1)

    # edge functions -> normalized barycentrics (sign-safe via inv_area)
    w0 = ((cx - bx)[:, None, None] * (yf - by[:, None, None])
          - (cy - by)[:, None, None] * (xf - bx[:, None, None]))
    w1 = ((ax - cx)[:, None, None] * (yf - cy[:, None, None])
          - (ay - cy)[:, None, None] * (xf - cx[:, None, None]))
    w2 = ((bx - ax)[:, None, None] * (yf - ay[:, None, None])
          - (by - ay)[:, None, None] * (xf - ax[:, None, None]))
    b0 = w0 * inv_area[:, None, None]
    b1 = w1 * inv_area[:, None, None]
    b2 = w2 * inv_area[:, None, None]
    inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0)

    # perspective-correct depth: 1/z is affine in screen space
    inv_z = (b0 * iza[:, None, None] + b1 * izb[:, None, None]
             + b2 * izc[:, None, None])
    ztap = 1.0 / jnp.maximum(inv_z, 1e-12)

    inb = ((xg >= 0) & (xg < size))[:, None, :] \
        & ((yg >= 0) & (yg < size))[:, :, None]
    ok = inside & inb & ok_face[:, None, None]

    BIG = jnp.int32(size * size)
    lin = yg[:, :, None] * size + xg[:, None, :]
    idx = jnp.where(ok, lin, BIG).reshape(-1)
    ztap = jnp.where(ok, ztap, jnp.inf).reshape(-1)

    # perspective-correct color: attr = sum(b_i * c_i / z_i) / sum(b_i / z_i)
    cnum = (b0[..., None] * (ca * iza[:, None])[:, None, None, :]
            + b1[..., None] * (cb * izb[:, None])[:, None, None, :]
            + b2[..., None] * (cc * izc[:, None])[:, None, None, :])
    ctap = (cnum / jnp.maximum(inv_z, 1e-12)[..., None]).reshape(-1, 3)
    return idx, ztap, ctap


@functools.partial(jax.jit, static_argnames=("size", "K", "chunk"))
def _raster(verts, colors, faces, cam_t, tan_half_fov,
            size: int, K: int, chunk: int):
    """Triangle z-buffer rasterization.  faces: (F, 3) int32, F a multiple
    of `chunk` (pad with degenerate (0,0,0) faces — zero area drops them).
    Two passes inside one program: scatter-min depth, then resolve colors
    where a face's tap depth wins its pixel."""
    px, py, z = _project(verts, cam_t, tan_half_fov, size)
    n_chunks = faces.shape[0] // chunk

    def min_body(i, zbuf):
        fc = jax.lax.dynamic_slice_in_dim(faces, i * chunk, chunk)
        idx, ztap, _ = _face_taps(px, py, z, colors, fc, size, K)
        return zbuf.at[idx].min(ztap, mode="drop")

    zbuf = jax.lax.fori_loop(
        0, n_chunks, min_body,
        jnp.full((size * size,), jnp.inf, jnp.float32))

    eps = 1e-4

    def color_body(i, rgb):
        fc = jax.lax.dynamic_slice_in_dim(faces, i * chunk, chunk)
        idx, ztap, ctap = _face_taps(px, py, z, colors, fc, size, K)
        zwin = zbuf[jnp.clip(idx, 0, size * size - 1)]
        won = ztap <= zwin * (1 + eps)
        widx = jnp.where(won & (idx < size * size), idx,
                         jnp.int32(size * size))
        return rgb.at[widx].set(ctap, mode="drop")

    rgb = jax.lax.fori_loop(
        0, n_chunks, color_body,
        jnp.full((size * size, 3), 0.5, jnp.float32))
    return rgb.reshape(size, size, 3)


class MeshRenderer:
    """Per-mesh renderer with the reference's canvas/crop conventions.

    ``method="triangles"`` (default) rasterizes the LDI faces like the
    reference's GL canvas; ``method="splat"`` is the round-2 point splat
    (faster, softer silhouettes — quantified in PARITY.md).
    """

    # footprint ladder: K re-measured per frame (faces grow under zoom /
    # dolly fov changes); quantized so a trajectory compiles at most a
    # handful of raster programs, and monotonic so K never shrinks back
    _K_LADDER = (3, 4, 6, 8, 12, 16)

    def __init__(self, verts, colors, faces, fov_rad: float,
                 canvas_size: int, ssaa: int = 1,
                 method: str = "triangles"):
        self.verts = jnp.asarray(verts, jnp.float32)
        self._verts_np = np.asarray(verts, np.float32)
        colors = np.asarray(colors, np.float32)
        if colors.max() > 1.0 + 1e-6:
            colors = colors / 255.0
        self.colors = jnp.asarray(colors[:, :3])
        self.fov_rad = fov_rad
        self.ssaa = max(int(ssaa), 1)
        self.size = int(canvas_size * self.ssaa)
        self.method = method
        faces = np.asarray(faces, np.int64)
        if method == "triangles" and len(faces):
            self._faces_np = faces
            self._K = 0
            self._set_K(self._measure_footprint(np.zeros(3), self.fov_rad))
        else:
            self.method = "splat"
            self.faces = None

    def _set_K(self, k: int) -> None:
        if k <= self._K:
            return
        self._K = k
        # ~1M taps per chunk keeps scatter operands modest on both
        # backends; chunk must divide the padded face count.  Cap the face
        # count per chunk too: at K=3 an uncapped 1M-tap chunk is 116k
        # faces wide and the resulting scatter failed server-side
        # compilation on v5e (65536 is the measured-good width).  XLA
        # compile time grows with the scatter operand, so a smaller chunk
        # trades first-render latency for a few extra loop iterations —
        # tunable via DEPTHMAP_RASTER_CHUNK.
        import os
        cap = int(os.environ.get("DEPTHMAP_RASTER_CHUNK", "65536"))
        self._chunk = min(max(256, (1 << 20) // (k * k)), max(256, cap))
        faces = self._faces_np
        pad = (-len(faces)) % self._chunk
        if pad:
            faces = np.concatenate([faces, np.zeros((pad, 3), np.int64)])
        self.faces = jnp.asarray(faces, jnp.int32)

    def _measure_footprint(self, cam_t, fov: float) -> int:
        """KxK tap block per face at THIS camera: p99.9 projected bbox
        extent + margin, snapped up to the ladder.  Oversized faces (past
        tears the LDI already bridges with background layers) are dropped
        at render time rather than partially drawn."""
        thf = float(np.tan(fov / 2.0))
        p = self._verts_np - np.asarray(cam_t, np.float32)
        z = -p[:, 2]
        zs = np.where(z > 1e-6, z, 1.0)
        px = (p[:, 0] / zs / thf * 0.5 + 0.5) * (self.size - 1)
        py = (0.5 - p[:, 1] / zs / thf * 0.5) * (self.size - 1)
        fx = px[self._faces_np]
        fy = py[self._faces_np]
        ext = np.maximum(fx.max(1) - fx.min(1), fy.max(1) - fy.min(1))
        k = int(np.clip(int(np.ceil(np.percentile(ext, 99.9))) + 3, 3, 16))
        for lk in self._K_LADDER:
            if k <= lk:
                return lk
        return self._K_LADDER[-1]

    def render(self, cam_t, fov_rad: Optional[float] = None) -> np.ndarray:
        fov = fov_rad if fov_rad is not None else self.fov_rad
        thf = float(np.tan(fov / 2.0))
        cam = jnp.asarray(cam_t, jnp.float32)
        if self.method == "triangles":
            self._set_K(self._measure_footprint(cam_t, fov))
            img = _raster(self.verts, self.colors, self.faces, cam, thf,
                          self.size, self._K, self._chunk)
        else:
            img = _splat(self.verts, self.colors, cam, thf, self.size)
        img = np.asarray(img)
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        k = int(self.ssaa // 2 * 2 + 1)
        if k > 1:
            img = cv2.GaussianBlur(img, (k, k), 0)
        out_size = self.size // self.ssaa
        img = cv2.resize(img, (out_size, out_size),
                         interpolation=cv2.INTER_AREA)
        return img
