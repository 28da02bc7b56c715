"""Triangle rasterizer fidelity (VERDICT r2 #4): the jit z-buffer triangle
renderer must match an exact numpy per-pixel oracle rasterization; the
point-splat fast path is quantified against the same oracle (silhouette-band
error) to justify the triangles-by-default choice.

The oracle mirrors the GL semantics the reference relies on
(inpaint/mesh.py:2413-2510): perspective camera, barycentric coverage at
pixel centers, perspective-correct depth + color, nearest-depth wins.
"""
from __future__ import annotations

import numpy as np
import pytest


def oracle_raster(verts, colors, faces, cam_t, fov_rad, size):
    """Exact per-pixel triangle rasterization (numpy, O(F * bbox))."""
    verts = np.asarray(verts, np.float64)
    colors = np.asarray(colors, np.float64)
    if colors.max() > 1.0 + 1e-6:
        colors = colors / 255.0
    colors = colors[:, :3]
    thf = np.tan(fov_rad / 2.0)
    p = verts - np.asarray(cam_t, np.float64)
    z = -p[:, 2]
    zs = np.where(z > 1e-6, z, 1.0)
    px = (p[:, 0] / zs / thf * 0.5 + 0.5) * (size - 1)
    py = (0.5 - p[:, 1] / zs / thf * 0.5) * (size - 1)

    zbuf = np.full((size, size), np.inf)
    rgb = np.full((size, size, 3), 0.5)
    for (i0, i1, i2) in np.asarray(faces, np.int64):
        if min(z[i0], z[i1], z[i2]) <= 1e-6:
            continue
        ax, ay, bx, by, cx, cy = px[i0], py[i0], px[i1], py[i1], px[i2], py[i2]
        area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        if abs(area) < 1e-12:
            continue
        x0 = max(int(np.floor(min(ax, bx, cx))), 0)
        x1 = min(int(np.ceil(max(ax, bx, cx))), size - 1)
        y0 = max(int(np.floor(min(ay, by, cy))), 0)
        y1 = min(int(np.ceil(max(ay, by, cy))), size - 1)
        iz = np.array([1 / z[i0], 1 / z[i1], 1 / z[i2]])
        cz = np.stack([colors[i0] * iz[0], colors[i1] * iz[1],
                       colors[i2] * iz[2]])
        for yy in range(y0, y1 + 1):
            for xx in range(x0, x1 + 1):
                w0 = ((cx - bx) * (yy - by) - (cy - by) * (xx - bx)) / area
                w1 = ((ax - cx) * (yy - cy) - (ay - cy) * (xx - cx)) / area
                w2 = ((bx - ax) * (yy - ay) - (by - ay) * (xx - ax)) / area
                if w0 < 0 or w1 < 0 or w2 < 0:
                    continue
                inv_z = w0 * iz[0] + w1 * iz[1] + w2 * iz[2]
                zp = 1.0 / max(inv_z, 1e-12)
                if zp < zbuf[yy, xx] * (1 + 1e-4):
                    if zp < zbuf[yy, xx]:
                        zbuf[yy, xx] = zp
                    rgb[yy, xx] = (w0 * cz[0] + w1 * cz[1] + w2 * cz[2]) \
                        / inv_z
    return rgb, zbuf


def _scene_mesh(H=48, W=64):
    """Foreground LDI-style mesh from a nested-occlusion scene."""
    from depthmap_tpu.pipeline.inpaint_mesh import build_ldi
    rng = np.random.default_rng(0)
    depth = np.full((H, W), 10.0)
    depth[12:36, 16:48] = 5.0
    depth[18:30, 24:40] = 2.0
    img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
    int_mtx = np.array([[max(H, W), 0, W / 2.],
                        [0, max(H, W), H / 2.],
                        [0, 0, 1]])
    cfg = {"depth_threshold": 0.04, "background_thickness": 70}
    verts, colors, faces, mld = build_ldi(img, depth, int_mtx, cfg)
    hfov = 2 * np.arctan(0.5 * W / (int_mtx[0, 0] * W))
    vfov = 2 * np.arctan(0.5 * H / (int_mtx[1, 1] * H))
    return (np.asarray(verts), np.asarray(colors), np.asarray(faces),
            max(hfov, vfov))


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return np.inf if mse == 0 else 10 * np.log10(1.0 / mse)


@pytest.mark.parametrize("cam_t", [(0.0, 0.0, 0.0), (0.02, -0.015, -0.03)])
def test_triangle_raster_matches_oracle(cam_t):
    from depthmap_tpu.pipeline.render import MeshRenderer
    verts, colors, faces, fov = _scene_mesh()
    size = 64
    r = MeshRenderer(verts, colors, faces, fov, size, ssaa=1,
                     method="triangles")
    ours = r.render(np.asarray(cam_t)).astype(np.float64) / 255.0
    ref_rgb, _ = oracle_raster(verts, colors, faces, cam_t, fov, size)
    # f32-vs-f64 barycentrics can flip coverage of edge-grazing pixel
    # centers and z-tie winners; everything else is identical
    diff = np.abs(ours - ref_rgb).max(axis=-1)
    frac_off = (diff > 2 / 255).mean()
    psnr = _psnr(ours, ref_rgb)
    print(f"cam={cam_t}: PSNR={psnr:.1f} dB, >2/255 pixels={frac_off:.4%}")
    assert psnr > 30.0, psnr
    assert frac_off < 0.01, frac_off


def test_triangles_beat_splat_on_silhouettes():
    """Quantified justification for triangles-by-default: within 2 px of
    oracle depth discontinuities the splat must show strictly more error."""
    import cv2
    from depthmap_tpu.pipeline.render import MeshRenderer
    verts, colors, faces, fov = _scene_mesh()
    size = 64
    cam = (0.02, -0.015, -0.03)
    ref_rgb, zbuf = oracle_raster(verts, colors, faces, cam, fov, size)
    band = np.zeros((size, size), np.uint8)
    zb = np.where(np.isfinite(zbuf), zbuf, zbuf[np.isfinite(zbuf)].max())
    edges = (np.abs(np.diff(zb, axis=0, prepend=zb[:1])) > 0.5) | \
            (np.abs(np.diff(zb, axis=1, prepend=zb[:, :1])) > 0.5)
    band = cv2.dilate(edges.astype(np.uint8), np.ones((5, 5), np.uint8)) > 0

    out = {}
    for method in ("triangles", "splat"):
        r = MeshRenderer(verts, colors, faces, fov, size, ssaa=1,
                         method=method)
        img = r.render(np.asarray(cam)).astype(np.float64) / 255.0
        err = np.abs(img - ref_rgb).max(axis=-1)
        out[method] = (err[band].mean(), err.mean())
    tri_band, tri_all = out["triangles"]
    sp_band, sp_all = out["splat"]
    print(f"silhouette-band mean err: triangles={tri_band:.4f} "
          f"splat={sp_band:.4f}; full-frame: {tri_all:.4f} / {sp_all:.4f}")
    assert tri_band < sp_band * 0.5, (tri_band, sp_band)
    assert tri_all < sp_all, (tri_all, sp_all)


def test_raster_ssaa_and_footprint_drop():
    """SSAA post chain runs for the triangle path and oversized faces are
    dropped, not partially drawn: a giant triangle past the K cap leaves the
    background untouched rather than leaving a K-truncated wedge."""
    from depthmap_tpu.pipeline.render import MeshRenderer
    # one small valid triangle + one face spanning half the screen
    verts = np.array([[0.0, 0.0, -2.0], [0.3, 0.0, -2.0],
                      [0.0, 0.3, -2.0],
                      [-0.9, -0.9, -2.0], [0.9, -0.9, -2.0],
                      [0.0, 0.9, -2.0]], np.float32)
    colors = np.array([[1, 0, 0]] * 3 + [[0, 1, 0]] * 3, np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]])
    r = MeshRenderer(verts, colors, faces, np.pi / 2, 32, ssaa=2,
                     method="triangles")
    assert r._K <= 16
    img = r.render(np.zeros(3))
    assert img.shape == (32, 32, 3)
    # the small triangle rendered (red near center)...
    assert (img[..., 0] > 128).any()
    # ...the oversized one was dropped entirely (no green anywhere)
    green = (img[..., 1] > 160) & (img[..., 0] < 96)
    assert not green.any()


def test_splat_path_unchanged():
    """The fast path still renders (regression guard for video mode)."""
    from depthmap_tpu.pipeline.render import MeshRenderer
    verts, colors, faces, fov = _scene_mesh()
    r = MeshRenderer(verts, colors, faces, fov, 48, ssaa=2, method="splat")
    img = r.render(np.zeros(3))
    assert img.shape == (48, 48, 3)
    assert img.std() > 1.0


def test_footprint_grows_with_zoom():
    """A dolly/zoom that grows faces past the init-time footprint must not
    drop them (K re-measures per frame, monotonic ladder) — the round-3
    review caught the static-K hole."""
    from depthmap_tpu.pipeline.render import MeshRenderer
    verts = np.array([[0.0, 0.0, -4.0], [0.3, 0.0, -4.0],
                      [0.0, 0.3, -4.0]], np.float32)
    colors = np.array([[1, 0, 0]] * 3, np.float32)
    faces = np.array([[0, 1, 2]])
    r = MeshRenderer(verts, colors, faces, np.pi / 2, 48, ssaa=1,
                     method="triangles")
    k0 = r._K
    far = r.render(np.zeros(3))
    assert (far[..., 0] > 128).any()
    # dolly in: camera z -3.2 -> face 5x larger on screen
    near = r.render(np.array([0.0, 0.0, -3.2]))
    assert r._K >= k0
    n_red_far = (far[..., 0] > 128).sum()
    n_red_near = (near[..., 0] > 128).sum()
    assert n_red_near > 4 * n_red_far, (n_red_far, n_red_near)
