"""3D-photo inpainting: LDI mesh construction + mesh file I/O.

Covers the reference inpaint/mesh.py pipeline (write_mesh :1828-2195,
read_mesh/read_obj/read_ply :2196-2368, sparse_bilateral_filtering) with a
TPU-first re-architecture:

 * the depth-discontinuity-aware *weighted-median* bilateral filter is a
   fully-vectorized JAX op (the reference loops per pixel patch);
 * the layered mesh is built as two dense layers — the foreground layer
   (every pixel) and a background layer inpainted by the edge/depth/color
   nets behind depth discontinuities — instead of the reference's
   networkx graph surgery; triangulation never crosses a discontinuity;
 * the mesh file format (OBJ with '# depthmap-script' header carrying
   H/W/hFov/vFov/meanLoc, and binary/ascii PLY with matching comments) is
   kept byte-compatible so meshes interoperate with the reference tooling.
"""
from __future__ import annotations

import functools
import os
import struct
from typing import Dict, List, Optional, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np

MESH_MAGIC = "# depthmap-script v0.4.8-tpu mesh"


# ---------------------------------------------------------------------------
# sparse bilateral filtering (JAX weighted median)
# ---------------------------------------------------------------------------

def vis_depth_discontinuity(depth: np.ndarray,
                            depth_threshold: float) -> np.ndarray:
    """Union of the reference's 4 directional discontinuity maps
    (bilateral_filtering.py:48-104), as one (H, W) float map."""
    disp = 1.0 / depth
    u = np.zeros_like(disp)
    b = np.zeros_like(disp)
    l = np.zeros_like(disp)
    r = np.zeros_like(disp)
    u[1:-1, 1:-1] = np.abs((disp[1:, :] - disp[:-1, :])[:-1, 1:-1])
    b[1:-1, 1:-1] = np.abs((disp[:-1, :] - disp[1:, :])[1:, 1:-1])
    l[1:-1, 1:-1] = np.abs((disp[:, 1:] - disp[:, :-1])[1:-1, :-1])
    r[1:-1, 1:-1] = np.abs((disp[:, :-1] - disp[:, 1:])[1:-1, 1:])
    over = ((u > depth_threshold).astype(np.float32)
            + (b > depth_threshold) + (l > depth_threshold)
            + (r > depth_threshold)).clip(0, 1)
    over[depth == 0] = 1
    return over


@functools.partial(jax.jit, static_argnames=("window_size",))
def _weighted_median_filter(depth, discontinuity, window_size: int):
    """For pixels whose window touches a discontinuity: weighted median of
    the window with weights (1 - discontinuity); others unchanged
    (bilateral_filtering.py:129-172, discontinuity branch)."""
    mid = window_size // 2
    dp = jnp.pad(depth, mid, mode="edge")
    cp = jnp.pad(discontinuity, mid, mode="edge")
    h, w = depth.shape
    # (H, W, K*K) patches
    patches = jnp.stack([
        jax.lax.dynamic_slice(dp, (dy, dx), (h, w))
        for dy in range(window_size) for dx in range(window_size)], axis=-1)
    cpatches = jnp.stack([
        jax.lax.dynamic_slice(cp, (dy, dx), (h, w))
        for dy in range(window_size) for dx in range(window_size)], axis=-1)

    any_disc = jnp.any(cpatches > 0, axis=-1)
    coef = 1.0 - cpatches
    coef_sum = jnp.sum(coef, axis=-1, keepdims=True)
    all_zero = coef_sum[..., 0] == 0
    coef = coef / jnp.where(coef_sum == 0, 1.0, coef_sum)

    order = jnp.argsort(patches, axis=-1)
    sorted_depth = jnp.take_along_axis(patches, order, axis=-1)
    sorted_coef = jnp.take_along_axis(coef, order, axis=-1)
    cum = jnp.cumsum(sorted_coef, axis=-1)
    ind = jnp.sum(cum <= 0.5, axis=-1)
    ind = jnp.clip(ind, 0, window_size * window_size - 1)
    median = jnp.take_along_axis(sorted_depth, ind[..., None], axis=-1)[..., 0]

    center = depth
    out = jnp.where(any_disc & ~all_zero, median, center)
    return out


def sparse_bilateral_filtering(depth: np.ndarray, image: np.ndarray,
                               filter_size: List[int],
                               depth_threshold: float = 0.04,
                               num_iter: int = 5):
    """Returns (images, depths) lists like the reference (core.py:473 uses
    depths[-1]).  Border handling quirk (depth[1:-1] edge pad) replicated."""
    vis_depth = depth.copy().astype(np.float32)
    save_depths = [vis_depth]
    for i in range(num_iter):
        window_size = filter_size[i] if isinstance(filter_size, (list, tuple)) \
            else filter_size
        disc = vis_depth_discontinuity(vis_depth, depth_threshold)
        d = np.pad(vis_depth[1:-1, 1:-1], 1, mode="edge")
        c = np.pad(disc[1:-1, 1:-1], 1, mode="edge")
        vis_depth = np.asarray(_weighted_median_filter(
            jnp.asarray(d), jnp.asarray(c), int(window_size)))
        save_depths.append(vis_depth)
    return [image] * len(save_depths), save_depths


# ---------------------------------------------------------------------------
# camera helpers (reference mesh.py:112-152 conventions)
# ---------------------------------------------------------------------------

def fov_from_int_mtx(int_mtx: np.ndarray, H: int, W: int) -> Tuple[float, float]:
    int_mtx_real_x = int_mtx[0] * W
    int_mtx_real_y = int_mtx[1] * H
    hfov = 2 * np.arctan(0.5 * W / int_mtx_real_x[0])
    vfov = 2 * np.arctan(0.5 * H / int_mtx_real_y[1])
    return float(hfov), float(vfov)


def pixels_to_verts(rows, cols, depth, H, W, hfov, vfov):
    """reproject_3d_int_detail_FB convention (mesh.py:139-151):
    ray = [(-1+2(sy+.5)/(W-1))tan(h/2), (1-2(sx+.5)/(H-1))tan(v/2), -1] * |z|."""
    tx = np.tan(hfov / 2.0)
    ty = np.tan(vfov / 2.0)
    x = (-1.0 + 2.0 * (cols + 0.5) / (W - 1)) * tx * np.abs(depth)
    y = (1.0 - 2.0 * (rows + 0.5) / (H - 1)) * ty * np.abs(depth)
    z = -np.abs(depth)
    return np.stack([x, y, z], axis=-1)


# ---------------------------------------------------------------------------
# LDI construction
# ---------------------------------------------------------------------------

def _grid_faces(index_map: np.ndarray) -> np.ndarray:
    """Triangulate a (H, W) int index map (-1 = no vertex): two triangles per
    cell whose 4 corners all exist."""
    tl = index_map[:-1, :-1]
    tr = index_map[:-1, 1:]
    bl = index_map[1:, :-1]
    br = index_map[1:, 1:]
    ok = (tl >= 0) & (tr >= 0) & (bl >= 0) & (br >= 0)
    f1 = np.stack([tl[ok], bl[ok], tr[ok]], axis=1)
    f2 = np.stack([br[ok], tr[ok], bl[ok]], axis=1)
    return np.concatenate([f1, f2], axis=0)


def tear_sets(disp: np.ndarray, depth_threshold: float):
    """Torn 4-neighbor edges (reference tear_edges, inpaint/mesh.py:71-108).

    Base criterion (:76): an edge is removed when |disp(a) - disp(b)| >
    threshold.  Dangling pass (:91-108): an intact edge squeezed between two
    parallel torn edges is removed too — a horizontal edge at (row, col)
    whose same-column horizontal edges in the rows directly above and below
    are both torn (and symmetrically for vertical edges across columns).
    The reference computes the pass once from the base tear maps and limits
    it to rows/cols at least 1 away from the border; np.roll wraparound is
    excluded by the same bound.

    Returns (dh, dv): dh[(y, x)] tears the edge (y,x)-(y,x+1), dv[(y, x)]
    tears (y,x)-(y+1,x).
    """
    H, W = disp.shape
    dh = np.abs(disp[:, 1:] - disp[:, :-1]) > depth_threshold   # (H, W-1)
    dv = np.abs(disp[1:, :] - disp[:-1, :]) > depth_threshold   # (H-1, W)

    # dangling pass on (H, W) canvases marked at the min-coordinate pixel
    # (mesh.py:84-87), one shot from the base maps (mesh.py:91-92)
    ch = np.zeros((H, W), bool)
    ch[:, : W - 1] = dh
    cv = np.zeros((H, W), bool)
    cv[: H - 1, :] = dv
    dang_h = np.roll(ch, 1, 0) & np.roll(ch, -1, 0) & ~ch
    dang_h[0, :] = False
    dang_h[-1, :] = False       # horizon_condition: 1 <= row < H-1
    dang_v = np.roll(cv, 1, 1) & np.roll(cv, -1, 1) & ~cv
    dang_v[:, 0] = False
    dang_v[:, -1] = False       # vertical_condition: 1 <= col < W-1
    dh = dh | dang_h[:, : W - 1]
    dv = dv | dang_v[: H - 1, :]
    return dh, dv


def grid_components(dh: np.ndarray, dv: np.ndarray):
    """Connected components of the (H, W) pixel grid under untorn 4-edges
    (the reference's netx.connected_components over the pixel graph,
    inpaint/mesh.py:169).  Returns ((H, W) int labels, n_components)."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import connected_components

    H = dv.shape[0] + 1
    W = dh.shape[1] + 1
    idx = np.arange(H * W).reshape(H, W)
    a = idx[:, :-1][~dh]
    b = idx[:, 1:][~dh]
    c = idx[:-1, :][~dv]
    d = idx[1:, :][~dv]
    rows = np.concatenate([a, c])
    cols = np.concatenate([b, d])
    g = sp.coo_matrix((np.ones(len(rows), bool), (rows, cols)),
                      shape=(H * W, H * W))
    n, labels = connected_components(g, directed=False)
    return labels.reshape(H, W), n


def reassign_floating_islands(depth: np.ndarray, depth_threshold: float,
                              min_node_in_cc: int = 200):
    """Reference floating-island handling, dense formulation.

    generate_init_node (inpaint/mesh.py:164-194, min_node_in_cc=200 at
    :1848) drops pixel components smaller than min_node_in_cc from the mesh;
    reassign_floating_island (:244-326) then, per lost island, picks the
    surrounding edge group with the most adjacent nodes (:292) and
    re-propagates depth into the island by iterated 4-neighbor means
    (:297-326), gluing it onto that surface.  Here the two stages fuse into
    one depth rewrite: small components get their depth replaced by
    propagation from the dominant neighboring component.  Deviation: the
    reference's in-place scan uses partially-updated values within one
    sweep (order-dependent); this uses synchronous frontier updates.

    Returns (new_depth, changed).
    """
    H, W = depth.shape
    disp = 1.0 / np.maximum(depth, 1e-8)
    dh, dv = tear_sets(disp, depth_threshold)
    labels, n = grid_components(dh, dv)
    sizes = np.bincount(labels.ravel(), minlength=n)
    lost = sizes[labels] < min_node_in_cc
    if not lost.any():
        return depth, False

    out = depth.copy()
    known = ~lost
    for li in np.unique(labels[lost]):
        m = labels == li
        nb = np.zeros((H, W), bool)       # known 4-neighbors of the island
        nb[:-1, :] |= m[1:, :]
        nb[1:, :] |= m[:-1, :]
        nb[:, :-1] |= m[:, 1:]
        nb[:, 1:] |= m[:, :-1]
        nb &= known
        if not nb.any():
            continue
        # dominant surrounding group = the one with most adjacent pixels
        dom = np.bincount(labels[nb]).argmax()
        seeds = nb & (labels == dom)

        edm = np.where(seeds, out, 0.0)
        has = seeds.copy()
        remaining = m.copy()
        while remaining.any():
            ssum = np.zeros((H, W), np.float64)
            scnt = np.zeros((H, W), np.int32)
            for src, dst in (((slice(1, None), slice(None)),
                              (slice(None, -1), slice(None))),
                             ((slice(None, -1), slice(None)),
                              (slice(1, None), slice(None))),
                             ((slice(None), slice(1, None)),
                              (slice(None), slice(None, -1))),
                             ((slice(None), slice(None, -1)),
                              (slice(None), slice(1, None)))):
                ssum[dst] += np.where(has[src], edm[src], 0.0)
                scnt[dst] += has[src]
            newly = remaining & (scnt > 0)
            if not newly.any():
                break                      # island part with no seed path
            val = ssum / np.maximum(scnt, 1)
            edm[newly] = val[newly]
            has[newly] = True
            out[newly] = val[newly]
            remaining &= ~newly
    return out, True


def _propagate_mean(vals: np.ndarray, known: np.ndarray, region: np.ndarray):
    """Fill `region` by iterated synchronous 4-neighbor means seeded from
    `known` (the reference's depth-propagation loop shape, mesh.py:297-326).
    Returns (vals, filled): filled marks seeds + reached region pixels."""
    vals = vals.astype(np.float64).copy()
    known = known.copy()
    remaining = region & ~known
    while remaining.any():
        ssum = np.zeros(vals.shape, np.float64)
        scnt = np.zeros(vals.shape, np.int32)
        for src, dst in (((slice(1, None), slice(None)),
                          (slice(None, -1), slice(None))),
                         ((slice(None, -1), slice(None)),
                          (slice(1, None), slice(None))),
                         ((slice(None), slice(1, None)),
                          (slice(None), slice(None, -1))),
                         ((slice(None), slice(None, -1)),
                          (slice(None), slice(1, None)))):
            ssum[dst] += np.where(known[src], vals[src], 0.0)
            scnt[dst] += known[src]
        newly = remaining & (scnt > 0)
        if not newly.any():
            break
        vals = np.where(newly, ssum / np.maximum(scnt, 1), vals)
        known |= newly
        remaining &= ~newly
    return vals, known


def edge_pixel_groups(dh: np.ndarray, dv: np.ndarray, min_size: int = 12):
    """Occlusion-edge groups: torn-edge pixels labeled by connectivity
    within the edge-pixel subgraph under untorn 4-edges (reference
    group_edges, inpaint/mesh.py:385 — edge nodes connect along the tear
    curve, never across it).  Groups smaller than `min_size` are dropped
    (reference remove_redundant_edge :636 culls degenerate edge groups;
    redundant_number=12 per src/core.py:417).

    Returns ((H, W) int labels with -1 = not an edge pixel, n_groups).
    """
    import scipy.sparse as sp
    from scipy.sparse.csgraph import connected_components

    H = dv.shape[0] + 1
    W = dh.shape[1] + 1
    edge_px = np.zeros((H, W), bool)
    edge_px[:, 1:] |= dh
    edge_px[:, :-1] |= dh
    edge_px[1:, :] |= dv
    edge_px[:-1, :] |= dv
    n = int(edge_px.sum())
    if n == 0:
        return np.full((H, W), -1, np.int64), 0

    pid = np.full((H, W), -1, np.int64)
    pid[edge_px] = np.arange(n)
    ph = (~dh) & edge_px[:, :-1] & edge_px[:, 1:]
    pv = (~dv) & edge_px[:-1, :] & edge_px[1:, :]
    rows = np.concatenate([pid[:, :-1][ph], pid[:-1, :][pv]])
    cols = np.concatenate([pid[:, 1:][ph], pid[1:, :][pv]])
    g = sp.coo_matrix((np.ones(len(rows), bool), (rows, cols)), shape=(n, n))
    ng, lab = connected_components(g, directed=False)
    sizes = np.bincount(lab, minlength=ng)
    keep = sizes >= min_size
    remap = np.full(ng, -1, np.int64)
    remap[keep] = np.arange(int(keep.sum()))
    out = np.full((H, W), -1, np.int64)
    out[edge_px] = remap[lab]
    return out, int(keep.sum())


def _far_side_mask(disp: np.ndarray, dh: np.ndarray, dv: np.ndarray):
    """Pixels that are the FAR side of some torn edge (their torn neighbor
    is nearer, i.e. has larger disparity) — the reference's nodes that carry
    a 'near' list (tear_edges, mesh.py:79-82)."""
    H, W = disp.shape
    far = np.zeros((H, W), bool)
    far[:, :-1] |= dh & (disp[:, :-1] < disp[:, 1:])
    far[:, 1:] |= dh & (disp[:, 1:] < disp[:, :-1])
    far[:-1, :] |= dv & (disp[:-1, :] < disp[1:, :])
    far[1:, :] |= dv & (disp[1:, :] < disp[:-1, :])
    return far


def build_ldi(img: np.ndarray, depth: np.ndarray, int_mtx: np.ndarray,
              config: Dict, nets: Optional[Dict] = None):
    """(verts, colors, faces, mean_loc_depth).

    Foreground layer: one vertex per pixel, triangulated except across
    disparity discontinuities (> depth_threshold).  Background layer: an
    inpainted band behind each discontinuity (colors/depth from the
    inpainting nets when provided, diffusion fill otherwise), triangulated
    within the band, stitched to the far side of each discontinuity.
    """
    H, W = depth.shape
    depth_threshold = config.get("depth_threshold", 0.04)
    thickness = config.get("background_thickness", 70)
    hfov, vfov = fov_from_int_mtx(int_mtx, H, W)

    # floating islands first (reference write_mesh order, mesh.py:1848-1852):
    # small torn-off components are glued back onto the dominant surrounding
    # surface before edges are grouped/inpainted
    depth, _ = reassign_floating_islands(
        depth, depth_threshold,
        min_node_in_cc=config.get("min_node_in_cc", 200))

    disp = 1.0 / np.maximum(depth, 1e-8)
    dh, dv = tear_sets(disp, depth_threshold)

    # --- foreground layer -------------------------------------------------
    rows, cols = np.mgrid[0:H, 0:W]
    fg_index = np.arange(H * W).reshape(H, W)
    fg_verts = pixels_to_verts(rows, cols, depth, H, W, hfov, vfov)
    fg_colors = img.reshape(-1, 3)

    # faces that do not cross a discontinuity: mask out cells touching one
    cell_cut = np.zeros((H - 1, W - 1), bool)
    cell_cut |= dh[:-1, :] | dh[1:, :]
    cell_cut |= dv[:, :-1] | dv[:, 1:]
    # temporarily mark cut cells by dropping one corner: easier — build faces
    # from the full grid, then filter by cell mask
    tl = fg_index[:-1, :-1]
    tr = fg_index[:-1, 1:]
    bl = fg_index[1:, :-1]
    br = fg_index[1:, 1:]
    keep = ~cell_cut
    f1 = np.stack([tl[keep], bl[keep], tr[keep]], axis=1)
    f2 = np.stack([br[keep], tr[keep], bl[keep]], axis=1)
    fg_faces = np.concatenate([f1, f2], axis=0)

    verts = fg_verts.reshape(-1, 3)
    colors = fg_colors
    faces = fg_faces

    # --- background layers: one per occlusion edge group --------------------
    # Reference structure (DL_inpaint_edge per edge_cc, inpaint/mesh.py:1395;
    # context_and_holes :910): each occlusion edge group hallucinates its OWN
    # background continuation.  Where bands of different groups overlap the
    # mesh carries multiple background samples at the same pixel — this is
    # what makes the LDI multi-layer (the former single global band could
    # store only one background value per pixel).
    glabels, ngroups = edge_pixel_groups(
        dh, dv, min_size=config.get("redundant_number", 12))
    far_side = _far_side_mask(disp, dh, dv)
    labels_cc, _ = grid_components(dh, dv)
    it = max(thickness // 7, 2)
    k3 = np.ones((3, 3), np.uint8)
    margin = it + 2

    for g in range(ngroups):
        gmask_full = glabels == g
        seeds_full = gmask_full & far_side
        if not seeds_full.any():
            continue                    # near-side-only group: its tear is
                                        # handled by the far-side twin group
        ys, xs = np.nonzero(gmask_full)
        r0, r1 = max(int(ys.min()) - margin, 0), min(int(ys.max()) + margin + 1, H)
        c0, c1 = max(int(xs.min()) - margin, 0), min(int(xs.max()) + margin + 1, W)
        sl = (slice(r0, r1), slice(c0, c1))

        seeds = seeds_full[sl]
        band = cv2.dilate(seeds.astype(np.uint8), k3,
                          iterations=it).astype(bool)
        # context = band pixels on the group's own (background) surface —
        # there the layer coincides with the foreground mesh and stitches to
        # it; synthesis = band pixels occluded by a nearer surface
        seed_comps = np.unique(labels_cc[sl][seeds])
        context = band & np.isin(labels_cc[sl], seed_comps)
        synth = band & ~context
        if not synth.any():
            continue

        bg_depth, bg_color = _inpaint_group(
            img[sl], depth[sl], disp[sl], gmask_full[sl], context, synth,
            nets)

        band_index = np.full((r1 - r0, c1 - c0), -1, np.int64)
        brows, bcols = np.nonzero(band)
        band_index[band] = np.arange(len(brows)) + verts.shape[0]
        bg_verts = pixels_to_verts(brows + r0, bcols + c0, bg_depth[band],
                                   H, W, hfov, vfov)
        bg_faces = _grid_faces(band_index)
        verts = np.concatenate([verts, bg_verts], axis=0)
        colors = np.concatenate([colors, bg_color[band]], axis=0)
        if len(bg_faces):
            faces = np.concatenate([faces, bg_faces], axis=0)

    mean_loc_depth = float(depth[H // 2, W // 2])
    return verts, colors, faces, mean_loc_depth


def _inpaint_group(img_c, depth_c, disp_c, edge_c, context, synth, nets):
    """Background depth/color for one edge group's band (crop arrays).

    With nets: edge -> depth -> color inpainting on the crop (reference
    DL_inpaint_edge runs the 3 nets per edge group, inpaint/mesh.py:1395).
    Without: depth = 4-neighbor mean propagation of the context (far-side)
    surface into the occluded region, color = cv2 telea inpaint.
    """
    depth_c = depth_c.astype(np.float32)
    if nets is not None:
        try:
            rgb01 = img_c.astype(np.float32) / 255.0
            ctxf = context.astype(np.float32)
            maskf = synth.astype(np.float32)
            edge_out = nets["edge"](rgb01, disp_c.astype(np.float32),
                                    edge_c.astype(np.float32), ctxf, maskf)
            depth_out = nets["depth"](depth_c, edge_out, ctxf, maskf)
            color_out = nets["color"](rgb01, edge_out, ctxf, maskf)
            bg_depth = np.where(synth, np.maximum(depth_out, depth_c),
                                depth_c)
            bg_color = np.where(synth[..., None], color_out * 255.0,
                                img_c.astype(np.float32))
            return bg_depth.astype(np.float32), bg_color.astype(np.uint8)
        except Exception:
            pass

    vals, filled = _propagate_mean(np.where(context, depth_c, 0.0),
                                   context.copy(), synth)
    bg_depth = np.where(synth & filled,
                        np.maximum(vals, depth_c), depth_c)
    bg_color = cv2.inpaint(np.ascontiguousarray(img_c.astype(np.uint8)),
                           synth.astype(np.uint8), 5, cv2.INPAINT_TELEA)
    bg_color = np.where(synth[..., None], bg_color,
                        img_c).astype(np.uint8)
    return bg_depth.astype(np.float32), bg_color


# ---------------------------------------------------------------------------
# mesh file I/O (reference-compatible formats)
# ---------------------------------------------------------------------------

def write_mesh_file(path: str, verts, colors, faces, H, W, hfov, vfov,
                    mean_loc_depth, fmt: str = "obj",
                    ply_fmt: str = "bin") -> str:
    colors = np.asarray(colors)
    if colors.max() > 1.0 + 1e-6:
        colors01 = colors / 255.0
    else:
        colors01 = colors
    if fmt == "obj":
        with open(path, "w", encoding="utf8") as f:
            f.write(MESH_MAGIC + "\n")
            f.write(f"# H {int(H)}\n# W {int(W)}\n")
            f.write(f"# hFov {float(hfov)}\n# vFov {float(vfov)}\n")
            f.write(f"# meanLoc {float(mean_loc_depth)}\n")
            f.write(f"# vertices {len(verts)}\n# faces {len(faces)}\n")
            f.write("o depthmap\n")
            for (x, y, z), (r, g, b) in zip(verts, colors01):
                f.write(f"v {x:.8f} {y:.8f} {z:.8f} "
                        f"{r:.4f} {g:.4f} {b:.4f}\n")
            for a, b_, c in np.asarray(faces) + 1:
                f.write(f"f {a} {b_} {c}\n")
        return path
    if fmt == "ply":
        c255 = np.clip(colors01 * 255.0, 0, 255).astype(np.uint8)
        header = [
            "ply",
            "format binary_little_endian 1.0" if ply_fmt == "bin"
            else "format ascii 1.0",
            f"comment H {int(H)}", f"comment W {int(W)}",
            f"comment hFov {float(hfov)}", f"comment vFov {float(vfov)}",
            f"comment meanLoc {float(mean_loc_depth)}",
            f"element vertex {len(verts)}",
            "property float x", "property float y", "property float z",
            "property uchar red", "property uchar green",
            "property uchar blue", "property uchar alpha",
            f"element face {len(faces)}",
            "property list uchar int vertex_index", "end_header"]
        if ply_fmt == "bin":
            with open(path, "wb") as f:
                f.write(("\n".join(header) + "\n").encode("ascii"))
                for (x, y, z), (r, g, b) in zip(verts, c255):
                    f.write(struct.pack("<fffBBBB", x, y, z, r, g, b, 255))
                for a, b_, c in np.asarray(faces):
                    f.write(struct.pack("<Biii", 3, a, b_, c))
        else:
            with open(path, "w") as f:
                f.write("\n".join(header) + "\n")
                for (x, y, z), (r, g, b) in zip(verts, c255):
                    f.write(f"{x:.8f} {y:.8f} {z:.8f} {r} {g} {b} 255\n")
                for a, b_, c in np.asarray(faces):
                    f.write(f"3 {a} {b_} {c}\n")
        return path
    raise ValueError(fmt)


def read_mesh(mesh_fi: str):
    """(verts, colors, faces, H, W, hFov, vFov, mean_loc_depth) — parity with
    reference read_mesh (mesh.py:2196-2368)."""
    ext = os.path.splitext(mesh_fi)[1]
    if ext == ".obj":
        return _read_obj(mesh_fi)
    if ext == ".ply":
        return _read_ply(mesh_fi)
    raise Exception("Unknown file format")


def _read_obj(mesh_fi):
    H = W = None
    hfov = vfov = mean_loc_depth = None
    verts, colors, faces = [], [], []
    with open(mesh_fi, encoding="utf8") as f:
        first = f.readline()
        if not first.startswith("# depthmap-script"):
            raise Exception("This requires a 3D inpainted mesh generated by "
                            "this extension.")
        for line in f:
            if line.startswith("#"):
                parts = line.split()
                if len(parts) >= 3:
                    key, val = parts[1], parts[-1]
                    if key == "H":
                        H = int(val)
                    elif key == "W":
                        W = int(val)
                    elif key == "hFov":
                        hfov = float(val)
                    elif key == "vFov":
                        vfov = float(val)
                    elif key == "meanLoc":
                        mean_loc_depth = float(val)
            elif line.startswith("v "):
                vals = [float(v) for v in line.split()[1:]]
                verts.append(vals[:3])
                colors.append(vals[3:6])
            elif line.startswith("f "):
                faces.append([int(v) - 1 for v in line.split()[1:4]])
    return (np.array(verts, np.float32), np.array(colors, np.float32),
            np.array(faces, np.int64), H, W, hfov, vfov, mean_loc_depth)


def _read_ply(mesh_fi):
    with open(mesh_fi, "rb") as f:
        data = f.read()
    head_end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:head_end].decode("ascii").splitlines()
    meta = {}
    n_vert = n_face = 0
    binary = any("binary_little_endian" in h for h in header)
    for h in header:
        p = h.split()
        if h.startswith("comment") and len(p) >= 3:
            meta[p[1]] = p[2]
        elif h.startswith("element vertex"):
            n_vert = int(p[2])
        elif h.startswith("element face"):
            n_face = int(p[2])
    verts = np.zeros((n_vert, 3), np.float32)
    colors = np.zeros((n_vert, 3), np.float32)
    faces = np.zeros((n_face, 3), np.int64)
    if binary:
        off = head_end
        vrec = struct.Struct("<fffBBBB")
        for i in range(n_vert):
            x, y, z, r, g, b, _a = vrec.unpack_from(data, off)
            off += vrec.size
            verts[i] = (x, y, z)
            colors[i] = (r / 255.0, g / 255.0, b / 255.0)
        frec = struct.Struct("<Biii")
        for i in range(n_face):
            _n, a, b, c = frec.unpack_from(data, off)
            off += frec.size
            faces[i] = (a, b, c)
    else:
        lines = data[head_end:].decode("ascii").splitlines()
        for i in range(n_vert):
            vals = lines[i].split()
            verts[i] = [float(v) for v in vals[:3]]
            colors[i] = [float(v) / 255.0 for v in vals[3:6]]
        for i in range(n_face):
            vals = lines[n_vert + i].split()
            faces[i] = [int(v) for v in vals[1:4]]
    return (verts, colors, faces, int(meta.get("H", 0)),
            int(meta.get("W", 0)), float(meta.get("hFov", 0.5)),
            float(meta.get("vFov", 0.5)), float(meta.get("meanLoc", 1.0)))


def build_inpaint_callables(weights_dir: str = "./models/3dphoto",
                            seed: int = 0) -> Optional[Dict]:
    """Wrap the three inpainting nets (converted checkpoints when present)
    into the (rgb, disp, edge, context, mask)-style callables used by
    build_ldi; returns None when checkpoints are unavailable (the builder
    then falls back to diffusion inpainting)."""
    import jax
    import jax.numpy as jnp

    from depthmap_tpu.models.convert_inpaint import load_inpaint_nets
    from depthmap_tpu.models.inpaint_nets import (InpaintColorNet,
                                                  InpaintDepthNet,
                                                  InpaintEdgeNet)
    try:
        variables = load_inpaint_nets(weights_dir)
    except Exception:
        return None
    if any(v is None for v in variables.values()):
        return None

    edge_net = InpaintEdgeNet()
    depth_net = InpaintDepthNet()
    color_net = InpaintColorNet()
    e_apply = jax.jit(edge_net.apply)
    d_apply = jax.jit(depth_net.apply)
    c_apply = jax.jit(color_net.apply)

    def _prep(*planes):
        x = jnp.stack([jnp.asarray(p, jnp.float32) for p in planes], axis=-1)
        return x[None]

    def _bucket(d: int) -> int:
        """Next power-of-two multiple of the forward_3P unit (128): crops
        compile O(log) net shapes per stream instead of one XLA program per
        distinct edge-group size (tens of seconds each on TPU).  The extra
        zero/zero-mask border is semantically inert for the partial-conv
        nets beyond the border effects the reference's own 128-padding has
        (inpaint/networks.py:178 forward_3P)."""
        units = -(-d // 128)
        p = 1
        while p < units:
            p *= 2
        return p * 128

    def _pad_bucket(x):
        n, h, w, c = x.shape
        rh, rw = _bucket(h) - h, _bucket(w) - w
        top, left = rh // 2, rw // 2
        out = jnp.pad(x, ((0, 0), (top, rh - top), (left, rw - left),
                          (0, 0)))
        return out, (top, top + h, left, left + w)

    def edge_fn(rgb01, disp, edge_in, context, mask):
        x = jnp.concatenate([
            jnp.asarray(rgb01, jnp.float32)[None],
            _prep(disp / max(float(np.max(disp)), 1e-8)),
            _prep(edge_in), _prep(context), _prep(mask)], axis=-1)
        xp, (t, b, l, r) = _pad_bucket(x)
        out = e_apply(variables["edge"], xp)
        return np.asarray(out[0, t:b, l:r, 0])

    def depth_fn(depth, edge, context, mask):
        args = [_prep(depth), _prep(edge), _prep(context), _prep(mask)]
        padded = [_pad_bucket(a)[0] for a in args]
        t, b, l, r = _pad_bucket(args[0])[1]
        out = d_apply(variables["depth"], *padded)
        return np.asarray(out[0, t:b, l:r, 0])

    def color_fn(rgb01, edge, context, mask):
        rgb = jnp.asarray(rgb01, jnp.float32)[None]
        args = [rgb, _prep(edge), _prep(context), _prep(mask)]
        padded = [_pad_bucket(a)[0] for a in args]
        t, b, l, r = _pad_bucket(args[1])[1]
        out = c_apply(variables["color"], *padded)
        return np.asarray(out[0, t:b, l:r, :])

    return {"edge": edge_fn, "depth": depth_fn, "color": color_fn}


def write_mesh(img: np.ndarray, depth: np.ndarray, int_mtx: np.ndarray,
               mesh_fi: str, config: Dict, nets: Optional[Dict] = None):
    """Reference write_mesh surface (mesh.py:1828): builds the LDI and saves
    .obj (config['save_obj']) and/or .ply (config['save_ply'])."""
    verts, colors, faces, mean_loc_depth = build_ldi(img, depth, int_mtx,
                                                     config, nets)
    H, W = depth.shape
    hfov, vfov = fov_from_int_mtx(int_mtx, H, W)
    if config.get("save_obj", True):
        write_mesh_file(mesh_fi, verts, colors, faces, H, W, hfov, vfov,
                        mean_loc_depth, fmt="obj")
    if config.get("save_ply", False):
        write_mesh_file(os.path.splitext(mesh_fi)[0] + ".ply", verts, colors,
                        faces, H, W, hfov, vfov, mean_loc_depth, fmt="ply",
                        ply_fmt=config.get("ply_fmt", "bin"))
    return mesh_fi
