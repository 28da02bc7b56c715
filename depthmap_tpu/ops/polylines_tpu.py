"""TPU-native polylines stereo rasterization.

Re-derivation of the reference's inherently-sequential per-row algorithm
(src/stereoimage_generation.py:162-283) into a sort/scan formulation that
XLA can vectorize over all rows at once:

 1. every pixel emits 1 (soft) or 2 (sharp) morphed polyline points; the
    polyline's segments are the consecutive point pairs *in original
    order*;
 2. points (and segments, keyed by their left endpoint) are stable-sorted
    by x — replacing the reference's insertion sort;
 3. the reference's per-pixel region subdivision becomes a static set of
    "parts": intervals between consecutive breakpoints, where breakpoints =
    sorted union of point xs and integer pixel boundaries (exactly the
    region boundaries the sequential loop visits);
 4. each part's winning segment (max interpolated closeness among segments
    covering the part center) is found by scanning the K segments whose
    left endpoint precedes the center — K bounds the number of
    simultaneously-active segments, same bound as the reference's `csg`
    buffer (5*divergence+25);
 5. part color contributions (significance x interpolated color) are
    scatter-added per pixel.

Numerics note: the reference accumulates in float64; this kernel uses
float32 on device, so isolated pixels can differ by 1/255 at truncation
boundaries (quantified in tests/test_polylines_tpu.py: > 99.9 % of pixels
bit-exact vs the numpy oracle, max difference 1).

Status: EXPERIMENTAL, opt-in via DEPTHMAP_POLYLINES_TPU=1.  Measured on a
v5e chip the winner-search step is bound by data-dependent gathers
(take_along_axis of ~3M indices costs ~30 ms on TPU; the K-candidate scan
needs O(K) of them), making the exact algorithm slower than the
multithreaded C++ host kernel (native/polylines.cpp) at 1080p.  The host
kernel therefore remains the production default — the same placement the
reference chose for its numba kernels (README.md:60) — while the batched
TPU fast path for stereo video is the 'naive' fill.  A future Pallas
formulation would need to keep the per-part candidate window in VMEM to
beat the host kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-7


def polylines_rasterize(image, normalized_depth, divergence_px: float,
                        separation_px: float, exponent: float, sharp: bool,
                        row_chunk: int = 512):
    """image: (H, W, C) uint8; normalized_depth: (H, W) in [0, 1] ->
    (H, W, C) uint8 derived view.

    Rows are independent; they are processed in chunks of `row_chunk` —
    this bounds device temporaries and sidesteps a backend fault observed
    with very large single-program instances (1080p in one dispatch)."""
    img = jnp.asarray(image)
    nd = jnp.asarray(normalized_depth, jnp.float32)
    h = img.shape[0]
    if h <= row_chunk:
        return _polylines_rasterize(img, nd, divergence_px, separation_px,
                                    exponent, sharp)
    outs = []
    for i in range(0, h, row_chunk):
        outs.append(_polylines_rasterize(
            img[i:i + row_chunk], nd[i:i + row_chunk], divergence_px,
            separation_px, exponent, sharp))
    return jnp.concatenate(outs, axis=0)


@functools.partial(jax.jit, static_argnames=(
    "divergence_px", "separation_px", "exponent", "sharp"))
def _polylines_rasterize(image, normalized_depth, divergence_px: float,
                         separation_px: float, exponent: float, sharp: bool):
    img = jnp.asarray(image)
    nd = jnp.asarray(normalized_depth, jnp.float32)
    h, w, c = img.shape
    phw = 0.45 if sharp else 0.0

    colsf = jnp.arange(w, dtype=jnp.float32)
    coord_d = nd ** exponent * divergence_px                       # (H, W)
    cx = colsf[None, :] + 0.5 + coord_d + separation_px
    absd = jnp.abs(coord_d)

    # -- points (H, P): sentinel, per-pixel point(s), sentinel -------------
    if sharp:
        pts_x = jnp.stack([cx - phw, cx + phw], axis=-1).reshape(h, 2 * w)
        pts_d = jnp.repeat(absd, 2, axis=1)
        pts_c = jnp.repeat(colsf[None, :], 2, axis=1) * jnp.ones((h, 1))
    else:
        pts_x, pts_d = cx, absd
        pts_c = jnp.broadcast_to(colsf[None, :], (h, w))
    sent_l = jnp.full((h, 1), -1.0 * w, jnp.float32)
    sent_r = jnp.full((h, 1), 2.0 * w, jnp.float32)
    zeros = jnp.zeros((h, 1), jnp.float32)
    ptx = jnp.concatenate([sent_l, pts_x, sent_r], axis=1)         # (H, P)
    ptd = jnp.concatenate([zeros, pts_d, zeros], axis=1)
    ptc = jnp.concatenate([zeros, pts_c,
                           jnp.full((h, 1), float(w - 1))], axis=1)
    P = ptx.shape[1]

    # -- segments: consecutive original points, then sorted by x0 ----------
    # the stable sort of ptx[:, :-1] has the same relative order as the
    # reference's insertion sort of (pt, sg) pairs (strict-> swaps only)
    sorder = jnp.argsort(ptx[:, :-1], axis=1, stable=True)         # (H, P-1)

    def takerow(a, idx):
        return jnp.take_along_axis(a, idx, axis=1)

    sg_x0 = takerow(ptx[:, :-1], sorder)
    sg_d0 = takerow(ptd[:, :-1], sorder)
    sg_c0 = takerow(ptc[:, :-1], sorder)
    sg_x3 = takerow(ptx[:, 1:], sorder)
    sg_d3 = takerow(ptd[:, 1:], sorder)
    sg_c3 = takerow(ptc[:, 1:], sorder)

    # -- parts: breakpoints = sorted(point xs U pixel boundaries) ----------
    bounds = jnp.broadcast_to(
        jnp.arange(w + 1, dtype=jnp.float32)[None, :], (h, w + 1))
    bpx = jnp.sort(jnp.concatenate([ptx, bounds], axis=1), axis=1)
    part_from = bpx[:, :-1] + EPS                                  # (H, B)
    part_to = bpx[:, 1:] - EPS
    sig = part_to - part_from
    center = part_from + 0.5 * sig
    pix = jnp.floor(center).astype(jnp.int32)
    valid = (center >= 0.0) & (center < w)
    pix = jnp.clip(pix, 0, w - 1)

    # -- winning segment per part (K-candidate scan) ------------------------
    K = int(min(P - 1, 5 * abs(divergence_px) + 25))
    m = jax.vmap(lambda a, v: jnp.searchsorted(a, v, side="left"))(
        sg_x0, center)                                             # (H, B)

    neg_inf = jnp.float32(-jnp.inf)
    init = (jnp.full(center.shape, -EPS, jnp.float32),   # best qualified
            jnp.zeros(center.shape, jnp.float32),        # best c0
            jnp.zeros(center.shape, jnp.float32),        # best c3
            jnp.zeros(center.shape, jnp.float32),        # best ip
            jnp.full(center.shape, neg_inf),             # fallback score
            jnp.zeros(center.shape, jnp.float32),        # fb c0
            jnp.zeros(center.shape, jnp.float32),        # fb c3
            jnp.zeros(center.shape, jnp.float32))        # fb ip

    def body(k, carry):
        (bs, bc0, bc3, bip, fs, fc0, fc3, fip) = carry
        idx = m - 1 - k
        ok = idx >= 0
        ii = jnp.clip(idx, 0, P - 2)
        x0 = takerow(sg_x0, ii)
        x3 = takerow(sg_x3, ii)
        d0 = takerow(sg_d0, ii)
        d3 = takerow(sg_d3, ii)
        c0 = takerow(sg_c0, ii)
        c3 = takerow(sg_c3, ii)
        active = ok & (x3 >= center)         # x0 < center by construction
        span = x3 - x0
        ip = jnp.where(span > 0, (center - x0) / jnp.where(span > 0, span,
                                                           1.0), 2.0)
        clo = (1.0 - ip) * d0 + ip * d3
        qual = active & (ip > 0.0) & (ip < 1.0)
        qs = jnp.where(qual, clo, neg_inf)
        take_q = qs > bs
        bs = jnp.where(take_q, qs, bs)
        bc0 = jnp.where(take_q, c0, bc0)
        bc3 = jnp.where(take_q, c3, bc3)
        bip = jnp.where(take_q, ip, bip)
        as_ = jnp.where(active, clo, neg_inf)
        take_f = as_ > fs
        fs = jnp.where(take_f, as_, fs)
        fc0 = jnp.where(take_f, c0, fc0)
        fc3 = jnp.where(take_f, c3, fc3)
        fip = jnp.where(take_f, jnp.clip(ip, 0.0, 1.0), fip)
        return (bs, bc0, bc3, bip, fs, fc0, fc3, fip)

    bs, bc0, bc3, bip, fs, fc0, fc3, fip = jax.lax.fori_loop(
        0, K, body, init)
    none_q = bs <= -EPS / 2          # no qualified candidate -> fallback
    wc0 = jnp.where(none_q, fc0, bc0)
    wc3 = jnp.where(none_q, fc3, bc3)
    wip = jnp.where(none_q, fip, bip)

    # -- color contribution + per-pixel accumulation ------------------------
    col_l = jnp.clip((wc0 + EPS).astype(jnp.int32), 0, w - 1)
    col_r = jnp.clip((wc3 + EPS).astype(jnp.int32), 0, w - 1)
    imgf = img.astype(jnp.float32)                                  # (H,W,C)
    color_l = takerow(imgf.reshape(h, w * c),
                      (col_l[..., None] * c
                       + jnp.arange(c)[None, None, :]).reshape(h, -1)
                      ).reshape(h, -1, c)
    color_r = takerow(imgf.reshape(h, w * c),
                      (col_r[..., None] * c
                       + jnp.arange(c)[None, None, :]).reshape(h, -1)
                      ).reshape(h, -1, c)
    same = (col_l == col_r)[..., None]
    color = jnp.where(same, color_l,
                      color_l * (1.0 - wip[..., None])
                      + color_r * wip[..., None])
    contrib = color * jnp.where(valid, sig, 0.0)[..., None]        # (H,B,C)

    out = jax.vmap(
        lambda co, px: jax.ops.segment_sum(co, px, num_segments=w))(
            contrib, pix)                                          # (H,W,C)
    out = out + 0.5
    return jnp.clip(out, 0.0, 255.0).astype(jnp.uint8)
