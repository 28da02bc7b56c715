"""Pallas TPU polylines stereo rasterizer — the device-resident default fill.

Re-derivation of the reference's sequential per-row polyline rasterization
(src/stereoimage_generation.py:162-283) into a sort-free, gather-free data
parallel program that maps onto the TPU VPU/MXU:

The reference morphs each image row into a polyline, *sorts* the morphed
points, and sweeps left-to-right maintaining an active-segment set, emitting
one piecewise-constant "part" per interval between consecutive breakpoints
(morphed point xs union pixel boundaries).  Both the sort and the sweep are
sequential; a direct XLA port (ops/polylines_tpu.py) is bound by
data-dependent gathers.  This kernel removes both:

 * no sort: a morphed point's x deviates from an affine function of its
   array index by at most the divergence, so every candidate set the sweep
   would consult lives in a *statically-bounded contiguous index window*
   around an affine-in-index offset.  Windows are contiguous dynamic slices
   of VMEM-resident per-row arrays — no gathers;
 * no sweep: each breakpoint generator (morphed point or integer pixel
   boundary) emits exactly one part [x, min(next breakpoint, next pixel
   boundary)] where "next breakpoint" is a masked min over its index window
   (ties resolved by original index, reproducing stable-sort semantics);
 * the active-set winner for a part center xc is the masked argmax of
   interpolated closeness over the segments in xc's index window.  The
   reference's qualification rule 0 < ip < 1 is equivalent to the strict
   stabbing predicate x0 < xc < x1, so no division is needed to qualify
   (reciprocal spans are precomputed);  the ``best = active[0]`` fallback in
   the reference triggers only when xc coincides *exactly* with a segment
   endpoint — which implies a zero-width part (significance ~ -2*EPS), so
   dropping it changes nothing measurable;
 * winner attributes (x0, 1/span, endpoint colors) are extracted with a
   one-hot x attribute-matrix product on the MXU, and part contributions are
   scattered to pixels the same way (pixel indices stay within a
   statically-bounded local column window, LCOL wide);
 * channel interpolation `c0 + ip*(c1-c0)` is exact for same-column
   segments (c1-c0 == 0), so the reference's col_l == col_r branch needs no
   flag.

Numerics: the reference computes in float64; this kernel is float32 on
device.  Positions carry ~1e-4 px rounding at 1920 px widths, so isolated
bytes can differ by 1 at part boundaries (bounded in
tests/test_polylines_pallas.py, same budget as ops/polylines_tpu.py).

Layout: per-row segment/point arrays are lane-major (1, Spad) f32 slabs,
attributes are an (8, Spad) matrix (attribute rows on sublanes), parts are
processed 64 at a time on sublanes against windows on lanes; the output row
accumulates in a (Wpad, 8) f32 VMEM block.  The grid is one program per
image row; frames of a video batch flatten into the row axis.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-7
NEG_INF = float(-jnp.inf)
POS_INF = float(jnp.inf)


def _roundup(x: int, m: int) -> int:
    return -(-int(x) // m) * m


class _Geom:
    """Static geometry for one (w, divergence, separation, sharp) config.

    All morphed point positions obey  x_q in [q*s + elo, q*s + ehi]  where q
    is the point's array index (sentinels at 0 and P-1), which makes every
    candidate window affine-in-index with static width.
    """

    def __init__(self, w: int, divergence_px: float, separation_px: float,
                 sharp: bool, chunk: int = 128):
        self.w = w
        self.sharp = sharp
        self.C = chunk
        dmin = min(0.0, divergence_px)
        dmax = max(0.0, divergence_px)
        self.dmin, self.dmax = dmin, dmax
        D = dmax - dmin
        sep = separation_px
        if sharp:
            self.P = 2 * w + 2
            self.s = 0.5
            self.elo = sep + dmin - 0.45
            self.ehi = sep + dmax - 0.05
        else:
            self.P = w + 2
            self.s = 1.0
            self.elo = sep + dmin - 0.5
            self.ehi = sep + dmax - 0.5
        self.S = self.P - 1
        s = self.s
        E = self.ehi - self.elo                      # = D + 0.4 / D
        spanmax = D + 1.0                            # real (non-sentinel) span
        C = self.C
        # Mosaic can only lower dynamic *lane* slices at 128-aligned
        # offsets, so all left margins are rounded up to multiples of 128:
        # with C = 128 every window offset (i*C - margin, or c/s*C - margin
        # for boundaries) is then 128-aligned by construction.
        self.inv_s = int(round(1 / s))               # 2 (sharp) / 1 (soft)
        # -- next-breakpoint windows (points): q in [p - E/s, p + (E+1)/s]
        self.QL = _roundup(int(np.ceil(E / s)) + 4, 128)
        self.WPT = _roundup(C + self.QL + int(np.ceil((E + 1) / s)) + 8, 128)
        # -- scoring windows (points): j in [p-(spanmax+E)/s, p+(E+1)/s]
        self.SL = _roundup(int(np.ceil((spanmax + E) / s)) + 4, 128)
        self.WSEG = _roundup(C + self.SL + int(np.ceil((E + 1) / s)) + 8, 128)
        # -- boundary windows are absolute: index base for col c is c/s
        #    next-breakpoint: q in [(c - ehi)/s, (c + 1 - elo)/s]
        self.QBL = _roundup(int(np.ceil(max(0.0, self.ehi) / s)) + 4, 128)
        self.WPB = _roundup(int(np.ceil(C / s)) + self.QBL
                            + int(np.ceil((1 - min(0.0, self.elo)) / s)) + 8,
                            128)
        #    scoring: j in [(c - spanmax - ehi)/s, (c + 1 - elo)/s]
        self.SBL = _roundup(int(np.ceil(max(0.0, spanmax + self.ehi) / s))
                            + 4, 128)
        self.WSGB = _roundup(int(np.ceil(C / s)) + self.SBL
                             + int(np.ceil((1 - min(0.0, self.elo)) / s)) + 8,
                             128)
        # -- local output-column window for point-part scatter
        self.LCOL = _roundup(int(np.ceil(C * s + E + 1)) + 16, 128)
        self.Ppad = _roundup(self.P, max(C, 128))
        self.Spad = _roundup(self.S, 128)
        self.NB = w + 1                              # boundary generators
        self.NBpad = _roundup(self.NB, C)
        self.Wpad = max(_roundup(w, 8), self.LCOL, self.NBpad)
        # a window can never exceed the (padded) array it slices; capping at
        # the full array keeps coverage trivially complete for small images
        self.WPT = min(self.WPT, self.Ppad)
        self.WPB = min(self.WPB, self.Ppad)
        self.WSEG = min(self.WSEG, self.Spad)
        self.WSGB = min(self.WSGB, self.Spad)
        self.LCOL = min(self.LCOL, self.Wpad)
        self.BIGX = 4.0 * (w + D + abs(sep) + 2.0)


def _build_rows(image, nd, divergence_px, separation_px, exponent, g: _Geom):
    """XLA prologue: per-row morphed point/segment arrays (no gathers).

    image: (R, W, 3) uint8, nd: (R, W) f32 -> dict of padded row slabs.
    """
    R, w, _ = image.shape
    imgf = image.astype(jnp.float32)
    colsf = jnp.arange(w, dtype=jnp.float32)
    coord_d = nd ** exponent * divergence_px
    cx = colsf[None, :] + 0.5 + coord_d + separation_px
    absd = jnp.abs(coord_d)
    if g.sharp:
        ptx = jnp.stack([cx - 0.45, cx + 0.45], -1).reshape(R, 2 * w)
        ptd = jnp.repeat(absd, 2, axis=1)
        ptc = jnp.repeat(imgf, 2, axis=1)
    else:
        ptx, ptd, ptc = cx, absd, imgf
    ones = jnp.ones((R, 1), jnp.float32)
    px = jnp.concatenate([-float(w) * ones, ptx, 2.0 * float(w) * ones], 1)
    pd = jnp.concatenate([0.0 * ones, ptd, 0.0 * ones], 1)
    pc = jnp.concatenate([imgf[:, :1], ptc, imgf[:, w - 1:w]], 1)

    # colors ride as one packed f32 per point: r + g*256 + b*65536 is an
    # exact integer < 2**24, so it survives f32 and can be selected with a
    # masked max -- the MXU's bf16 default rounding never touches it (a
    # one-hot matmul selection would round x0/colors to bf16: measured 7.4
    # absolute error on a v5e).
    pcp = pc[..., 0] + pc[..., 1] * 256.0 + pc[..., 2] * 65536.0

    x0, x1 = px[:, :-1], px[:, 1:]
    d0 = pd[:, :-1]
    dd = pd[:, 1:] - d0
    c0p = pcp[:, :-1]
    c1p = pcp[:, 1:]
    span = x1 - x0
    rs = jnp.where(span != 0, 1.0 / jnp.where(span != 0, span, 1.0), 0.0)

    def pad_to(a, n, val):
        return jnp.pad(a, ((0, 0), (0, n - a.shape[1])), constant_values=val)

    def slab(a, n, val):
        # (R, 1, n): TPU block specs need the sublane dim of a block to be
        # 8-divisible or equal to the array dim -- a unit middle dim is.
        return pad_to(a, n, val)[:, None, :]

    return {
        "px": slab(px, g.Ppad, g.BIGX),
        "x0": slab(x0, g.Spad, g.BIGX),
        "x1": slab(x1, g.Spad, g.BIGX),
        "d0": slab(d0, g.Spad, 0.0),
        "dd": slab(dd, g.Spad, 0.0),
        "rs": slab(rs, g.Spad, 0.0),
        "c0p": slab(c0p, g.Spad, 0.0),
        "c1p": slab(c1p, g.Spad, 0.0),
    }


def _unpack_rgb(p):
    """(C,1) packed r + g*256 + b*65536 -> (C,3); exact for ints < 2**24."""
    b = jnp.floor(p * (1.0 / 65536.0))
    rem = p - b * 65536.0
    gch = jnp.floor(rem * (1.0 / 256.0))
    r = rem - gch * 256.0
    return jnp.concatenate([r, gch, b], axis=1)


def _make_kernel(g: _Geom):
    C, w = g.C, g.w
    s, elo = g.s, g.elo
    WPT, WSEG, WPB, WSGB, LCOL = g.WPT, g.WSEG, g.WPB, g.WSGB, g.LCOL
    Ppad, Spad, Wpad = g.Ppad, g.Spad, g.Wpad
    n_pt_chunks = Ppad // C
    n_bd_chunks = g.NBpad // C
    two_eps = float(2.0 * EPS)  # python float: kernels cannot capture arrays

    def winner_color(xc, soff, x0_ref, x1_ref, d0_ref, dd_ref, rs_ref,
                     c0p_ref, c1p_ref, width):
        """xc: (C,1) part centers; window [soff, soff+width) of segments.
        Returns (color (C,3), has (C,1)).

        Winner attributes are extracted with masked maxes over the window,
        never a one-hot matmul: the MXU multiplies f32 operands in bf16 by
        default, which rounds the attribute values themselves.  ip lies in
        (0,1) and the packed colors are non-negative exact integers, so a
        -1 masked max is an exact single-hot selection."""
        x0 = x0_ref[0, 0, pl.ds(soff, width)].reshape(1, width)
        x1 = x1_ref[0, 0, pl.ds(soff, width)].reshape(1, width)
        d0 = d0_ref[0, 0, pl.ds(soff, width)].reshape(1, width)
        dd = dd_ref[0, 0, pl.ds(soff, width)].reshape(1, width)
        rs = rs_ref[0, 0, pl.ds(soff, width)].reshape(1, width)
        act = (x0 < xc) & (xc < x1)                  # == 0 < ip < 1
        ip = (xc - x0) * rs
        clo = d0 + ip * dd
        qs = jnp.where(act, clo, NEG_INF)            # (C, width)
        mx = jnp.max(qs, axis=1, keepdims=True)
        has = mx > NEG_INF
        li = jax.lax.broadcasted_iota(jnp.int32, (C, width), 1)
        win = jnp.max(jnp.where(qs == mx, li, -1), axis=1, keepdims=True)
        oh = li == win                               # (C, width) single-hot
        c0p = c0p_ref[0, 0, pl.ds(soff, width)].reshape(1, width)
        c1p = c1p_ref[0, 0, pl.ds(soff, width)].reshape(1, width)

        def sel(v):
            return jnp.max(jnp.where(oh, jnp.broadcast_to(v, (C, width)),
                                     -1.0), axis=1, keepdims=True)
        sip = sel(ip)
        col0 = _unpack_rgb(sel(c0p))
        col1 = _unpack_rgb(sel(c1p))
        color = col0 + sip * (col1 - col0)
        return color, has

    def kernel(px_ref, x0_ref, x1_ref, d0_ref, dd_ref, rs_ref, c0p_ref,
               c1p_ref, out_ref):
        out_ref[...] = jnp.zeros_like(out_ref)
        sub = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)

        def pt_chunk(i, _):
            p0 = i * C
            pxs = px_ref[0, 0, pl.ds(pl.multiple_of(p0, 128), C)
                         ].reshape(C, 1)
            # next breakpoint: masked min over the point window
            qoff = pl.multiple_of(jnp.clip(p0 - g.QL, 0, Ppad - WPT), 128)
            xq = px_ref[0, 0, pl.ds(qoff, WPT)].reshape(1, WPT)
            lane = jax.lax.broadcasted_iota(jnp.int32, (C, WPT), 1)
            # q_abs > p_abs  <=>  lane - sub > p0 - qoff
            idxgt = (lane - sub) > (p0 - qoff)
            elig = (xq > pxs) | ((xq == pxs) & idxgt)
            nxt = jnp.min(jnp.where(elig, jnp.broadcast_to(xq, (C, WPT)),
                                    POS_INF), axis=1, keepdims=True)
            cap = jnp.floor(pxs) + 1.0
            end = jnp.minimum(nxt, cap)
            sig = end - pxs - two_eps
            xc = 0.5 * (pxs + end)
            valid = (xc >= 0.0) & (xc < float(w))
            pix = jnp.floor(xc).astype(jnp.int32)

            soff = pl.multiple_of(jnp.clip(p0 - g.SL, 0, Spad - WSEG), 128)
            color, has = winner_color(xc, soff, x0_ref, x1_ref, d0_ref,
                                      dd_ref, rs_ref, c0p_ref, c1p_ref,
                                      WSEG)
            wgt = jnp.where(valid & has, sig, 0.0)
            contrib = jnp.concatenate(
                [color * wgt, jnp.zeros((C, 5), jnp.float32)], axis=1)
            base = jnp.clip(((jnp.floor(jnp.float32(p0) * s + elo)
                              .astype(jnp.int32) - 2) // 8) * 8,
                            0, Wpad - LCOL)
            pixloc = pix - base
            ohp = (jax.lax.broadcasted_iota(jnp.int32, (C, LCOL), 1)
                   == pixloc).astype(jnp.float32)
            # The MXU rounds f32 operands to bf16; the one-hot side is
            # exact there, and splitting the contribution into its bf16
            # part plus residual makes the scatter-sum exact to ~1e-3
            # (each product passes through the MXU unrounded).
            hi = contrib.astype(jnp.bfloat16).astype(jnp.float32)
            lo = contrib - hi
            nums = (((0,), (0,)), ((), ()))
            add = (jax.lax.dot_general(ohp, hi, nums,
                                       preferred_element_type=jnp.float32)
                   + jax.lax.dot_general(ohp, lo, nums,
                                         preferred_element_type=jnp.float32))
            out_ref[0, pl.ds(base, LCOL), :] += add
            return 0

        jax.lax.fori_loop(0, n_pt_chunks, pt_chunk, 0)

        def bd_chunk(i, _):
            c0col = i * C
            cols = (c0col + sub).astype(jnp.float32)          # (C,1)
            qoff = pl.multiple_of(
                jnp.clip(c0col * g.inv_s - g.QBL, 0, Ppad - WPB), 128)
            xq = px_ref[0, 0, pl.ds(qoff, WPB)].reshape(1, WPB)
            elig = xq >= cols
            nxt = jnp.min(jnp.where(elig, jnp.broadcast_to(xq, (C, WPB)),
                                    POS_INF), axis=1, keepdims=True)
            end = jnp.minimum(nxt, cols + 1.0)
            sig = end - cols - two_eps
            xc = 0.5 * (cols + end)
            valid = (xc >= 0.0) & (xc < float(w))

            soff = pl.multiple_of(
                jnp.clip(c0col * g.inv_s - g.SBL, 0, Spad - WSGB), 128)
            color, has = winner_color(xc, soff, x0_ref, x1_ref, d0_ref,
                                      dd_ref, rs_ref, c0p_ref, c1p_ref,
                                      WSGB)
            wgt = jnp.where(valid & has, sig, 0.0)
            contrib = jnp.concatenate(
                [color * wgt, jnp.zeros((C, 5), jnp.float32)], axis=1)
            # boundary part i of this chunk belongs to pixel c0col+i exactly
            # (its interval is inside [col, col+1]), and Wpad >= NBpad, so
            # the scatter is an identity: add rows in place.  Out-of-image
            # columns already have wgt == 0.
            out_ref[0, pl.ds(c0col, C), :] += contrib
            return 0

        jax.lax.fori_loop(0, n_bd_chunks, bd_chunk, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "divergence_px", "separation_px", "exponent", "sharp", "interpret"))
def _rasterize_rows(image, nd, divergence_px: float, separation_px: float,
                    exponent: float, sharp: bool, interpret: bool = False):
    """image: (R, W, 3) uint8 rows, nd: (R, W) f32 -> (R, W, 3) uint8."""
    R, w, _ = image.shape
    g = _Geom(w, divergence_px, separation_px, sharp)
    rows = _build_rows(image, nd, divergence_px, separation_px, exponent, g)
    kernel = _make_kernel(g)
    row_spec = lambda n: pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(R,),
        in_specs=[row_spec(g.Ppad)] + [row_spec(g.Spad)] * 7,
        out_specs=pl.BlockSpec((1, g.Wpad, 8), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, g.Wpad, 8), jnp.float32),
        interpret=interpret,
    )(rows["px"], rows["x0"], rows["x1"], rows["d0"], rows["dd"], rows["rs"],
      rows["c0p"], rows["c1p"])
    acc = out[:, :w, :3] + 0.5
    return jnp.clip(acc, 0.0, 255.0).astype(jnp.uint8)


def polylines_rasterize_pallas(image, normalized_depth, divergence_px: float,
                               separation_px: float, exponent: float,
                               sharp: bool, interpret: bool | None = None):
    """Rasterize one image or a batch.

    image: (H, W, 3) or (N, H, W, 3) uint8; normalized_depth matching
    (H, W) / (N, H, W) in [0, 1].  Frames of a batch flatten into the row
    grid (rows are independent), so video batches cost one dispatch.
    """
    img = jnp.asarray(image, jnp.uint8)
    nd = jnp.asarray(normalized_depth, jnp.float32)
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    batched = img.ndim == 4
    if batched:
        n, h, w, c = img.shape
        img = img.reshape(n * h, w, c)
        nd = nd.reshape(n * h, w)
    out = _rasterize_rows(img, nd, float(divergence_px), float(separation_px),
                          float(exponent), bool(sharp), bool(interpret))
    if batched:
        out = out.reshape(n, h, w, c)
    return out
