"""Pallas TPU polylines stereo rasterizer — the device-resident default fill.

Re-derivation of the reference's sequential per-row polyline rasterization
(src/stereoimage_generation.py:162-283) into a sort-free, gather-free data
parallel program for the TPU VPU:

The reference morphs each image row into a polyline, *sorts* the morphed
points, and sweeps left-to-right maintaining an active-segment set, emitting
one piecewise-constant "part" per interval between consecutive breakpoints
(morphed point xs union integer pixel boundaries).  Both the sort and the
sweep are sequential; a direct XLA port (ops/polylines_tpu.py) is bound by
data-dependent gathers.  This implementation removes both:

 * no sort: a morphed point's x deviates from an affine function of its
   array index by at most the divergence, so every candidate set the sweep
   would consult lives in a *statically-bounded contiguous index window*
   around an affine-in-index offset — contiguous slices, no gathers;
 * no sweep: each breakpoint generator (morphed point or pixel boundary)
   emits exactly one part [x, min(next breakpoint, next pixel boundary)].
   The "next breakpoint" masked window-min runs in the XLA prologue as a
   fused static shift chain (ties resolved by original index via the shift
   sign, reproducing stable-sort semantics);
 * the active-set winner for a part center xc is the masked argmax of
   interpolated closeness over the segments in xc's index window, computed
   in the Pallas kernel with the whole row's segment arrays VMEM-resident.
   The reference's qualification rule 0 < ip < 1 is equivalent to the
   strict stabbing predicate x0 < xc < x1, so qualification needs no
   division (reciprocal spans are precomputed); the ``best = active[0]``
   fallback in the reference triggers only when xc coincides *exactly* with
   a segment endpoint — which implies a zero-width part (significance of
   ~ -2*EPS), so dropping it changes nothing measurable;
 * winner attributes are extracted with masked maxes, never a one-hot
   matmul: the MXU multiplies f32 operands in bf16 by default, which rounds
   the attribute values themselves (measured 7.4 absolute error).  Colors
   ride as one packed float per point (r + 256 g + 65536 b — an exact
   integer < 2**24), so a winner costs three masked maxes: ip and the two
   packed endpoint colors.  `c0 + ip*(c1-c0)` is exact for same-column
   segments (c1 == c0), so the reference's col_l == col_r branch needs no
   flag;
 * part contributions scatter to pixels with a local-column one-hot matmul
   (point parts; pixel indices stay within a statically bounded LCOL
   window) split into an exact bf16-high plus residual-low pair of MXU
   passes, or a direct in-place add (boundary parts map 1:1 to pixels).

Mosaic constraint that shapes the layout: dynamic *lane*-dimension slices
only lower at 128-aligned offsets.  Part chunks are therefore 64 wide and
grouped in pairs so every window load starts at a multiple of 128; the
per-sub-chunk candidate windows are *static* sub-slices of that load, which
keeps the scored area at (64 x WSUB) instead of (128 x full window) — a
~35% element reduction.  Part descriptors (center, significance) are
reshaped to (rows, n/64, 64) so a 64-part chunk is one dynamic *sublane*
index, which Mosaic lowers at any offset.

Numerics: the reference computes in float64; this kernel is float32 on
device.  Positions carry ~1e-4 px rounding at 1920 px widths, so isolated
bytes can differ by 1 at part boundaries (bounded on-chip in
tests/test_polylines_pallas.py: >= 99.9% of bytes exact, none off by > 1).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

EPS = 1e-7
NEG_INF = float(-jnp.inf)
POS_INF = float(jnp.inf)
CSUB = 64            # parts per scored sub-chunk
GRP = 128            # aligned group: two point sub-chunks


def _roundup(x: int, m: int) -> int:
    return -(-int(x) // m) * m


class _Geom:
    """Static geometry for one (w, divergence, separation, sharp) config.

    All morphed point positions obey  x_q in [q*s + elo, q*s + ehi]  where
    q is the point's array index (sentinels at 0 and P-1), which makes
    every candidate window affine-in-index with static width.
    """

    def __init__(self, w: int, divergence_px: float, separation_px: float,
                 sharp: bool):
        self.w = w
        self.sharp = sharp
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
        self.inv_s = int(round(1 / s))               # 2 (sharp) / 1 (soft)
        E = self.ehi - self.elo
        spanmax = D + 1.0                            # non-sentinel max span
        # -- prologue next-breakpoint shift ranges
        #    points: eligible q in [p - E/s, p + (E+1)/s]
        self.NL = int(np.ceil(E / s)) + 2
        self.NR = int(np.ceil((E + 1) / s)) + 2
        #    boundaries (index base c/s): q-offsets in [-ehi/s, (1-elo)/s]
        self.BL = int(np.ceil(max(0.0, self.ehi) / s)) + 2
        self.BR = int(np.ceil((1 - min(0.0, self.elo)) / s)) + 2
        # -- kernel windows.  Point parts and the next-breakpoint search
        # share ONE window per 128-part chunk: the eligibility range
        # ([p - (E)/s, p + (E+1)/s]) is a subset of the scoring range once
        # LPAD >= SLn, and the xq candidates are exactly the x0 slab
        # (px[j] == x0[j] for all real segments; the final sentinel is
        # irrelevant because the pixel-boundary cap always undercuts it).
        self.SLn = int(np.ceil((spanmax + E) / s)) + 4
        self.RTn = max(int(np.ceil((E + 1) / s)) + 4, self.NR + 2)
        self.C = 128
        self.LPAD = _roundup(max(self.SLn, self.NL + 2), 128)
        self.PTW = _roundup(self.LPAD + self.C + self.RTn, 128)
        #    boundary parts score against pre-shifted slab copies
        #    (copy[i] = slab[i - SBn]) so a 128-index chunk's window is an
        #    aligned 256/384-wide slice with no in-kernel rotations
        self.SBn = int(np.ceil(max(0.0, spanmax + self.ehi) / s)) + 4
        self.RBn = max(int(np.ceil((1 - min(0.0, self.elo)) / s)) + 4,
                       self.BR + 2)
        self.bd_cols = 128 // self.inv_s             # cols per bd chunk
        self.WB = _roundup(self.SBn + 128 + self.RBn, 128)
        self.Spad = _roundup(self.S, 128)
        self.Ppad = _roundup(self.P, self.C)
        self.NB = w + 1                              # boundary generators
        self.NBpad = _roundup(self.NB, self.bd_cols)
        self.n_bd_chunks = self.NBpad // self.bd_cols
        self.Scopy = _roundup(
            max(self.Spad + self.SBn,
                128 * (self.n_bd_chunks - 1) + self.WB), 128)
        # -- local output-column window for the point-part scatter
        self.LCOL = _roundup(int(np.ceil(self.C * s + E + 1)) + 18, 128)
        self.Wpad = max(_roundup(w, 8), self.LCOL, self.NBpad)
        self.LCOL = min(self.LCOL, self.Wpad)
        # small images: windows cap at the whole array, groups unroll
        self.pt_full = self.PTW > self.Spad
        self.PTW = min(self.PTW, self.Spad)
        self.WB = min(self.WB, self.Scopy)
        self.BIGX = 4.0 * (w + D + abs(sep) + 2.0)


def _shift(a, delta: int, fill: float):
    """a: (R, N) -> out[:, i] = a[:, i + delta], `fill` beyond the edges."""
    if delta == 0:
        return a
    R, N = a.shape
    pad = jnp.full((R, abs(delta)), fill, a.dtype)
    if delta > 0:
        return jnp.concatenate([a[:, delta:], pad], 1)
    return jnp.concatenate([pad, a[:, :delta]], 1)


def _build_rows(image, nd, divergence_px, separation_px, exponent, g: _Geom):
    """XLA prologue: morphed segment slabs + per-part descriptors.

    image: (R, W, 3) uint8, nd: (R, W) f32 in [0,1].  Everything here is
    elementwise / static-shift work that XLA fuses; the sequential "next
    breakpoint" search becomes a static shift chain (the candidate index
    window is affine in the part index).
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
    # packed colors: r + 256 g + 65536 b — exact integers < 2**24
    pcp = pc[..., 0] + pc[..., 1] * 256.0 + pc[..., 2] * 65536.0

    def pad_to(a, n, val):
        return jnp.pad(a, ((0, 0), (0, n - a.shape[1])), constant_values=val)

    # ---- segment slabs (lane-major, (R, 1, Spad)) and boundary copies
    x0, x1 = px[:, :-1], px[:, 1:]
    d0 = pd[:, :-1]
    dd = pd[:, 1:] - d0
    c0p = pcp[:, :-1]
    c1p = pcp[:, 1:]
    span = x1 - x0
    rs = jnp.where(span != 0, 1.0 / jnp.where(span != 0, span, 1.0), 0.0)

    def slab(a, val):
        return pad_to(a, g.Spad, val)[:, None, :]

    def bdcopy(a, val):
        # copy[i] = slab[i - SBn]: boundary chunk j's candidate window is
        # then copy[128j : 128j + WB], an aligned static-width slice
        shifted = jnp.pad(a, ((0, 0), (g.SBn, 0)), constant_values=val)
        return pad_to(shifted, g.Scopy, val)[:, None, :]

    out = {}
    for name, arr, val in (("x0", x0, g.BIGX), ("x1", x1, g.BIGX),
                           ("d0", d0, 0.0), ("dd", dd, 0.0),
                           ("rs", rs, 0.0), ("c0p", c0p, 0.0),
                           ("c1p", c1p, 0.0)):
        out[name] = slab(arr, val)
        out["b" + name] = bdcopy(arr, val)
    return out


def _unpack_rgb(p):
    """(C,1) packed r + g*256 + b*65536 -> (C,3); exact for ints < 2**24."""
    b = jnp.floor(p * (1.0 / 65536.0))
    rem = p - b * 65536.0
    gch = jnp.floor(rem * (1.0 / 256.0))
    r = rem - gch * 256.0
    return jnp.concatenate([r, gch, b], axis=1)


def _make_kernel(g: _Geom, unroll: bool = False):
    w = g.w
    s, elo = g.s, g.elo
    C, Spad, Wpad, LCOL = g.C, g.Spad, g.Wpad, g.LCOL
    PTW, LPAD, WB = g.PTW, g.LPAD, g.WB

    def kernel(x0_ref, x1_ref, d0_ref, dd_ref, rs_ref, c0p_ref, c1p_ref,
               bx0_ref, bx1_ref, bd0_ref, bdd_ref, brs_ref, bc0p_ref,
               bc1p_ref, out_ref):
        out_ref[...] = jnp.zeros_like(out_ref)

        def winner(lds, nparts, width, xc):
            """Active-segment winner color for part centers xc (nparts,1)
            against window rows lds (each (1,width))."""
            x0w, x1w, d0w, ddw, rsw, c0w, c1w = lds
            XC = jnp.broadcast_to(xc, (nparts, width))
            act = (x0w < XC) & (XC < x1w)            # == 0 < ip < 1
            ip = (XC - x0w) * rsw
            clo = d0w + ip * ddw
            qs = jnp.where(act, clo, NEG_INF)
            mx = jnp.max(qs, axis=1, keepdims=True)
            has = mx > NEG_INF
            li = jax.lax.broadcasted_iota(jnp.int32, (nparts, width), 1)
            win = jnp.max(jnp.where(qs == mx, li, -1), axis=1, keepdims=True)
            oh = li == win                           # single-hot by argmax

            def sel(v):
                return jnp.max(jnp.where(oh, v, -1.0), axis=1, keepdims=True)

            sip = sel(ip)
            col0 = _unpack_rgb(sel(jnp.broadcast_to(c0w, (nparts, width))))
            col1 = _unpack_rgb(sel(jnp.broadcast_to(c1w, (nparts, width))))
            color = col0 + sip * (col1 - col0)
            return color, has

        # ---------------- point parts ----------------
        # Parts, the next-breakpoint search and the winner scan all share
        # one (C, PTW) window: px[j] == x0[j] for every real segment, and
        # the eligibility range is inside the scoring range (LPAD >= NL,
        # RTn >= NR).  Part index == segment index, so pxs is a static
        # sub-slice of the loaded x0 row.
        sub = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
        n_pt = Spad // C

        def pt_chunk(j, soff, lpad_off: int):
            raw = [r[0, 0, pl.ds(soff, PTW)]
                   for r in (x0_ref, x1_ref, d0_ref, dd_ref, rs_ref,
                             c0p_ref, c1p_ref)]
            lds = [v.reshape(1, PTW) for v in raw]
            pxs = raw[0][lpad_off:lpad_off + C].reshape(C, 1)
            XQ = jnp.broadcast_to(lds[0], (C, PTW))
            lane = jax.lax.broadcasted_iota(jnp.int32, (C, PTW), 1)
            idxgt = (lane - sub) > lpad_off          # q_abs > p_abs
            elig = (XQ > pxs) | ((XQ == pxs) & idxgt)
            nxt = jnp.min(jnp.where(elig, XQ, POS_INF), axis=1,
                          keepdims=True)
            end = jnp.minimum(nxt, jnp.floor(pxs) + 1.0)
            sig = end - pxs - 2.0 * EPS
            xc = 0.5 * (pxs + end)
            valid = (xc >= 0.0) & (xc < float(w))
            color, has = winner(lds, C, PTW, xc)
            wgt = jnp.where(valid & has, sig, 0.0)
            contrib = jnp.concatenate(
                [color * wgt, jnp.zeros((C, 5), jnp.float32)], axis=1)
            pix = jnp.floor(xc).astype(jnp.int32)
            base = jnp.clip(
                ((jnp.floor((j * C) * s + elo).astype(jnp.int32) - 2)
                 // 8) * 8, 0, Wpad - LCOL)
            ohp = (jax.lax.broadcasted_iota(jnp.int32, (C, LCOL), 1)
                   == (pix - base)).astype(jnp.float32)
            # exact scatter through the bf16 MXU: hi is bf16-representable
            # (passes unrounded), lo's own bf16 rounding is ~1e-3
            hi = contrib.astype(jnp.bfloat16).astype(jnp.float32)
            lo = contrib - hi
            nums = (((0,), (0,)), ((), ()))
            add = (jax.lax.dot_general(ohp, hi, nums,
                                       preferred_element_type=jnp.float32)
                   + jax.lax.dot_general(ohp, lo, nums,
                                         preferred_element_type=jnp.float32))
            out_ref[0, pl.ds(base, LCOL), :] += add

        j_lo = LPAD // C
        j_hi = j_lo if g.pt_full else min(n_pt, (Spad - PTW + LPAD) // C + 1)
        if j_hi > j_lo:
            if unroll:
                for j in range(j_lo, j_hi):
                    pt_chunk(j, j * C - LPAD, LPAD)
            else:
                def body(j, _):
                    pt_chunk(j, pl.multiple_of(j * C - LPAD, 128), LPAD)
                    return 0
                jax.lax.fori_loop(j_lo, j_hi, body, 0)
        for j in [j for j in range(n_pt) if j < j_lo or j >= j_hi]:
            soff = int(np.clip(j * C - LPAD, 0, Spad - PTW))
            pt_chunk(j, soff, j * C - soff)

        # ---------------- boundary parts ----------------
        # One chunk covers 128 index units (= bd_cols columns); its window
        # is an aligned slice of the SBn-pre-shifted slab copies, so there
        # are no edge cases and no rotations.  Boundary part i belongs to
        # pixel col0+i exactly (its interval is inside [col, col+1]): the
        # scatter is a direct in-place add; cols >= w carry sig == 0.
        nb = g.bd_cols
        subb = jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0)

        def bd_chunk(k, _):
            soff = pl.multiple_of(k * 128, 128)
            lds = [r[0, 0, pl.ds(soff, WB)].reshape(1, WB)
                   for r in (bx0_ref, bx1_ref, bd0_ref, bdd_ref, brs_ref,
                             bc0p_ref, bc1p_ref)]
            cols = (k * nb + subb).astype(jnp.float32)
            XQ = jnp.broadcast_to(lds[0], (nb, WB))
            elig = XQ >= cols
            nxt = jnp.min(jnp.where(elig, XQ, POS_INF), axis=1,
                          keepdims=True)
            end = jnp.minimum(nxt, cols + 1.0)
            sig = end - cols - 2.0 * EPS
            xc = 0.5 * (cols + end)
            valid = xc < float(w)                    # xc >= 0 by design
            color, has = winner(lds, nb, WB, xc)
            wgt = jnp.where(valid & has, sig, 0.0)
            contrib = jnp.concatenate(
                [color * wgt, jnp.zeros((nb, 5), jnp.float32)], axis=1)
            out_ref[0, pl.ds(k * nb, nb), :] += contrib
            return 0

        if unroll:
            for k in range(g.n_bd_chunks):
                bd_chunk(k, 0)
        else:
            jax.lax.fori_loop(0, g.n_bd_chunks, bd_chunk, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "divergence_px", "separation_px", "exponent", "sharp", "interpret",
    "unroll"))
def _rasterize_rows(image, nd, divergence_px: float, separation_px: float,
                    exponent: float, sharp: bool, interpret: bool = False,
                    unroll: bool = False):
    """image: (R, W, 3) uint8 rows, nd: (R, W) f32 -> (R, W, 3) uint8."""
    R, w, _ = image.shape
    g = _Geom(w, divergence_px, separation_px, sharp)
    rows = _build_rows(image, nd, divergence_px, separation_px, exponent, g)
    kernel = _make_kernel(g, unroll)

    def spec3(n):
        return pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    names = ("x0", "x1", "d0", "dd", "rs", "c0p", "c1p")
    out = pl.pallas_call(
        kernel,
        grid=(R,),
        in_specs=[spec3(g.Spad)] * 7 + [spec3(g.Scopy)] * 7,
        out_specs=pl.BlockSpec((1, g.Wpad, 8), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, g.Wpad, 8), jnp.float32),
        interpret=interpret,
    )(*[rows[n] for n in names], *[rows["b" + n] for n in names])
    acc = out[:, :w, :3] + 0.5
    return jnp.clip(acc, 0.0, 255.0).astype(jnp.uint8)


@functools.lru_cache(maxsize=2)
def _row_mesh(force_single: bool) -> Mesh | None:
    """1-D mesh over all local devices for the row-sharded dispatch.

    Rows are embarrassingly parallel (grid=(R,), writes row-disjoint), so the
    multi-chip path is a pure data split with no collectives — SURVEY §2.4
    "batch rows×frames across the mesh", the TPU analogue of the reference's
    numba ``prange`` row loop (src/stereoimage_generation.py:174)."""
    devs = jax.devices()
    if len(devs) < 2 and not force_single:
        return None
    return Mesh(np.array(devs), ("rows",))


@functools.lru_cache(maxsize=None)
def _sharded_program(divergence_px: float, separation_px: float,
                     exponent: float, sharp: bool, interpret: bool,
                     unroll: bool, mesh: Mesh):
    """jitted shard_map program for one static config (re-tracing the
    shard_map per call costs more than the rasterization itself)."""
    return jax.jit(jax.shard_map(
        functools.partial(_rasterize_rows, divergence_px=divergence_px,
                          separation_px=separation_px, exponent=exponent,
                          sharp=sharp, interpret=interpret, unroll=unroll),
        mesh=mesh, in_specs=(P("rows"), P("rows")), out_specs=P("rows"),
        # pallas_call's out_shape carries no varying-mesh-axes metadata;
        # there are no collectives to check in this body anyway
        check_vma=False))


def _rasterize_rows_sharded(img, nd, divergence_px: float,
                            separation_px: float, exponent: float,
                            sharp: bool, interpret: bool,
                            unroll: bool, mesh: Mesh):
    """shard_map the row grid over the mesh: each device rasterizes its row
    shard with the same Pallas program; rows pad up to a multiple of the
    device count (padded rows are sliced off — their output is unused)."""
    ndev = int(mesh.devices.size)
    R = img.shape[0]
    rpad = (-R) % ndev
    if rpad:
        img = jnp.pad(img, ((0, rpad), (0, 0), (0, 0)))
        nd = jnp.pad(nd, ((0, rpad), (0, 0)))
    fn = _sharded_program(divergence_px, separation_px, exponent, sharp,
                          interpret, unroll, mesh)
    out = fn(img, nd)
    return out[:R] if rpad else out


def polylines_rasterize_pallas(image, normalized_depth, divergence_px: float,
                               separation_px: float, exponent: float,
                               sharp: bool, interpret: bool | None = None,
                               shard: bool | None = None):
    """Rasterize one image or a batch.

    image: (H, W, 3) or (N, H, W, 3) uint8; normalized_depth matching
    (H, W) / (N, H, W) in [0, 1].  Frames of a batch flatten into the row
    grid (rows are independent), so video batches cost one dispatch.

    With more than one device (or DEPTHMAP_POLYLINES_SHARD=1 forcing the
    dispatch path on one), the flattened row grid shards over a 1-D device
    mesh via shard_map; DEPTHMAP_POLYLINES_SHARD=0 disables.
    """
    img = jnp.asarray(image, jnp.uint8)
    nd = jnp.asarray(normalized_depth, jnp.float32)
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    unroll = os.environ.get("DEPTHMAP_POLY_UNROLL", "0") == "1"
    batched = img.ndim == 4
    if batched:
        n, h, w, c = img.shape
        img = img.reshape(n * h, w, c)
        nd = nd.reshape(n * h, w)
    env = os.environ.get("DEPTHMAP_POLYLINES_SHARD")
    explicit = shard is not None
    if shard is None:
        shard = env != "0"
    # an EXPLICIT shard=True must take the shard_map dispatch even on one
    # device (callers use it to prove the sharded path, e.g. the driver
    # dryrun's sharded==unsharded check); the auto path only forces a
    # single-device mesh when DEPTHMAP_POLYLINES_SHARD=1 asks for it
    mesh = _row_mesh(env == "1" or (explicit and shard)) if shard else None
    if mesh is not None:
        out = _rasterize_rows_sharded(
            img, nd, float(divergence_px), float(separation_px),
            float(exponent), bool(sharp), bool(interpret), unroll, mesh)
    else:
        out = _rasterize_rows(img, nd, float(divergence_px),
                              float(separation_px), float(exponent),
                              bool(sharp), bool(interpret), unroll)
    if batched:
        out = out.reshape(n, h, w, c)
    return out
