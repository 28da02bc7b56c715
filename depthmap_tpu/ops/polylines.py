"""Polylines stereo rasterization (the default fill, 'polylines_sharp').

Three interchangeable backends:
 * native  — C++ kernel (native/polylines.cpp) built on demand with g++ and
             loaded via ctypes; replaces the reference's numba dependency
             (src/stereoimage_generation.py:162-283) with an actual native
             library;
 * numpy   — pure-python row loop with identical semantics (always
             available; slow, used when no compiler is present);
 * the TPU path lives with the caller: rows can be dispatched over frames
   in video mode while the host kernel handles single images.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def _build_library() -> Optional[str]:
    src = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                       "native", "polylines.cpp")
    if not os.path.exists(src):
        return None
    cache_dir = os.path.join(tempfile.gettempdir(), "depthmap_tpu_native")
    os.makedirs(cache_dir, exist_ok=True)
    out = os.path.join(cache_dir, "libpolylines.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    try:
        # compile to a private temp name, then atomically publish: a
        # concurrent process must never CDLL a half-written .so
        tmp = out + f".tmp.{os.getpid()}"
        subprocess.run(["g++", "-O3", "-march=native", "-shared", "-fPIC",
                        "-pthread", src, "-o", tmp], check=True,
                       capture_output=True)
        os.replace(tmp, out)
        return out
    except Exception:
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = _build_library()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.polylines.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
        lib.polylines.restype = None
        lib.fill_naive_interpolating.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int]
        lib.fill_naive_interpolating.restype = None
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def fill_naive_interpolating_native(derived: np.ndarray,
                                    filled: np.ndarray
                                    ) -> Optional[np.ndarray]:
    """Exact sequential 'naive_interpolating' fill (the reference's numba
    semantics, incl. re-entrant processing of just-written black pixels).
    derived: (h, w, 3) uint8; filled: (h, w) bool/uint8 warp-hit mask.
    Returns the filled image, or None when the native library is absent."""
    lib = _get_lib()
    if lib is None:
        return None
    out = np.ascontiguousarray(derived, dtype=np.uint8).copy()
    f = np.ascontiguousarray(filled, dtype=np.uint8)
    h, w = f.shape
    lib.fill_naive_interpolating(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w)
    return out


def _polylines_native(image, nd, divergence_px, separation_px, exponent,
                      sharp: bool) -> Optional[np.ndarray]:
    lib = _get_lib()
    if lib is None:
        return None
    image = np.ascontiguousarray(image, dtype=np.uint8)
    nd = np.ascontiguousarray(nd, dtype=np.float64)
    h, w, c = image.shape
    out = np.zeros_like(image)
    lib.polylines(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        nd.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        h, w, c, float(divergence_px), float(separation_px), float(exponent),
        int(sharp), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def _polylines_numpy(image, nd, divergence_px, separation_px, exponent,
                     sharp: bool) -> np.ndarray:
    """Reference-semantics row loop (slow fallback)."""
    EPS = 1e-7
    HALF = 0.45 if sharp else 0.0
    h, w, c = image.shape
    out = np.zeros_like(image)
    cols = np.arange(w)
    for row in range(h):
        d = nd[row] ** exponent * divergence_px
        x = cols + 0.5 + d + separation_px
        absd = np.abs(d)
        if HALF < EPS:
            px = np.empty(w + 2)
            pd = np.empty(w + 2)
            pc = np.empty(w + 2, dtype=np.int64)
            px[1:-1], pd[1:-1], pc[1:-1] = x, absd, cols
        else:
            px = np.empty(2 * w + 2)
            pd = np.empty(2 * w + 2)
            pc = np.empty(2 * w + 2, dtype=np.int64)
            px[1:-1:2], px[2:-1:2] = x - HALF, x + HALF
            pd[1:-1:2] = pd[2:-1:2] = absd
            pc[1:-1:2] = pc[2:-1:2] = cols
        px[0], pd[0], pc[0] = -1.0 * w, 0.0, 0
        px[-1], pd[-1], pc[-1] = 2.0 * w, 0.0, w - 1

        n = len(px)
        sx0, sd0, sc0 = px[:-1], pd[:-1], pc[:-1]
        sx1, sd1, sc1 = px[1:], pd[1:], pc[1:]
        order = np.argsort(px[:-1], kind="stable")
        pxs = np.concatenate([px[:-1][order], px[-1:]])
        sx0, sd0, sc0 = sx0[order], sd0[order], sc0[order]
        sx1, sd1, sc1 = sx1[order], sd1[order], sc1[order]

        active: list = []
        sg_pointer = 0
        pt_i = 0
        sg_end = n - 1
        imrow = image[row].astype(np.float64)
        for col in range(w):
            color = np.full(c, 0.5)
            while pxs[pt_i] < col:
                pt_i += 1
            pt_i -= 1
            while pxs[pt_i] < col + 1:
                cf = max(col, pxs[pt_i]) + EPS
                ct = min(col + 1, pxs[pt_i + 1]) - EPS
                sig = ct - cf
                xc = cf + 0.5 * sig
                while sg_pointer < sg_end and sx0[sg_pointer] < xc:
                    active.append(sg_pointer)
                    sg_pointer += 1
                i = 0
                while i < len(active):
                    if sx1[active[i]] < xc:
                        active[i] = active[-1]
                        active.pop()
                    else:
                        i += 1
                best = active[0] if active else -1
                if len(active) != 1:
                    bc = -EPS
                    for idx in active:
                        ip = (xc - sx0[idx]) / (sx1[idx] - sx0[idx])
                        cl = (1 - ip) * sd0[idx] + ip * sd1[idx]
                        if bc < cl and 0.0 < ip < 1.0:
                            bc = cl
                            best = idx
                if best >= 0:
                    cl_ = int(sc0[best] + EPS)
                    cr_ = int(sc1[best] + EPS)
                    if cl_ == cr_:
                        color += imrow[cl_] * sig
                    else:
                        ip = (xc - sx0[best]) / (sx1[best] - sx0[best])
                        color += (imrow[cl_] * (1 - ip)
                                  + imrow[cr_] * ip) * sig
                pt_i += 1
            out[row, col] = np.clip(color, 0, 255).astype(np.uint8)
    return out


def apply_stereo_divergence_polylines(image, normalized_depth, divergence_px,
                                      separation_px, exponent,
                                      fill_technique: str = "polylines_sharp"):
    """image: (H, W, C) uint8; normalized_depth (H, W) in [0,1] -> uint8."""
    image = np.asarray(image, dtype=np.uint8)
    nd = np.asarray(normalized_depth, dtype=np.float64)
    sharp = fill_technique == "polylines_sharp"
    out = _polylines_native(image, nd, float(divergence_px),
                            float(separation_px), float(exponent), sharp)
    if out is None:
        out = _polylines_numpy(image, nd, float(divergence_px),
                               float(separation_px), float(exponent), sharp)
    return out
