"""Stereoscopic image generation: disparity warp + gap fill, TPU-native.

Capability parity with the reference's numba CPU kernels
(src/stereoimage_generation.py:13-307) but re-derived as data-parallel XLA
programs — no sequential row sweeps:

 * forward warp ("near overwrites far" sweep order, reference :104-111) is
   re-expressed as a scatter-max over an ordering key, which is exactly
   equivalent to last-write-wins under the reference's sweep direction;
 * the 'naive' / 'naive_interpolating' gap fills (reference :114-157) become
   prefix-scan nearest-neighbour / segment-interpolation passes;
 * the polylines rasterizer lives in ops/polylines.py.

All kernels are jit-able with static (w, h) so video frames batch cleanly.
"""
from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

STEREO_MODES = ("left-right", "right-left", "top-bottom", "bottom-top",
                "red-cyan-anaglyph", "left-only", "only-right",
                "cyan-red-reverseanaglyph")
FILL_TECHNIQUES = ("none", "naive", "naive_interpolating", "polylines_soft",
                   "polylines_sharp")


def normalize_depth(depth: jax.Array) -> jax.Array:
    depth = depth.astype(jnp.float32)
    dmin = jnp.min(depth)
    dmax = jnp.max(depth)
    return (depth - dmin) / (dmax - dmin)


# ---------------------------------------------------------------------------
# Forward warp (scatter-max formulation of the reference's sweep order)
# ---------------------------------------------------------------------------

def _warp_winners(normalized_depth, divergence_px, separation_px, exponent, w):
    """Per (row, target-col): index of the winning source column, or -1.

    Reference sweep (stereoimage_generation.py:104-111): for divergence >= 0
    cols are visited descending, so the LAST write to a target comes from the
    smallest source col; ascending otherwise.  last-write-wins == argmax of a
    visit-order key, computed here with one scatter-max.
    """
    h = normalized_depth.shape[0]
    col = jnp.arange(w, dtype=jnp.float32)[None, :]
    offset = normalized_depth ** exponent * divergence_px + separation_px
    col_d = (col + jnp.trunc(offset)).astype(jnp.int32)  # int() truncates
    valid = (col_d >= 0) & (col_d < w)

    cols_i = jnp.arange(w, dtype=jnp.int32)[None, :]
    key = jnp.where(divergence_px < 0, cols_i, w - 1 - cols_i)
    key = jnp.broadcast_to(key, (h, w))
    key = jnp.where(valid, key, -1)
    tgt = jnp.clip(col_d, 0, w - 1)

    rows = jnp.broadcast_to(jnp.arange(h, dtype=jnp.int32)[:, None], (h, w))
    keymap = jnp.full((h, w), -1, dtype=jnp.int32)
    keymap = keymap.at[rows, tgt].max(key, mode="drop")

    filled = keymap >= 0
    win_col = jnp.where(jnp.asarray(divergence_px < 0), keymap,
                        w - 1 - keymap)
    win_col = jnp.where(filled, win_col, 0)
    return win_col, filled


def _fill_naive(derived, filled, divergence_px, w):
    """Nearest-filled-neighbour fill; right wins ties; max search radius
    abs(int(divergence_px)) + 1 (reference :142-157)."""
    h = derived.shape[0]
    idx = jnp.arange(w, dtype=jnp.int32)[None, :]
    idxb = jnp.broadcast_to(idx, (h, w))
    # nearest filled index to the left (inclusive of self not needed: only
    # unfilled pixels are rewritten)
    left = jax.lax.associative_scan(
        jnp.maximum, jnp.where(filled, idxb, -(2 ** 30)), axis=1)
    right = jax.lax.associative_scan(
        jnp.minimum, jnp.where(filled, idxb, 2 ** 30), axis=1, reverse=True)
    dl = idxb - left
    dr = right - idxb
    max_off = jnp.abs(jnp.trunc(divergence_px)).astype(jnp.int32) + 1
    use_right = (dr <= dl) & (dr <= max_off)
    use_left = (dl < dr) & (dl <= max_off)
    src = jnp.where(use_right, jnp.clip(right, 0, w - 1),
                    jnp.where(use_left, jnp.clip(left, 0, w - 1), idxb))
    take = jnp.take_along_axis(derived, src[..., None], axis=1)
    replace = (~filled)[..., None] & (use_right | use_left)[..., None]
    return jnp.where(replace, take, derived)


def _fill_naive_interpolating(derived, filled, w):
    """Segment interpolation fill (reference :114-141), scan formulation.

    Pixels whose color sums to 0 and that are unfilled start/extend gap runs;
    each run [l, r) interpolates between derived[l-1] and the first pixel at
    or beyond the run with nonzero color (which, pre-fill, implies filled).
    uint8 wrap-around of the reference's `astype(np.uint8)` on negative floats
    is reproduced with mod-256 arithmetic.
    """
    h = derived.shape[0]
    idxb = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32)[None, :], (h, w))
    # builtin sum() over uint8 pixels wraps mod 256 in the reference's
    # non-numba fallback — reproduce that quirk (a pixel whose channel sum is
    # a multiple of 256 counts as "black")
    csum = jnp.sum(derived.astype(jnp.int32), axis=-1) % 256
    qualify = csum != 0                       # can serve as r_border
    gap = (csum == 0) & (~filled)             # pixels that trigger processing

    BIG = jnp.int32(2 ** 30)
    # nearest qualifying index strictly to the right (r_pointer candidate)
    q_right = jax.lax.associative_scan(
        jnp.minimum, jnp.where(qualify, idxb, BIG), axis=1, reverse=True)
    # segment id: number of qualifying pixels at or before this index;
    # pixels strictly between two qualifiers share a segment
    seg = jnp.cumsum(qualify.astype(jnp.int32), axis=1)
    # first *gap* index within each segment (the run start l_pointer)
    gap_idx = jnp.where(gap, idxb, BIG)

    def seg_min(vals, segs):
        return jax.ops.segment_min(vals, segs, num_segments=w + 1)
    first_gap = jax.vmap(seg_min)(gap_idx, seg)          # (h, w+1)
    l_pointer = jnp.take_along_axis(first_gap, seg, axis=1)  # per-pixel seg's l

    # pixel is rewritten iff csum==0 and its segment has a gap at or before it
    written = (csum == 0) & (l_pointer <= idxb)

    r_pointer = jnp.where(q_right >= BIG, w, q_right)
    lp_safe = jnp.clip(l_pointer, 0, w - 1)
    # l_border = derived[l_pointer - 1] (zeros when l_pointer == 0)
    lb = jnp.take_along_axis(
        derived, jnp.clip(lp_safe - 1, 0, w - 1)[..., None], axis=1
    ).astype(jnp.float32)
    lb = jnp.where((lp_safe - 1 < 0)[..., None], 0.0, lb)
    rb = jnp.take_along_axis(
        derived, jnp.clip(r_pointer, 0, w - 1)[..., None], axis=1
    ).astype(jnp.float32)
    rb = jnp.where((r_pointer >= w)[..., None], 0.0, rb)

    lb_zero = jnp.sum(lb.astype(jnp.int32), axis=-1, keepdims=True) % 256 == 0
    rb_zero = jnp.sum(rb.astype(jnp.int32), axis=-1, keepdims=True) % 256 == 0
    lb_eff = jnp.where(lb_zero, rb, lb)
    rb_eff = jnp.where(rb_zero & ~lb_zero, lb, rb)

    total = (1 + r_pointer - l_pointer).astype(jnp.float32)[..., None]
    step = (rb_eff - lb_eff) / total
    k = (idxb - l_pointer + 1).astype(jnp.float32)[..., None]
    # (step * k).astype(np.uint8): trunc toward zero then wrap mod 256
    delta = jnp.trunc(step * k).astype(jnp.int32)
    val = (lb_eff.astype(jnp.int32) + delta) % 256
    return jnp.where(written[..., None], val.astype(derived.dtype), derived)


@functools.partial(jax.jit, static_argnames=("fill_technique",))
def apply_stereo_divergence_naive(image, normalized_depth, divergence_px,
                                  separation_px, exponent,
                                  fill_technique: str = "none"):
    """image: (H, W, C) uint8; normalized_depth: (H, W) in [0,1]."""
    h, w = normalized_depth.shape
    win_col, filled = _warp_winners(normalized_depth, divergence_px,
                                    separation_px, exponent, w)
    derived = jnp.take_along_axis(image, win_col[..., None], axis=1)
    derived = jnp.where(filled[..., None], derived, 0).astype(image.dtype)
    if fill_technique == "naive":
        derived = _fill_naive(derived, filled, divergence_px, w)
    elif fill_technique == "naive_interpolating":
        derived = _fill_naive_interpolating(derived, filled, w)
    return derived


@jax.jit
def overlap_red_cyan(im1, im2):
    """R from im1, G+B from im2 (reference :286-307)."""
    return jnp.stack([im1[..., 0], im2[..., 1], im2[..., 2]], axis=-1)


def apply_stereo_divergence(image, depth, divergence, separation,
                            exponent, fill_technique):
    image = jnp.asarray(image)
    depth = jnp.asarray(depth)
    assert image.shape[:2] == depth.shape, \
        "Depthmap and the image must have the same size"
    nd = normalize_depth(depth)
    w = image.shape[1]
    divergence_px = (divergence / 100.0) * w
    separation_px = (separation / 100.0) * w
    if fill_technique in ("none", "naive", "naive_interpolating"):
        return apply_stereo_divergence_naive(
            image, nd, divergence_px, separation_px, exponent, fill_technique)
    if fill_technique in ("polylines_soft", "polylines_sharp"):
        from depthmap_tpu.ops.polylines import apply_stereo_divergence_polylines
        return apply_stereo_divergence_polylines(
            image, nd, divergence_px, separation_px, exponent, fill_technique)
    raise ValueError(f"Unknown fill technique {fill_technique!r}")


def create_stereoimages(original_image, depthmap, divergence, separation=0.0,
                        modes: Sequence[str] | str | None = None,
                        stereo_balance=0.0, stereo_offset_exponent=1.0,
                        fill_technique="polylines_sharp") -> List[np.ndarray]:
    """Parity with reference create_stereoimages (:13-74); returns uint8
    numpy arrays (the pipeline layer wraps them into PIL images)."""
    if modes is None:
        modes = ["left-right"]
    if not isinstance(modes, (list, tuple)):
        modes = [modes]
    if len(modes) == 0:
        return []

    original_image = jnp.asarray(np.asarray(original_image))
    depthmap = jnp.asarray(np.asarray(depthmap))
    balance = (stereo_balance + 1) / 2
    left_eye = original_image if balance < 0.001 else \
        apply_stereo_divergence(original_image, depthmap,
                                +1 * divergence * balance, -1 * separation,
                                stereo_offset_exponent, fill_technique)
    right_eye = original_image if balance > 0.999 else \
        apply_stereo_divergence(original_image, depthmap,
                                -1 * divergence * (1 - balance), separation,
                                stereo_offset_exponent, fill_technique)

    results = []
    for mode in modes:
        if mode == "left-right":
            results.append(jnp.hstack([left_eye, right_eye]))
        elif mode == "right-left":
            results.append(jnp.hstack([right_eye, left_eye]))
        elif mode == "top-bottom":
            results.append(jnp.vstack([left_eye, right_eye]))
        elif mode == "bottom-top":
            results.append(jnp.vstack([right_eye, left_eye]))
        elif mode == "red-cyan-anaglyph":
            results.append(overlap_red_cyan(left_eye, right_eye))
        elif mode == "left-only":
            results.append(left_eye)
        elif mode == "only-right":
            results.append(right_eye)
        elif mode == "cyan-red-reverseanaglyph":
            results.append(overlap_red_cyan(right_eye, left_eye))
        else:
            raise Exception("Unknown mode")
    return [np.asarray(r) for r in results]
