"""BoostingMonocularDepth: multi-resolution merge, TPU-batched.

Algorithm parity with the reference (src/depthmap_generation.py:774-1160):
R_x resolution search by Sobel-gradient dilation, whole-image double
estimation merged by the pix2pix net, adaptive patch selection from a
gradient integral image, per-patch double estimation + merge + deg-1 polyfit
to the base + Gaussian-mask blending.

TPU re-architecture (the flagship change, SURVEY.md §3.2): the reference
processes patches *serially* — two model forwards + one merge-net forward
per patch.  All patch computations here are independent of the sequential
blend, so they run as three batched device calls (low-res batch, high-res
batch, merge batch); only the final mask blend runs in patch order (a cheap
elementwise pass).
"""
from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np

PIX2PIX_SIZE = 1024

RECEPTIVE_FIELDS = {0: 448, 1: 512, 11: 518, 12: 518, 13: 518, 14: 518}


def receptive_field(model_type: int) -> int:
    return RECEPTIVE_FIELDS.get(model_type, 384)


def rgb2gray(rgb: np.ndarray) -> np.ndarray:
    return np.dot(rgb[..., :3], [0.2989, 0.5870, 0.1140])


@functools.lru_cache(maxsize=4)
def generate_mask(size: Tuple[int, int]) -> np.ndarray:
    """Gaussian blend mask (reference generatemask :944-953)."""
    mask = np.zeros(size, dtype=np.float32)
    sigma = int(size[0] / 16)
    k_size = int(2 * np.ceil(2 * int(size[0] / 16)) + 1)
    mask[int(0.15 * size[0]):size[0] - int(0.15 * size[0]),
         int(0.15 * size[1]):size[1] - int(0.15 * size[1])] = 1
    mask = cv2.GaussianBlur(mask, (k_size, k_size), sigma)
    mask = (mask - mask.min()) / (mask.max() - mask.min())
    return mask.astype(np.float32)


def _block_reduce_max(img: np.ndarray, n: int) -> np.ndarray:
    """skimage.measure.block_reduce(img, (n, n), np.max) equivalent."""
    h, w = img.shape
    ph, pw = (-h) % n, (-w) % n
    img = np.pad(img, ((0, ph), (0, pw)), constant_values=0)
    return img.reshape(img.shape[0] // n, n, img.shape[1] // n, n).max((1, 3))


# ---- device-resident patch kernels -----------------------------------
# The Boost hot path keeps every intermediate on device: crops, net
# forwards, pix2pix merges, polyfit mapping and the sequential mask blend
# are device programs with *dynamic* rects (one compiled shape per stream),
# and the only host transfer is the final (H, W) depth map.  This matters
# because device->host bandwidth is the scarcest resource (the reference
# moves every patch estimate through host numpy; at 1024^2 f32 per patch
# that is ~12 MB/patch of round-trips).

@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "method"))
def _crop_resize_batch(src, rects, out_h: int, out_w: int,
                       method: str = "cubic"):
    """Crop each rect [x, y, w, h] from `src` (H, W[, C]) and resize to
    (out_h, out_w): one compiled program for ANY rect set (rects are traced
    values).  Geometry matches cv2 crop+resize exactly in the interior;
    at the 1-2 border pixels the kernel samples real image neighbours where
    cv2 would clamp at the crop edge (verified <=3e-6 interior deviation)."""
    src_f = jnp.asarray(src, jnp.float32)
    out_shape = (out_h, out_w) + src_f.shape[2:]

    def one(rect):
        x, y, w, h = [rect[i].astype(jnp.float32) for i in range(4)]
        sy = out_h / jnp.maximum(h, 1.0)
        sx = out_w / jnp.maximum(w, 1.0)
        scale = jnp.stack([sy, sx])
        trans = jnp.stack([-y * sy, -x * sx])
        return jax.image.scale_and_translate(
            src_f, out_shape, (0, 1), scale, trans, method, antialias=False)

    return jax.vmap(one)(jnp.asarray(rects))


@jax.jit
def _minmax_norm_batch(x):
    """Per-sample min-max normalize (doubleestimate semantics :1040-1049)."""
    lo = x.min(axis=(1, 2), keepdims=True)
    hi = x.max(axis=(1, 2), keepdims=True)
    return jnp.where(hi > lo, (x - lo) / jnp.where(hi > lo, hi - lo, 1.0),
                     0.0)


@jax.jit
def _fit_to_base(mapped, base):
    """Closed-form deg-1 polyfit of mapped -> base applied to mapped
    (reference :915-916), batched over patches."""
    mm = mapped.mean(axis=(1, 2), keepdims=True)
    bm = base.mean(axis=(1, 2), keepdims=True)
    cov = (mapped * base).mean(axis=(1, 2), keepdims=True) - mm * bm
    var = (mapped * mapped).mean(axis=(1, 2), keepdims=True) - mm * mm
    slope = jnp.where(var > 1e-12, cov / jnp.maximum(var, 1e-12), 0.0)
    return slope * mapped + (bm - slope * mm)


@jax.jit
def _upsample_p_jit(x):
    """(c, h, w) -> (c, P, P) bicubic (doubleestimate's resize-to-1024)."""
    from depthmap_tpu.ops.resize import interpolate
    return interpolate(x[..., None], (PIX2PIX_SIZE, PIX2PIX_SIZE),
                       "bicubic", False)[..., 0]


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _to_frame_jit(x, h: int, w: int):
    """(P, P) whole estimate -> (h, w) merge frame."""
    from depthmap_tpu.ops.resize import interpolate
    return interpolate(x[None, ..., None], (h, w), "bicubic", False)[0, ..., 0]


@jax.jit
def _blend_patches(updated, merged, rects, mask_src):
    """Sequential big->small Gaussian-mask blend (reference :907-941) as one
    device program.  merged: (N, P, P) polyfit-mapped patch estimates;
    rects: (N, 4) [x, y, w, h] (zero-size rows are no-ops); mask_src: the
    reference blend mask (generatemask :944-953).  Each step pastes the
    patch at its rect in the full frame and alpha-blends with the mask."""
    h_frame, w_frame = updated.shape
    p = merged.shape[1]
    mh, mw = mask_src.shape
    rowi = jnp.arange(h_frame, dtype=jnp.float32)[:, None]
    coli = jnp.arange(w_frame, dtype=jnp.float32)[None, :]

    def body(i, upd):
        rect = rects[i].astype(jnp.float32)
        x, y, w, h = rect[0], rect[1], rect[2], rect[3]
        m = merged[i]
        sy = h / p
        sx = w / p
        merged_f = jax.image.scale_and_translate(
            m, (h_frame, w_frame), (0, 1), jnp.stack([sy, sx]),
            jnp.stack([y, x]), "cubic", antialias=False)
        mask_f = jax.image.scale_and_translate(
            mask_src, (h_frame, w_frame), (0, 1),
            jnp.stack([h / mh, w / mw]), jnp.stack([y, x]), "linear",
            antialias=False)
        inside = ((rowi >= y) & (rowi < y + h) &
                  (coli >= x) & (coli < x + w) & (w > 0) & (h > 0))
        mask_f = jnp.where(inside, mask_f, 0.0)
        return upd * (1.0 - mask_f) + merged_f * mask_f

    return jax.lax.fori_loop(0, rects.shape[0], body, updated)


def calculate_processing_res(img: np.ndarray, basesize: int,
                             confidence: float = 0.2,
                             scale_threshold: float = 3,
                             whole_size_threshold: int = 3000):
    """R_x search (reference calculateprocessingres :969-1024)."""
    speed_scale = 32
    image_dim = int(min(img.shape[:2]))

    gray = rgb2gray(img)
    grad = np.abs(cv2.Sobel(gray, cv2.CV_64F, 0, 1, ksize=3)) + \
        np.abs(cv2.Sobel(gray, cv2.CV_64F, 1, 0, ksize=3))
    grad = cv2.resize(grad, (image_dim, image_dim), cv2.INTER_AREA)

    m, M = grad.min(), grad.max()
    middle = m + (0.4 * (M - m))
    grad = np.where(grad < middle, 0.0, 1.0)

    kernel = np.ones((int(basesize / speed_scale),) * 2, float)
    kernel2 = np.ones((int(basesize / (4 * speed_scale)),) * 2, float)

    threshold = min(whole_size_threshold, scale_threshold * max(img.shape[:2]))
    outputsize_scale = basesize / speed_scale
    grad_resized = grad
    for p_size in range(int(basesize / speed_scale),
                        int(threshold / speed_scale),
                        int(basesize / (2 * speed_scale))):
        n = int(np.floor(grad.shape[0] / p_size))
        grad_resized = _block_reduce_max(grad, max(n, 1))
        grad_resized = cv2.resize(grad_resized, (p_size, p_size),
                                  cv2.INTER_NEAREST)
        grad_resized = np.where(grad_resized >= 0.5, 1.0, 0.0)

        dilated = cv2.dilate(grad_resized, kernel, iterations=1)
        meanvalue = (1 - dilated).mean()
        if meanvalue > confidence:
            break
        outputsize_scale = p_size

    grad_region = cv2.dilate(grad_resized, kernel2, iterations=1)
    patch_scale = grad_region.mean()
    return int(outputsize_scale * speed_scale), patch_scale


def apply_grid_patch(blsize: int, stride: int, img: np.ndarray) -> List[dict]:
    """Initial patch grid (reference applyGridpatch :1102-1116)."""
    out = []
    for k in range(blsize, img.shape[1] - blsize, stride):
        for j in range(blsize, img.shape[0] - blsize, stride):
            out.append({"rect": [k - blsize, j - blsize, 2 * blsize,
                                 2 * blsize],
                        "size": 2 * blsize})
    return out


def _integral(img: np.ndarray) -> np.ndarray:
    """cv2.integral equivalent: (h+1, w+1) with zero first row/col."""
    out = np.zeros((img.shape[0] + 1, img.shape[1] + 1), np.float64)
    out[1:, 1:] = np.cumsum(np.cumsum(img, axis=0), axis=1)
    return out


def _gf_from_integral(ii: np.ndarray, rect) -> float:
    x1, x2 = rect[1], rect[1] + rect[3]
    y1, y2 = rect[0], rect[0] + rect[2]
    return ii[x2, y2] - ii[x1, y2] - ii[x2, y1] + ii[x1, y1]


def adaptive_selection(ii: np.ndarray, patches: List[dict], gf: float,
                       factor: float) -> List[dict]:
    """Grow patches until their gradient density matches the image's
    (reference adaptiveselection :1119-1160)."""
    out = []
    height, width = ii.shape
    search_step = int(32 / factor)
    for p in patches:
        bbox = list(p["rect"])
        cgf = _gf_from_integral(ii, bbox) / (bbox[2] * bbox[3])
        if cgf >= gf:
            bbox_test = bbox.copy()
            while True:
                bbox_test[0] -= int(search_step / 2)
                bbox_test[1] -= int(search_step / 2)
                bbox_test[2] += search_step
                bbox_test[3] += search_step
                if bbox_test[0] < 0 or bbox_test[1] < 0 or \
                        bbox_test[1] + bbox_test[3] >= height or \
                        bbox_test[0] + bbox_test[2] >= width:
                    break
                cgf = _gf_from_integral(ii, bbox_test) / \
                    (bbox_test[2] * bbox_test[3])
                if cgf < gf:
                    break
                bbox = bbox_test.copy()
            out.append({"rect": bbox, "size": bbox[2]})
    return out


def generate_patches(img: np.ndarray, base_size: int,
                     factor: float) -> List[dict]:
    """reference generatepatchs :1070-1100 (sorted big->small)."""
    gray = rgb2gray(img)
    grad = np.abs(cv2.Sobel(gray, cv2.CV_64F, 0, 1, ksize=3)) + \
        np.abs(cv2.Sobel(gray, cv2.CV_64F, 1, 0, ksize=3))
    threshold = grad[grad > 0].mean() if (grad > 0).any() else 0.0
    grad = np.where(grad < threshold, 0.0, grad)

    gf = grad.sum() / grad.size
    ii = _integral(grad)

    blsize = int(round(base_size / 2))
    stride = int(round(blsize * 0.75))
    patches = apply_grid_patch(blsize, stride, img)
    patches = adaptive_selection(ii, patches, gf, factor)
    return sorted(patches, key=lambda x: x["size"], reverse=True)


class BoostEngine:
    """Batched Boost merge around a DepthPredictor + pix2pix merge net."""

    def __init__(self, predictor, pix2pix_variables=None, seed: int = 0,
                 merge_batch: int = 4):
        from depthmap_tpu.models.pix2pix import build_pix2pix
        self.predictor = predictor
        self.model_type = predictor.model_type
        self.rf = receptive_field(self.model_type)
        self.merge_batch = merge_batch
        self.p2p = build_pix2pix()
        if pix2pix_variables is None:
            # jitted init: one compiled program instead of op-by-op dispatch
            # (minutes through the TPU tunnel for the 10-down U-Net)
            pix2pix_variables = jax.jit(self.p2p.init)(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, PIX2PIX_SIZE, PIX2PIX_SIZE)),
                jnp.zeros((1, PIX2PIX_SIZE, PIX2PIX_SIZE)))
        self.p2p_vars = pix2pix_variables
        self._merge = jax.jit(self.p2p.apply)

        cfg = predictor.bundle.preprocess
        if self.model_type in range(1, 7):
            # reference quirk kept: Boost routes ALL midas-family nets
            # (types 1-6, BEiT/DPT included) through estimatemidasBoost,
            # which normalizes with ImageNet stats + upper_bound resize
            # (depthmap_generation.py:1180-1196) — NOT the per-family
            # 0.5/0.5 stats the normal estimate path uses
            import dataclasses
            from depthmap_tpu.pipeline.preprocess import (IMAGENET_MEAN,
                                                          IMAGENET_STD)
            cfg = dataclasses.replace(cfg, mean=IMAGENET_MEAN,
                                      std=IMAGENET_STD,
                                      resize_mode="upper_bound")
        self._boost_cfg = cfg
        mean = jnp.asarray(cfg.mean, jnp.float32)
        std = jnp.asarray(cfg.std, jnp.float32)
        swap = cfg.swap_channels

        @jax.jit
        def _prep_dev(x):
            """Device-side Boost normalization of raw RGB crops (the resize
            half of the transform already happened in _crop_resize_batch;
            square crops make upper_bound == squash)."""
            if swap:
                x = x[..., ::-1]
            return (x - mean) / std

        self._prep_dev = _prep_dev
        self._mask_dev = None   # lazy device upload of the 3000^2 blend mask

    # -- device-resident chain --------------------------------------------
    def double_estimate(self, img: np.ndarray, size1: int,
                        size2: int) -> np.ndarray:
        """doubleestimate (reference :1028-1049) as a host-numpy API:
        thin wrapper over the device chain."""
        return np.asarray(self._double_estimate_dev(
            np.asarray(img, np.float32), size1, size2))
    def _upsample_to_p(self, x):
        """(c, h, w) device estimates -> (c, P, P)."""
        if x.shape[-2:] == (PIX2PIX_SIZE, PIX2PIX_SIZE):
            return x
        return _upsample_p_jit(x)

    def _forward_dev(self, raw, msize: int):
        """raw: (c, s, s, 3) device RGB crops in [0,1] -> (c, P, P) device
        estimates (the per-patch half of singleestimate :1054-1067)."""
        pred = self.predictor
        if self.model_type == 10:   # Marigold runs its own host pipeline
            outs = [pred.predict(np.asarray(raw[i]), msize, msize)
                    for i in range(raw.shape[0])]
            return self._upsample_to_p(jnp.asarray(np.stack(outs)))
        if pred.bundle.prep_in_model:
            x = raw[..., ::-1] if pred.bundle.preprocess.swap_channels \
                else raw
            out = pred._apply(x, PIX2PIX_SIZE, PIX2PIX_SIZE, (msize, msize))
        else:
            out = pred._apply(self._prep_dev(raw), PIX2PIX_SIZE,
                              PIX2PIX_SIZE)
        return self._upsample_to_p(out)

    def _single_dev(self, img: np.ndarray, msize: int):
        """Whole-image singleestimate -> (1, P, P) device (never leaves the
        chip; the host path `_single` keeps the image-res numpy API)."""
        pred = self.predictor
        if self.model_type == 10:
            d = pred.predict(img, msize, msize)
            return self._upsample_to_p(jnp.asarray(d)[None])
        if pred.bundle.prep_in_model:
            x = pred._prep(img, msize, msize, None)
        else:
            # estimatemidasBoost transform for types 1-6 (ImageNet stats +
            # upper_bound) is baked into _boost_cfg; other families keep
            # their own cfg
            from depthmap_tpu.pipeline.preprocess import preprocess_image
            x = preprocess_image(np.asarray(img, np.float32), msize, msize,
                                 self._boost_cfg)
        net_size = (msize, msize) if pred.bundle.prep_in_model else None
        out = pred._apply(jnp.asarray(x), PIX2PIX_SIZE, PIX2PIX_SIZE,
                          net_size)
        return self._upsample_to_p(out)

    @staticmethod
    def _shard_rects(rects_chunk: np.ndarray):
        """Multi-chip: shard the patch axis over the mesh "data" axis; the
        sharding propagates through the whole per-chunk device chain
        (crops -> both net forwards -> both merges -> polyfit)."""
        devices = jax.devices()
        if len(devices) > 1 and rects_chunk.shape[0] % len(devices) == 0:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from depthmap_tpu.parallel.mesh import make_mesh
            return jax.device_put(
                jnp.asarray(rects_chunk),
                NamedSharding(make_mesh(), P("data", None)))
        return jnp.asarray(rects_chunk)

    def _double_estimate_dev(self, img: np.ndarray, size1: int, size2: int):
        """doubleestimate (:1028-1049) with every intermediate on device;
        returns the normalized merged estimate at (P, P)."""
        e1 = self._single_dev(img, size1)
        e2 = self._single_dev(img, size2)
        merged = self._merge(self.p2p_vars, e1, e2)
        return _minmax_norm_batch(merged)[0]

    def estimate(self, img: np.ndarray,
                 whole_size_threshold: int = 1600) -> np.ndarray:
        """img: (H, W, 3) float RGB in [0,1] -> boosted depth at (H, W).

        Matches estimateboost (reference :774-941) with the TPU
        re-architecture: batched patch double-estimates and merges, and a
        fully device-resident chain — the only device->host transfer is the
        final (H, W) map (the scarce resource; see module docstring)."""
        rf = self.rf
        h, w = img.shape[:2]
        img = np.asarray(img, np.float32)

        whole_image_optimal_size, patch_scale = calculate_processing_res(
            img, rf, 0.2, 3, whole_size_threshold)
        # TPU-first departure from the reference: quantize R_x UP to the next
        # multiple of the receptive field (capped at the search threshold).
        # The reference's continuous R_x feeds the net size directly, which
        # on TPU would compile a fresh XLA program per image (tens of
        # seconds each); a bounded ladder of sizes keeps the jit cache hot
        # while never *reducing* the chosen processing resolution.
        whole_image_optimal_size = min(
            int(-(-whole_image_optimal_size // rf) * rf),
            int(min(whole_size_threshold, 3 * max(h, w))))
        # The former 1024 px cap for BEiT-bias models is gone: above the
        # bias-materialization budget the backbone streams the rel-pos bias
        # per q-chunk (models/attention.py attention_rel_streamed), so the
        # whole-image pass honors r_max = 1600 like the reference
        # (calculateprocessingres depthmap_generation.py:969-1024).

        whole = self._double_estimate_dev(img, rf, whole_image_optimal_size)
        updated = _to_frame_jit(whole, h, w)          # (h, w) device

        factor = max(min(1.0, 4 * patch_scale *
                         whole_image_optimal_size / whole_size_threshold),
                     0.2)

        if h > w:
            a = 2 * whole_image_optimal_size
            b = round(2 * whole_image_optimal_size * w / h)
        else:
            a = round(2 * whole_image_optimal_size * h / w)
            b = 2 * whole_image_optimal_size
        b = int(round(b / factor))
        a = int(round(a / factor))
        img_big = cv2.resize(img, (b, a), interpolation=cv2.INTER_CUBIC)

        # adaptive patch selection runs on the host (cheap cv2 gradient
        # analysis); the merge frame is pinned to the input resolution so
        # every device program in the chain is keyed on (h, w) only
        patchset = generate_patches(img_big, rf * 2, factor)
        sy, sx = h / img_big.shape[0], w / img_big.shape[1]
        rects = []
        for p in patchset:
            r = p["rect"]
            rect = (int(round(r[0] * sx)), int(round(r[1] * sy)),
                    int(round(r[2] * sx)), int(round(r[3] * sy)))
            if rect[2] > 0 and rect[3] > 0:
                rects.append(rect)
        if not rects:
            return np.asarray(updated)

        # ---- batched patch double estimation (device) ------------------
        # the reference runs 2 model passes + 1 merge PER PATCH serially
        # (:879-938); here each chunk of patches is cropped, estimated at
        # both net sizes, pix2pix-merged twice and polyfit-mapped in
        # batched device calls.  The ragged tail is padded to the full
        # merge batch (one compiled batch shape total).  Multi-chip: the
        # patch axis shards over the mesh "data" axis (the reference's
        # serial patch loop is embarrassingly parallel, SURVEY §2.4) — the
        # chunk grows to merge_batch per device and the sharded rects
        # propagate through crops, forwards and merges.
        n_dev = len(jax.devices())
        mb = self.merge_batch * max(1, n_dev)
        n = len(rects)
        n_pad = -(-n // mb) * mb
        rects_arr = np.zeros((n_pad, 4), np.int32)
        rects_arr[:n] = np.asarray(rects, np.int32)
        img_dev = jnp.asarray(img)
        merged_chunks = []
        for i in range(0, n_pad, mb):
            rc = self._shard_rects(rects_arr[i:i + mb])
            low_raw = _crop_resize_batch(img_dev, rc, rf, rf)
            high_raw = _crop_resize_batch(img_dev, rc, 2 * rf, 2 * rf)
            lows = self._forward_dev(low_raw, rf)
            highs = self._forward_dev(high_raw, 2 * rf)
            m1 = _minmax_norm_batch(
                self._merge(self.p2p_vars, lows, highs))
            base = _crop_resize_batch(updated, rc, PIX2PIX_SIZE,
                                      PIX2PIX_SIZE)
            mapped = self._merge(self.p2p_vars, base, m1)
            merged_chunks.append(_fit_to_base(mapped, base))
        merged = jnp.concatenate(merged_chunks, axis=0)

        # ---- sequential blend (order: big -> small), on device ---------
        if self._mask_dev is None:
            self._mask_dev = jnp.asarray(generate_mask((3000, 3000)))
        updated = _blend_patches(updated, merged, jnp.asarray(rects_arr),
                                 self._mask_dev)
        return np.asarray(updated)
