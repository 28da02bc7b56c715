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

    # -- model single estimates -------------------------------------------
    def _single(self, img: np.ndarray, msize: int) -> np.ndarray:
        """singleestimate (reference :1054-1067): per-family transform at a
        square msize net size."""
        mode = "upper_bound" if self.model_type in range(1, 7) else None
        pred = self.predictor.predict(img, msize, msize, resize_mode=mode)
        return pred

    def _single_batch(self, imgs: np.ndarray, msize: int) -> np.ndarray:
        mode = "upper_bound" if self.model_type in range(1, 7) else None
        return self.predictor.predict_batch(imgs, msize, msize,
                                            resize_mode=mode)

    def _merge_pairs(self, lows: np.ndarray, highs: np.ndarray) -> np.ndarray:
        """Batched pix2pix merge at 1024^2, chunked to bound memory."""
        outs = []
        for i in range(0, lows.shape[0], self.merge_batch):
            outs.append(np.asarray(self._merge(
                self.p2p_vars, jnp.asarray(lows[i:i + self.merge_batch]),
                jnp.asarray(highs[i:i + self.merge_batch]))))
        return np.concatenate(outs, axis=0)

    def double_estimate(self, img: np.ndarray, size1: int,
                        size2: int) -> np.ndarray:
        e1 = cv2.resize(self._single(img, size1),
                        (PIX2PIX_SIZE, PIX2PIX_SIZE),
                        interpolation=cv2.INTER_CUBIC)
        e2 = cv2.resize(self._single(img, size2),
                        (PIX2PIX_SIZE, PIX2PIX_SIZE),
                        interpolation=cv2.INTER_CUBIC)
        merged = self._merge_pairs(e1[None], e2[None])[0]
        lo, hi = merged.min(), merged.max()
        return (merged - lo) / (hi - lo) if hi > lo else merged * 0.0

    def estimate(self, img: np.ndarray,
                 whole_size_threshold: int = 1600) -> np.ndarray:
        """img: (H, W, 3) float RGB in [0,1] -> boosted depth at (H, W).

        Matches estimateboost (reference :774-941) with batched patches."""
        rf = self.rf
        patch_netsize = 2 * rf
        input_resolution = img.shape

        whole_image_optimal_size, patch_scale = calculate_processing_res(
            img, rf, 0.2, 3, whole_size_threshold)
        whole_estimate = self.double_estimate(img, rf,
                                              whole_image_optimal_size)

        factor = max(min(1.0, 4 * patch_scale *
                         whole_image_optimal_size / whole_size_threshold), 0.2)

        if img.shape[0] > img.shape[1]:
            a = 2 * whole_image_optimal_size
            b = round(2 * whole_image_optimal_size *
                      img.shape[1] / img.shape[0])
        else:
            a = round(2 * whole_image_optimal_size *
                      img.shape[0] / img.shape[1])
            b = 2 * whole_image_optimal_size
        b = int(round(b / factor))
        a = int(round(a / factor))
        img_big = cv2.resize(img, (b, a), interpolation=cv2.INTER_CUBIC)

        base_size = rf * 2
        patchset = generate_patches(img_big, base_size, factor)

        mergein_scale = input_resolution[0] / img_big.shape[0]
        img_scaled = cv2.resize(
            img_big, (round(img_big.shape[1] * mergein_scale),
                      round(img_big.shape[0] * mergein_scale)),
            interpolation=cv2.INTER_CUBIC)
        whole_estimate_resized = cv2.resize(
            whole_estimate, (img_scaled.shape[1], img_scaled.shape[0]),
            interpolation=cv2.INTER_CUBIC)
        updated = whole_estimate_resized.copy()

        # scale patch rects into the merge frame
        rects = []
        for p in patchset:
            rect = np.round(np.array(p["rect"]) * mergein_scale).astype(int)
            if rect[2] > 0 and rect[3] > 0:
                rects.append(rect)
        if not rects:
            return cv2.resize(updated,
                              (input_resolution[1], input_resolution[0]),
                              interpolation=cv2.INTER_CUBIC)

        # ---- batched patch double estimation --------------------------
        # the reference runs 2 model passes + 1 merge PER PATCH serially
        # (:879-938); all patches here go through two stacked device
        # forwards (low-res + high-res net sizes) upsampled on-device
        # straight to the 1024^2 merge resolution, then one batched merge
        patch_rgbs = [img_scaled[r[1]:r[1] + r[3], r[0]:r[0] + r[2]]
                      for r in rects]
        mode = "upper_bound" if self.model_type in range(1, 7) else None
        lows = self.predictor.predict_batch_list(
            patch_rgbs, rf, rf, (PIX2PIX_SIZE, PIX2PIX_SIZE), mode)
        highs = self.predictor.predict_batch_list(
            patch_rgbs, patch_netsize, patch_netsize,
            (PIX2PIX_SIZE, PIX2PIX_SIZE), mode)
        merged_patches = self._merge_pairs(lows, highs)
        # doubleestimate for patches keeps min-max normalize semantics
        lo = merged_patches.min(axis=(1, 2), keepdims=True)
        hi = merged_patches.max(axis=(1, 2), keepdims=True)
        merged_patches = np.where(hi > lo, (merged_patches - lo) /
                                  np.where(hi > lo, hi - lo, 1), 0.0)

        # base patches + second merge (patch vs base region)
        base_patches = np.stack([
            cv2.resize(updated[r[1]:r[1] + r[3], r[0]:r[0] + r[2]],
                       (PIX2PIX_SIZE, PIX2PIX_SIZE),
                       interpolation=cv2.INTER_CUBIC) for r in rects])
        mapped = self._merge_pairs(base_patches, merged_patches)

        # ---- sequential blend (order: big -> small) --------------------
        mask_org = generate_mask((3000, 3000))
        for i, r in enumerate(rects):
            org_h, org_w = r[3], r[2]
            m = mapped[i]
            base = base_patches[i]
            # deg-1 polyfit of mapped -> base (reference :915)
            p_coef = np.polyfit(m.reshape(-1), base.reshape(-1), deg=1)
            merged = np.polyval(p_coef, m.reshape(-1)).reshape(m.shape)
            merged = cv2.resize(merged, (org_w, org_h),
                                interpolation=cv2.INTER_CUBIC)
            mask = cv2.resize(mask_org, (org_w, org_h),
                              interpolation=cv2.INTER_LINEAR)
            w1, h1 = r[0], r[1]
            w2, h2 = w1 + org_w, h1 + org_h
            updated[h1:h2, w1:w2] = updated[h1:h2, w1:w2] * (1 - mask) + \
                merged * mask

        return cv2.resize(updated, (input_resolution[1], input_resolution[0]),
                          interpolation=cv2.INTER_CUBIC)
