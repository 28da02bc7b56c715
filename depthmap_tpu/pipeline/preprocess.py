"""Host-side input preprocessing.

Reproduces the MiDaS ``Resize`` transform semantics exactly
(dmidas/transforms.py:48-196: keep-aspect-ratio with lower_bound /
upper_bound / minimal methods, constrain-to-multiple-of with round/floor/ceil
fallbacks, cv2 INTER_CUBIC) and the per-family normalizations
(src/depthmap_generation.py:119-195).  This runs on the host CPU — the same
placement as the reference — and hands a ready NHWC float32 tensor to the
TPU.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import cv2
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
HALF_MEAN = (0.5, 0.5, 0.5)
HALF_STD = (0.5, 0.5, 0.5)


def constrain_to_multiple_of(x: float, multiple_of: int, min_val: int = 0,
                             max_val: Optional[int] = None) -> int:
    y = int(np.round(x / multiple_of) * multiple_of)
    if max_val is not None and y > max_val:
        y = int(np.floor(x / multiple_of) * multiple_of)
    if y < min_val:
        y = int(np.ceil(x / multiple_of) * multiple_of)
    return y


def resize_get_size(in_width: int, in_height: int, width: int, height: int,
                    resize_method: str = "lower_bound",
                    keep_aspect_ratio: bool = True,
                    ensure_multiple_of: int = 1) -> Tuple[int, int]:
    """(new_width, new_height) per the MiDaS Resize.get_size rules."""
    scale_height = height / in_height
    scale_width = width / in_width

    if keep_aspect_ratio:
        if resize_method == "lower_bound":
            if scale_width > scale_height:
                scale_height = scale_width
            else:
                scale_width = scale_height
        elif resize_method == "upper_bound":
            if scale_width < scale_height:
                scale_height = scale_width
            else:
                scale_width = scale_height
        elif resize_method == "minimal":
            if abs(1 - scale_width) < abs(1 - scale_height):
                scale_height = scale_width
            else:
                scale_width = scale_height
        else:
            raise ValueError(f"resize_method {resize_method} not implemented")

    m = ensure_multiple_of
    if resize_method == "lower_bound":
        new_height = constrain_to_multiple_of(scale_height * in_height, m,
                                              min_val=height)
        new_width = constrain_to_multiple_of(scale_width * in_width, m,
                                             min_val=width)
    elif resize_method == "upper_bound":
        new_height = constrain_to_multiple_of(scale_height * in_height, m,
                                              max_val=height)
        new_width = constrain_to_multiple_of(scale_width * in_width, m,
                                             max_val=width)
    elif resize_method == "minimal":
        new_height = constrain_to_multiple_of(scale_height * in_height, m)
        new_width = constrain_to_multiple_of(scale_width * in_width, m)
    else:
        raise ValueError(f"resize_method {resize_method} not implemented")
    return new_width, new_height


@dataclass(frozen=True)
class PreprocessCfg:
    resize_mode: str = "upper_bound"  # lower_bound|upper_bound|minimal|squash
    mean: Tuple[float, float, float] = IMAGENET_MEAN
    std: Tuple[float, float, float] = IMAGENET_STD
    multiple_of: int = 32
    keep_aspect_ratio: bool = True
    interpolation: int = cv2.INTER_CUBIC
    # The reference converts PIL RGB with cv2.COLOR_BGR2RGB
    # (depthmap_generation.py:381), handing *channel-swapped* images to the
    # MiDaS/ZoeDepth/DepthAnything-v1 paths (LeReS/DA2/Marigold swap back).
    # Replicated for output parity.
    swap_channels: bool = False


def preprocess_image(img01: np.ndarray, net_w: int, net_h: int,
                     cfg: PreprocessCfg,
                     resize_mode: Optional[str] = None) -> np.ndarray:
    """img01: (H, W, 3) float RGB in [0, 1] -> (1, h', w', 3) float32 NHWC."""
    mode = resize_mode or cfg.resize_mode
    img01 = img01.astype(np.float32)
    if cfg.swap_channels:
        img01 = img01[:, :, ::-1]
    if mode == "squash":
        new_w, new_h = net_w, net_h
    else:
        new_w, new_h = resize_get_size(img01.shape[1], img01.shape[0],
                                       net_w, net_h, mode,
                                       cfg.keep_aspect_ratio, cfg.multiple_of)
    resized = cv2.resize(img01, (new_w, new_h),
                         interpolation=cfg.interpolation)
    out = (resized - np.asarray(cfg.mean, np.float32)) / \
        np.asarray(cfg.std, np.float32)
    return out[None].astype(np.float32)
