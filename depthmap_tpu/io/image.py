"""Image I/O: 16-bit PNG depth maps, RGB I/O, output sequencing.

Reproduces the reference's saving behavior (src/backbone.py:85-148 standalone
branch): PNG-16 for uint16 depth, sequence-numbered output filenames.
"""
from __future__ import annotations

import os
import re
from typing import Optional

import numpy as np
from PIL import Image


def to_pil(arr) -> Image.Image:
    arr = np.asarray(arr)
    if arr.dtype == np.uint16:
        return Image.fromarray(arr, mode="I;16")
    return Image.fromarray(arr)


def save_image16(arr: np.ndarray, path: str) -> None:
    """Write a (H, W) uint16 array as a 16-bit grayscale PNG."""
    arr = np.asarray(arr)
    assert arr.dtype == np.uint16 and arr.ndim == 2
    Image.fromarray(arr, mode="I;16").save(path)


def load_image16(path: str) -> np.ndarray:
    img = Image.open(path)
    return np.asarray(img, dtype=np.uint16)


def load_rgb(path: str) -> np.ndarray:
    """Load an image as (H, W, 3) uint8 RGB (mode-'I' inputs are rescaled as
    in the funnel, src/core.py:135-137)."""
    img = Image.open(path)
    if img.mode == "I":
        img = img.point(lambda p: p * 0.0039063096)
    img = img.convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def get_next_sequence_number(outpath: str, basename: Optional[str] = None) -> int:
    """Smallest unused sequence number in outpath (parity with the WebUI
    convention used by src/core.py:352-362 filenames `basename-NNNN[-suffix]`)."""
    result = -1
    if not os.path.isdir(outpath):
        return 0
    pat = re.compile(r"^(?:" + re.escape(basename) + r"-)?(\d+)" if basename
                     else r"^(\d+)")
    for fn in os.listdir(outpath):
        stem = os.path.splitext(fn)[0]
        m = pat.match(stem)
        if m:
            try:
                result = max(result, int(m.group(1)))
            except ValueError:
                pass
    return result + 1


def get_unique_filename(outpath: str, basename: str, ext: str,
                        suffix: str = "") -> str:
    """Parity with src/core.py:352-362 get_uniquefn."""
    basecount = get_next_sequence_number(outpath, basename)
    if basecount > 0:
        basecount -= 1
    if suffix != "":
        suffix = f"-{suffix}"
    for i in range(500):
        fullfn = os.path.join(outpath, f"{basename}-{basecount + i:04}{suffix}.{ext}")
        if not os.path.exists(fullfn):
            return fullfn
    return os.path.join(outpath, f"{basename}-99999{suffix}.{ext}")
