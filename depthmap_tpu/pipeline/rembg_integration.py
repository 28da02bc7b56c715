"""Background removal integration (reference src/core.py:675-692 +
mask application :219-236).

`rembg` (U2Net/IS-Net with externally downloaded weights) is an optional
dependency; generation options GEN_REMBG / PRE_DEPTH_BACKGROUND_REMOVAL /
SAVE_BACKGROUND_REMOVAL_MASKS / REMBG_MODEL match the reference.
"""
from __future__ import annotations

from typing import List

import numpy as np
from PIL import Image

REMBG_MODELS = ("u2net", "u2netp", "u2net_human_seg", "silueta",
                "isnet-general-use", "isnet-anime")


def rembg_available() -> bool:
    try:
        import rembg  # noqa: F401
        return True
    except Exception:
        return False


def batched_background_removal(inimages: List[Image.Image],
                               model_name: str) -> List[Image.Image]:
    """Parity with reference batched_background_removal (core.py:675-692)."""
    from rembg import new_session, remove
    session = new_session(model_name)
    outimages = []
    for im in inimages:
        outimages.append(Image.fromarray(np.array(remove(im,
                                                         session=session))))
    del session
    return outimages


def background_mask(background_removed_image: Image.Image) -> np.ndarray:
    """Pixels that are pure black with alpha <= 0.2 (reference core.py:224-227)."""
    arr = np.array(background_removed_image)
    return ((arr[:, :, 0] == 0) & (arr[:, :, 1] == 0)
            & (arr[:, :, 2] == 0) & (arr[:, :, 3] <= 0.2))


def foreground_mask_image(bg_mask: np.ndarray) -> Image.Image:
    """SAVE_BACKGROUND_REMOVAL_MASKS output (reference core.py:231-236)."""
    # wider dtype: numpy 2 (NEP 50) raises OverflowError on int8 * 255
    bg_array = (1 - bg_mask.astype("int16")) * 255
    mask_array = np.stack([bg_array] * 4, axis=2)
    return Image.fromarray(mask_array.astype(np.uint8))
