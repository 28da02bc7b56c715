"""Depth heatmap colorization.

Parity with the reference `colorize` (dzoedepth/utils/misc.py:97-152) as used
by the funnel (src/core.py:271-274: cmap='inferno', defaults otherwise):
percentile 2/85 normalization, matplotlib colormap lookup with `bytes=True`,
invalid pixels (== -99) painted (128,128,128,255).
"""
from __future__ import annotations

import functools

import numpy as np

try:
    import matplotlib
    import matplotlib.cm
    _HAVE_MPL = True
except Exception:  # pragma: no cover
    _HAVE_MPL = False


@functools.lru_cache(maxsize=None)
def _cmap_table(cmap: str) -> np.ndarray:
    """(256, 4) uint8 fallback table — grayscale regardless of `cmap` (only
    used when matplotlib is absent; the mpl path calls colormaps[] directly)."""
    g = np.arange(256, dtype=np.uint8)
    return np.stack([g, g, g, np.full(256, 255, np.uint8)], axis=1)


def colorize(value: np.ndarray, vmin=None, vmax=None, cmap="inferno",
             invalid_val=-99, invalid_mask=None,
             background_color=(128, 128, 128, 255)) -> np.ndarray:
    """value: (H, W) array -> (H, W, 4) uint8 heatmap."""
    value = np.asarray(value, dtype=np.float64).squeeze()
    if invalid_mask is None:
        invalid_mask = value == invalid_val
    mask = np.logical_not(invalid_mask)

    vmin = np.percentile(value[mask], 2) if vmin is None else vmin
    vmax = np.percentile(value[mask], 85) if vmax is None else vmax
    if vmin != vmax:
        value = (value - vmin) / (vmax - vmin)
    else:
        value = value * 0.0

    value[invalid_mask] = np.nan
    if _HAVE_MPL:
        img = matplotlib.colormaps[cmap](value, bytes=True)
    else:  # pragma: no cover
        tab = _cmap_table(cmap)
        idx = np.clip(np.nan_to_num(value) * 255, 0, 255).astype(np.int32)
        img = tab[idx]
    img[invalid_mask] = background_color
    return img
