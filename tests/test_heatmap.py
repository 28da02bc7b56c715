"""Heatmap colorization parity: the mpl-free fallback must emit the exact
bytes the matplotlib path emits (reference colorize, dzoedepth/utils/misc.py:
97-152, cmap='inferno')."""
import numpy as np
import pytest

from depthmap_tpu.ops import heatmap as H


@pytest.mark.skipif(not H._HAVE_MPL, reason="needs matplotlib as the oracle")
def test_heatmap_fallback_matches_mpl(rng, monkeypatch):
    depth = (rng.random((64, 80)) * 65535).astype(np.uint16)
    depth[0, :4] = 0
    depth[1, :4] = 65535

    with_mpl = H.colorize(depth)
    monkeypatch.setattr(H, "_HAVE_MPL", False)
    without_mpl = H.colorize(depth)
    assert with_mpl.dtype == without_mpl.dtype == np.uint8
    np.testing.assert_array_equal(with_mpl, without_mpl)


@pytest.mark.skipif(not H._HAVE_MPL, reason="needs matplotlib as the oracle")
def test_heatmap_fallback_invalid_and_edges(monkeypatch):
    """Invalid pixels (-99), exact 0/1 normalized values, and out-of-range
    values all take the same path in both implementations."""
    v = np.linspace(-0.2, 1.2, 50 * 40).reshape(50, 40).astype(np.float32)
    v[0, 0] = -99.0
    with_mpl = H.colorize(v, vmin=0.0, vmax=1.0)
    monkeypatch.setattr(H, "_HAVE_MPL", False)
    without_mpl = H.colorize(v, vmin=0.0, vmax=1.0)
    np.testing.assert_array_equal(with_mpl, without_mpl)
    assert tuple(with_mpl[0, 0]) == (128, 128, 128, 255)


def test_fallback_inf_semantics_match_mpl(rng):
    """+inf -> over (last LUT color), -inf -> under (first), NaN -> bad —
    matplotlib Colormap semantics, pinned for the mpl-free fallback."""
    import matplotlib
    from depthmap_tpu.ops import heatmap as hm
    v = rng.random((8, 8)).astype(np.float64)
    v[0, 0], v[0, 1], v[0, 2] = np.inf, -np.inf, np.nan
    with_mpl = hm.colorize(v.copy(), vmin=0.0, vmax=1.0)
    had = hm._HAVE_MPL
    try:
        hm._HAVE_MPL = False
        hm._cmap_table.cache_clear()
        without = hm.colorize(v.copy(), vmin=0.0, vmax=1.0)
    finally:
        hm._HAVE_MPL = had
    np.testing.assert_array_equal(with_mpl, without)
