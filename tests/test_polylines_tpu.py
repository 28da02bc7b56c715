"""XLA polylines rasterizer (experimental, ops/polylines_tpu.py) vs the
numpy oracle: bit-exact for sharp; <= 1/255 on isolated pixels for soft
(float32 vs the reference's float64 accumulation)."""
from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from depthmap_tpu.ops.polylines_tpu import polylines_rasterize
from depthmap_tpu.ops.stereo import normalize_depth
from tests.oracles import stereo_polylines


@pytest.mark.parametrize("fill", ["polylines_sharp", "polylines_soft"])
@pytest.mark.parametrize("div", [1.6, -2.4])
def test_polylines_xla_matches_oracle(fill, div):
    rng = np.random.default_rng(0)
    h, w = 40, 64
    img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    depth = rng.random((h, w)).astype(np.float64)
    nd = np.asarray(normalize_depth(jnp.asarray(depth)))
    ref = stereo_polylines(img, nd, div, 0.0, 2.0, fill)
    got = np.asarray(polylines_rasterize(
        img, nd, float(div), 0.0, 2.0, fill == "polylines_sharp"))
    diff = np.abs(ref.astype(int) - got.astype(int))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.999


def test_polylines_xla_separation_and_row_chunking():
    rng = np.random.default_rng(1)
    h, w = 36, 48
    img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    nd = rng.random((h, w)).astype(np.float32)
    full = np.asarray(polylines_rasterize(img, nd, 2.0, 1.5, 1.0, True))
    chunked = np.asarray(polylines_rasterize(img, nd, 2.0, 1.5, 1.0, True,
                                             row_chunk=10))
    np.testing.assert_array_equal(full, chunked)
    ref = stereo_polylines(img, nd.astype(np.float64), 2.0, 1.5, 1.0,
                           "polylines_sharp")
    diff = np.abs(ref.astype(int) - full.astype(int))
    assert diff.max() <= 1 and (diff == 0).mean() > 0.999
