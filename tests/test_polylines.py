import numpy as np
import pytest

from depthmap_tpu.ops import polylines as P
from tests import oracles


def _mk(rng, h=16, w=24):
    img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    depth = rng.random((h, w))
    nd = (depth - depth.min()) / (depth.max() - depth.min())
    return img, nd


@pytest.mark.parametrize("sharp", [True, False])
@pytest.mark.parametrize("div", [2.5, -4.0, 8.0])
def test_polylines_numpy_matches_oracle(rng, sharp, div):
    img, nd = _mk(rng)
    div_px = div / 100.0 * img.shape[1]
    fill = "polylines_sharp" if sharp else "polylines_soft"
    got = P._polylines_numpy(img, nd, div_px, 0.0, 1.0, sharp)
    want = oracles.stereo_polylines(img, nd, div_px, 0.0, 1.0, fill)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("sharp", [True, False])
@pytest.mark.parametrize("div", [2.5, -4.0, 8.0])
def test_polylines_native_matches_oracle(rng, sharp, div):
    if P._get_lib() is None:
        pytest.skip("native lib unavailable")
    img, nd = _mk(rng, h=24, w=40)
    div_px = div / 100.0 * img.shape[1]
    fill = "polylines_sharp" if sharp else "polylines_soft"
    got = P._polylines_native(img, nd, div_px, 0.0, 1.0, sharp)
    want = oracles.stereo_polylines(img, nd, div_px, 0.0, 1.0, fill)
    np.testing.assert_array_equal(got, want)


def test_polylines_through_create_stereoimages(rng):
    from depthmap_tpu.ops.stereo import create_stereoimages
    img, nd = _mk(rng)
    depth = (nd * 65535).astype(np.uint16)
    res = create_stereoimages(img, depth, 2.5, modes=["left-right"],
                              fill_technique="polylines_sharp")
    assert res[0].shape == (16, 48, 3)
