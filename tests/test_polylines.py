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


@pytest.mark.parametrize("sharp", [True, False])
def test_polylines_native_fuzz(rng, sharp):
    """Broad fuzz of the production C++ rasterizer against the reference
    oracle: random images/depths, divergences (incl. negative and large),
    separation and exponent variations — bit-equal everywhere."""
    if P._get_lib() is None:
        pytest.skip("native lib unavailable")
    fill = "polylines_sharp" if sharp else "polylines_soft"
    for trial in range(30):
        h = int(rng.integers(4, 20))
        w = int(rng.integers(16, 64))
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        nd = rng.random((h, w))
        div_px = float(rng.uniform(-10, 10))
        sep_px = float(rng.choice([0.0, rng.uniform(-3, 3)]))
        expo = float(rng.choice([1.0, 2.0, 0.5]))
        got = P._polylines_native(img, nd, div_px, sep_px, expo, sharp)
        want = oracles.stereo_polylines(img, nd, div_px, sep_px, expo, fill)
        np.testing.assert_array_equal(
            got, want, err_msg=f"trial={trial} h={h} w={w} div={div_px} "
                               f"sep={sep_px} exp={expo}")
