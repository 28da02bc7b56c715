import numpy as np
import jax
import jax.numpy as jnp
import pytest

from depthmap_tpu.pipeline import boost as B


def test_generate_mask_properties():
    m = B.generate_mask((300, 300))
    assert m.shape == (300, 300)
    assert m.min() == 0.0 and m.max() == 1.0
    assert m[150, 150] > 0.99       # center fully on
    assert m[0, 0] < 0.01           # corners off


def test_integral_matches_cv2():
    import cv2
    rng = np.random.default_rng(0)
    x = rng.random((17, 23))
    np.testing.assert_allclose(B._integral(x), cv2.integral(x), atol=1e-9)


def test_block_reduce_max():
    x = np.arange(16, dtype=float).reshape(4, 4)
    out = B._block_reduce_max(x, 2)
    np.testing.assert_array_equal(out, [[5, 7], [13, 15]])


def test_calculate_processing_res(rng):
    img = rng.random((256, 320, 3)).astype(np.float32)
    size, patch_scale = B.calculate_processing_res(img, 384, 0.2, 3, 1600)
    assert size >= 384 - 32
    assert 0.0 <= patch_scale <= 1.0


def test_generate_patches_sorted(rng):
    # structured image so gradients are non-trivial
    yy, xx = np.mgrid[0:512, 0:640]
    img = np.stack([np.sin(xx / 9), np.cos(yy / 7), np.sin((xx + yy) / 11)],
                   axis=-1).astype(np.float32) * 0.5 + 0.5
    patches = B.generate_patches(img, 768, 1.0)
    sizes = [p["size"] for p in patches]
    assert sizes == sorted(sizes, reverse=True)
    for p in patches:
        r = p["rect"]
        assert r[2] == r[3]  # square


def test_pix2pix_generator_shapes(rng):
    from depthmap_tpu.models.pix2pix import UnetGenerator
    g = UnetGenerator(num_downs=6, ngf=8)   # tiny for test: 64 = 2**6
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 2)), dtype=jnp.float32)
    v = g.init(jax.random.PRNGKey(0), x)
    out = g.apply(v, x)
    assert out.shape == (1, 64, 64, 1)
    assert (np.abs(np.asarray(out)) <= 1.0).all()   # tanh


@pytest.mark.slow
def test_boost_estimate_end_to_end(rng):
    """Full Boost flow with the small midas model on a small image."""
    from depthmap_tpu.pipeline.depth import DepthPredictor
    pred = DepthPredictor(6)
    eng = B.BoostEngine(pred)
    eng.rf = 64           # shrink receptive field for test speed
    img = rng.random((96, 128, 3)).astype(np.float32)
    out = eng.estimate(img, whole_size_threshold=256)
    assert out.shape == (96, 128)
    assert np.isfinite(out).all()
    assert out.min() >= -0.5 and out.max() <= 1.5


@pytest.mark.slow
def test_boost_estimate_depth_anything_v2(rng):
    """Device-chain Boost over a DA2 (DINOv2, mult-of-14) family model:
    crops at rf/2rf must hit legal patch grids and the ladder stays
    14-aligned."""
    from depthmap_tpu.pipeline.depth import DepthPredictor
    pred = DepthPredictor(12)       # depth_anything_v2_small
    eng = B.BoostEngine(pred)
    eng.rf = 112       # shrink (multiple of 14, >= 64 for the R_x search)
    img = rng.random((84, 112, 3)).astype(np.float32)
    out = eng.estimate(img, whole_size_threshold=224)
    assert out.shape == (84, 112)
    assert np.isfinite(out).all()
