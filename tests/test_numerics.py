import numpy as np
import jax.numpy as jnp

from depthmap_tpu.ops import numerics
from tests import oracles


def test_convert_to_i16_matches_oracle(rng):
    arr = rng.random((37, 53)).astype(np.float32)
    # include exact boundaries
    arr[0, 0] = 0.0
    arr[0, 1] = 1.0
    arr[0, 2] = 0.9999999
    got = np.asarray(numerics.convert_to_i16(jnp.asarray(arr)))
    want = oracles.convert_to_i16(arr.astype(np.float64))
    assert got.dtype == np.uint16
    np.testing.assert_array_equal(got, want)


def test_convert_to_i16_rounds_down():
    arr = np.array([[0.5, 0.25]], dtype=np.float32)
    got = np.asarray(numerics.convert_to_i16(jnp.asarray(arr)))
    assert got[0, 0] == 32768 and got[0, 1] == 16384


def test_convert_i16_to_rgb():
    img = np.array([[0, 256, 65535]], dtype=np.uint16)
    got = np.asarray(numerics.convert_i16_to_rgb(jnp.asarray(img)))
    assert got.shape == (1, 3, 3)
    np.testing.assert_array_equal(got[0, :, 0], [0, 1, 255])
    assert (got[..., 0] == got[..., 1]).all() and (got[..., 0] == got[..., 2]).all()


def test_normalize01(rng):
    x = rng.normal(size=(16, 16)).astype(np.float32)
    got = np.asarray(numerics.normalize01(jnp.asarray(x)))
    want = (x - x.min()) / (x.max() - x.min())
    np.testing.assert_allclose(got, want, atol=1e-6)
    # degenerate constant map -> zeros
    const = np.full((4, 4), 3.25, np.float32)
    assert (np.asarray(numerics.normalize01(jnp.asarray(const))) == 0).all()


def test_clip_depth_range(rng):
    x = rng.normal(size=(32, 32)).astype(np.float32)
    got = np.asarray(numerics.clip_depth(jnp.asarray(x), "Range", 0.2, 0.8))
    w = (x - x.min()) / (x.max() - x.min())
    w = np.clip(w, 0.2, 0.8)
    w = (w - w.min()) / (w.max() - w.min())
    np.testing.assert_allclose(got, w, atol=1e-6)


def test_clip_depth_outliers(rng):
    x = rng.normal(size=(32, 32)).astype(np.float32)
    got = np.asarray(numerics.clip_depth(jnp.asarray(x), "Outliers", 0.05, 0.95))
    fb, nb = np.percentile(x, [5.0, 95.0])
    w = np.clip(x, fb, nb)
    w = (w - w.min()) / (w.max() - w.min())
    np.testing.assert_allclose(got, w, atol=1e-5)


def test_finalize_depth_invert(rng):
    x = (rng.random((8, 8)) * 10).astype(np.float32)
    got = np.asarray(numerics.finalize_depth(jnp.asarray(x), invert=True))
    w = -x
    w = (w - w.min()) / (w.max() - w.min())
    np.testing.assert_allclose(got, w, atol=1e-6)


def test_finalize_depth_broken_map():
    x = np.full((8, 8), 5.0, np.float32)
    got = np.asarray(numerics.finalize_depth(jnp.asarray(x)))
    assert (got == 0).all()


def test_invert_i16():
    x = np.array([[0, 1, 65535]], dtype=np.uint16)
    got = np.asarray(numerics.invert_i16(jnp.asarray(x)))
    np.testing.assert_array_equal(got, [[65535, 65534, 0]])


def test_convert_to_i16_np_twin_bit_equal(rng):
    """The host twin must match the device op bit-for-bit — the funnel uses
    it for host-resident maps (custom depthmaps, video pass 2)."""
    import jax.numpy as jnp
    from depthmap_tpu.ops import numerics
    arr = rng.random((64, 80)).astype(np.float32)
    edge = np.array([[0.0, 1.0, 0.5, 1.0 - 2**-17, 2**-17,
                      0.999984741, 65534.5 / 65536.0, 1e-8]], np.float32)
    for a in (arr, edge):
        dev = np.asarray(numerics.convert_to_i16(jnp.asarray(a)))
        host = numerics.convert_to_i16_np(a)
        np.testing.assert_array_equal(dev, host)
        assert host.flags.writeable
