import numpy as np
import jax.numpy as jnp
import pytest

from depthmap_tpu.ops import filters
from depthmap_tpu.ops.normalmap import create_normalmap
from tests import oracles

cv2 = pytest.importorskip("cv2")


def test_gaussian_kernel_matches_cv2():
    for k in (3, 5, 7, 11):
        ours = np.array(filters.gaussian_kernel1d(k, float(k)))
        ref = cv2.getGaussianKernel(k, float(k)).ravel()
        np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_deriv_kernels_match_cv2():
    for k in (1, 3, 5, 7):
        kx_ref, ky_ref = cv2.getDerivKernels(1, 0, k)
        np.testing.assert_allclose(np.array(filters.deriv_kernel1d(1, k)),
                                   kx_ref.ravel(), atol=1e-12)
        np.testing.assert_allclose(np.array(filters.deriv_kernel1d(0, k)),
                                   ky_ref.ravel(), atol=1e-12)


def test_gaussian_blur_matches_cv2(rng):
    x = rng.random((24, 31)).astype(np.float32) * 255
    got = np.asarray(filters.gaussian_blur(jnp.asarray(x), 5))
    want = cv2.GaussianBlur(x.astype(np.float64), (5, 5), 5)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_sobel_matches_cv2(rng):
    x = rng.random((20, 27)).astype(np.float32) * 100
    for (dx, dy, k) in [(1, 0, 3), (0, 1, 3), (1, 0, 5)]:
        got = np.asarray(filters.sobel(jnp.asarray(x), dx, dy, ksize=k))
        want = cv2.Sobel(x.astype(np.float64), cv2.CV_64F, dx, dy, ksize=k)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_np_gradient(rng):
    x = rng.random((9, 13)).astype(np.float32)
    gy, gx = filters.np_gradient_2d(jnp.asarray(x))
    ny, nx_ = np.gradient(x)
    np.testing.assert_allclose(np.asarray(gy), ny, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gx), nx_, atol=1e-6)


@pytest.mark.parametrize("pre_blur,sobel_k,post_blur,invert", [
    (None, 3, None, False),
    (None, 3, None, True),
    (3, 3, None, False),
    (None, 5, 3, False),
    (None, None, None, False),   # np.gradient path
])
def test_create_normalmap_matches_reference(rng, pre_blur, sobel_k, post_blur,
                                            invert):
    depth = (rng.random((32, 40)) * 65535).astype(np.uint16)
    got = np.asarray(create_normalmap(jnp.asarray(depth), pre_blur, sobel_k,
                                      post_blur, invert))
    want = oracles.normalmap(depth, pre_blur, sobel_k, post_blur, invert)
    assert got.shape == want.shape == (32, 40, 3)
    # f32 (TPU) vs f64 (reference) rounding may differ by 1 ULP of uint8
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.02


def test_even_blur_kernel_rejected(rng):
    """cv2.GaussianBlur asserts on even ksize (the reference would crash);
    we must raise too rather than silently shrink the image by a pixel."""
    depth = (rng.random((16, 20)) * 65535).astype(np.uint16)
    with pytest.raises(ValueError, match="odd"):
        create_normalmap(jnp.asarray(depth), pre_blur=2)
    # odd kernels keep the shape
    out = np.asarray(create_normalmap(jnp.asarray(depth), pre_blur=3,
                                      post_blur=1))
    assert out.shape == (16, 20, 3)
