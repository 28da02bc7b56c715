import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from depthmap_tpu.ops.resize import interpolate  # noqa: E402


def _torch_resize(x_hwc, size, mode, align_corners):
    t = torch.from_numpy(np.moveaxis(x_hwc, -1, 0)[None])  # NCHW
    ac = align_corners if mode != "nearest" else None
    y = F.interpolate(t, size=size, mode=mode, align_corners=ac)
    return np.moveaxis(y.numpy()[0], 0, -1)


@pytest.mark.parametrize("mode,ac", [
    ("bilinear", False), ("bilinear", True),
    ("bicubic", False), ("bicubic", True),
    ("nearest", False),
])
@pytest.mark.parametrize("shape", [((17, 23), (40, 56)), ((32, 32), (9, 13)),
                                   ((8, 8), (8, 8))])
def test_interpolate_matches_torch(rng, mode, ac, shape):
    (h, w), (oh, ow) = shape
    x = rng.normal(size=(h, w, 3)).astype(np.float32)
    got = np.asarray(interpolate(jnp.asarray(x), (oh, ow), mode, ac))
    want = _torch_resize(x, (oh, ow), mode, ac)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_interpolate_2d(rng):
    x = rng.normal(size=(16, 16)).astype(np.float32)
    got = np.asarray(interpolate(jnp.asarray(x), (32, 32), "bicubic", False))
    want = _torch_resize(x[..., None], (32, 32), "bicubic", False)[..., 0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mode,ac", [
    ("bilinear", False), ("bilinear", True),
    ("bicubic", False), ("bicubic", True),
])
@pytest.mark.parametrize("shape", [((17, 23), (40, 56)), ((32, 32), (9, 13)),
                                   ((16, 16), (32, 32))])
def test_matmul_resize_matches_gather(rng, monkeypatch, mode, ac, shape):
    """The TPU production path (dense tap-matrix einsum) must match the
    gather formulation (and hence torch) on every mode/size combination."""
    import depthmap_tpu.ops.resize as rz
    (h, w), (oh, ow) = shape
    x = rng.normal(size=(2, h, w, 3)).astype(np.float32)
    ref = np.asarray(interpolate(jnp.asarray(x), (oh, ow), mode, ac))
    monkeypatch.setattr(rz, "_use_matmul_resize", lambda: True)
    got = np.asarray(interpolate(jnp.asarray(x), (oh, ow), mode, ac))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_matmul_resize_scale_factor_path(rng, monkeypatch):
    """scales= (DINOv2 pos-embed +0.1 quirk) goes through the same matrix."""
    import depthmap_tpu.ops.resize as rz
    x = rng.normal(size=(1, 12, 12, 4)).astype(np.float32)
    ref = np.asarray(interpolate(jnp.asarray(x), (30, 30), "bicubic", False,
                                 scales=(2.51, 2.51)))
    monkeypatch.setattr(rz, "_use_matmul_resize", lambda: True)
    got = np.asarray(interpolate(jnp.asarray(x), (30, 30), "bicubic", False,
                                 scales=(2.51, 2.51)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_interpolate_nchw_batch(rng):
    # 4D NHWC input
    x = rng.normal(size=(2, 12, 14, 5)).astype(np.float32)
    got = np.asarray(interpolate(jnp.asarray(x), (24, 28), "bilinear", True))
    t = torch.from_numpy(np.moveaxis(x, -1, 1))
    want = np.moveaxis(
        F.interpolate(t, size=(24, 28), mode="bilinear",
                      align_corners=True).numpy(), 1, -1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
