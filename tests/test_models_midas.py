import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depthmap_tpu.models.efficientnet import (EfficientNetLiteBackbone,
                                              lite3_feature_channels)
from depthmap_tpu.models.midas_small import MidasNetSmall


def test_lite3_channels():
    assert lite3_feature_channels() == (32, 48, 136, 384)


def test_efficientnet_backbone_shapes(rng):
    m = EfficientNetLiteBackbone()
    x = jnp.zeros((1, 128, 160, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(vars_, x)
    assert [f.shape for f in feats] == [
        (1, 32, 40, 32), (1, 16, 20, 48), (1, 8, 10, 136), (1, 4, 5, 384)]


def test_midas_small_forward(rng):
    m = MidasNetSmall()
    x = jnp.asarray(rng.normal(size=(1, 64, 96, 3)), dtype=jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(vars_, x)
    assert out.shape == (1, 64, 96)
    assert (np.asarray(out) >= 0).all()  # non_negative head


def test_midas_small_jit_and_batch(rng):
    m = MidasNetSmall()
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), dtype=jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x[:1])
    out = jax.jit(m.apply)(vars_, x)
    assert out.shape == (2, 64, 64)
    # batch consistency: each item independent (BN in inference mode)
    out0 = m.apply(vars_, x[:1])
    # XLA may reassociate f32 accumulations differently for batch 1 vs 2;
    # after ~50 layers the drift is small but nonzero
    np.testing.assert_allclose(np.asarray(out[:1]), np.asarray(out0),
                               atol=5e-3)


@pytest.mark.slow
def test_midas_net_forward(rng):
    from depthmap_tpu.models.midas_net import MidasNet
    m = MidasNet()
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), dtype=jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(vars_, x)
    assert out.shape == (1, 64, 64)
