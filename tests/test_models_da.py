import jax
import jax.numpy as jnp
import numpy as np

from depthmap_tpu.models.depth_anything import DepthAnything
from depthmap_tpu.models.dinov2 import DinoV2Backbone


def test_dinov2_backbone_shapes(rng):
    bb = DinoV2Backbone(embed_dim=32, depth=4, num_heads=2, hooks=(0, 1, 2, 3),
                        patch_size=14, train_img_size=56)
    x = jnp.asarray(rng.normal(size=(1, 56, 70, 3)), dtype=jnp.float32)
    vars_ = bb.init(jax.random.PRNGKey(0), x)
    feats, grid = bb.apply(vars_, x)
    assert grid == (4, 5)
    patch, cls = feats[0]
    assert patch.shape == (1, 20, 32)
    assert cls.shape == (1, 32)


def test_depth_anything_forward(rng):
    m = DepthAnything(encoder_variant="vits", features=16,
                      out_channels=(8, 16, 24, 24))
    # override the backbone depth via a tiny variant: use vits (12 blocks) at
    # minimal size; 56x56 -> grid 4x4
    x = jnp.asarray(rng.normal(size=(1, 56, 56, 3)), dtype=jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(vars_, x)
    assert out.shape == (1, 56, 56)
    assert (np.asarray(out) >= 0).all()


def test_depth_anything_resolution_change(rng):
    m = DepthAnything(encoder_variant="vits", features=16,
                      out_channels=(8, 16, 24, 24))
    x = jnp.asarray(rng.normal(size=(1, 56, 56, 3)), dtype=jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x)
    # different resolution exercises the pos-embed scale-factor interpolation
    x2 = jnp.asarray(rng.normal(size=(1, 98, 70, 3)), dtype=jnp.float32)
    out = m.apply(vars_, x2)
    assert out.shape == (1, 98, 70)
