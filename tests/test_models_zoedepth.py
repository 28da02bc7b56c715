import dataclasses

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from depthmap_tpu.models.dpt import DPTDepthModel
from depthmap_tpu.models.vit import VitBackbone
from depthmap_tpu.models.zoedepth import (ZoeDepth, ZoeDepthInference,
                                          ZoeDepthNK)


def _tiny_core():
    return DPTDepthModel(
        backbone=VitBackbone(embed_dim=32, depth=4, num_heads=2,
                             hooks=(0, 1, 2, 3), train_grid=4),
        reassemble_channels=(16, 32, 48, 48), features=32, with_zoe_taps=True)


def test_zoedepth_metric_output(rng):
    m = ZoeDepth(core=_tiny_core(), n_bins=8, bin_embedding_dim=16,
                 max_depth=10.0)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), dtype=jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(vars_, x)
    assert out.shape == (1, 64, 64)
    o = np.asarray(out)
    assert (o > 0).all()          # metric depth, positive


def test_zoedepth_nk_routes(rng):
    m = ZoeDepthNK(core=_tiny_core(), n_bins=8, bin_embedding_dim=16)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), dtype=jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x)
    out = jax.jit(m.apply)(vars_, x)
    assert out.shape == (1, 64, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_zoedepth_inference_tta(rng):
    m = ZoeDepthInference(
        ZoeDepth(core=_tiny_core(), n_bins=8, bin_embedding_dim=16),
        img_size=(64, 64))
    x = jnp.asarray(rng.random((1, 50, 70, 3)), dtype=jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(vars_, x)
    assert out.shape == (1, 50, 70)
    assert np.isfinite(np.asarray(out)).all()


def test_zoe_rel_bias_hoist_matches_inline(rng):
    """ZoeDepthInference(x, rel_bias=precomputed) == in-model bias gather
    (the production fast path for types 7-9)."""
    import dataclasses
    from depthmap_tpu.models.beit import BeitBackbone, precompute_rel_biases
    from depthmap_tpu.models.dpt import DPTDepthModel
    from depthmap_tpu.models.zoedepth import ZoeDepth, ZoeDepthInference

    bb = BeitBackbone(embed_dim=32, depth=4, num_heads=2, hooks=(0, 1, 2, 3),
                      train_img_size=64, patch_size=16)
    core = DPTDepthModel(backbone=bb, reassemble_channels=(8, 16, 24, 24),
                         features=32, with_zoe_taps=True)
    model = ZoeDepthInference(ZoeDepth(core, n_bins=8, bin_embedding_dim=16),
                              img_size=(64, 64))
    x = jnp.asarray(rng.random((1, 48, 48, 3)), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x)
    v = jax.tree.map(
        lambda a: a + 0.01 * jnp.asarray(
            np.random.default_rng(3).normal(size=a.shape), a.dtype), v)
    ref = model.apply(v, x)

    nh, nw = ZoeDepthInference.net_input_size(48, 48, None, (64, 64))
    grid = (nh // 16, nw // 16)
    biases = precompute_rel_biases(
        bb, v["params"]["model"]["core"]["backbone"], grid)
    out = model.apply(v, x, rel_bias=biases)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=0, atol=1e-5)


@pytest.mark.slow
def test_zoe_selective_precision_policy(rng, monkeypatch):
    """zoedepth_n default: bf16 relative-depth core + f32 metric head
    (VERDICT r2 #7).  Measured on v5e: 28.9 vs 19.8 fps @512^2 b8 with
    a1 = 1.0 and abs_rel 0.32% vs full f32 (PARITY.md round 3).  An explicit
    compute_dtype (the funnel's no_half op) must force f32 everywhere."""
    import jax.numpy as jnp
    from depthmap_tpu.pipeline.depth import DepthPredictor
    monkeypatch.delenv("DEPTHMAP_COMPUTE_DTYPE", raising=False)
    monkeypatch.delenv("DEPTHMAP_ZOE_CORE_DTYPE", raising=False)
    pred = DepthPredictor(7, weights_dir="/nonexistent")
    assert pred.compute_dtype == jnp.float32       # head stays f32
    assert pred.core_dtype == jnp.bfloat16
    assert pred.bundle.module.model.core_dtype == jnp.bfloat16

    img = rng.random((64, 96, 3)).astype(np.float32)
    sel = pred.predict(img, 64, 64)

    f32 = DepthPredictor(7, weights_dir="/nonexistent",
                         compute_dtype="float32")
    assert f32.core_dtype == jnp.float32           # no_half path
    assert f32.bundle.module.model.core_dtype is None
    ref = f32.predict(img, 64, 64)
    rel = np.abs(sel - ref) / np.maximum(np.abs(ref), 1e-6)
    assert rel.mean() < 0.02, rel.mean()
    assert np.median(rel) < 0.01
