import jax
import jax.numpy as jnp
import numpy as np

from depthmap_tpu.models.beit import BeitBackbone, gen_relative_position_index
from depthmap_tpu.models.dpt import DPTDepthModel
from depthmap_tpu.models.vit import VitBackbone, resize_pos_embed


def test_gen_relative_position_index_layout():
    idx = gen_relative_position_index(3, 3)
    assert idx.shape == (10, 10)
    num_rel = 5 * 5
    assert idx[0, 0] == num_rel + 2
    assert (idx[0, 1:] == num_rel).all()
    assert (idx[1:, 0] == num_rel + 1).all()
    # token-token: symmetric under (i,j) swap via negated offsets
    assert idx[1, 2] != idx[2, 1]  # distinct relative positions
    # center-distance zero maps to the central table entry
    assert idx[1, 1] == (2 * 3 - 1) * (3 - 1) + (3 - 1)  # (wh-1)*(2ww-1)+(ww-1)


def test_resize_pos_embed_identity():
    pos = jnp.asarray(np.random.default_rng(0).normal(size=(1, 1 + 16, 8)),
                      dtype=jnp.float32)
    out = resize_pos_embed(pos, 4, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pos), atol=1e-6)
    out2 = resize_pos_embed(pos, 6, 5)
    assert out2.shape == (1, 1 + 30, 8)


def _tiny_vit():
    return VitBackbone(embed_dim=32, depth=4, num_heads=2, hooks=(0, 1, 2, 3),
                       train_grid=4)


def test_vit_backbone_and_dpt_shapes(rng):
    model = DPTDepthModel(backbone=_tiny_vit(),
                          reassemble_channels=(16, 32, 48, 48), features=32)
    x = jnp.asarray(rng.normal(size=(1, 64, 96, 3)), dtype=jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(vars_, x)
    assert out.shape == (1, 64, 96)
    assert (np.asarray(out) >= 0).all()


def test_beit_backbone_resolution_change(rng):
    bb = BeitBackbone(embed_dim=32, depth=2, num_heads=2, hooks=(0, 1),
                      train_img_size=64, patch_size=16)
    x64 = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), dtype=jnp.float32)
    vars_ = bb.init(jax.random.PRNGKey(0), x64)
    feats, grid = bb.apply(vars_, x64)
    assert grid == (4, 4)
    assert feats[0].shape == (1, 17, 32)
    # run at a different resolution with the same params (bias resize path)
    x96 = jnp.asarray(rng.normal(size=(1, 96, 80, 3)), dtype=jnp.float32)
    feats2, grid2 = bb.apply(vars_, x96)
    assert grid2 == (6, 5)
    assert feats2[0].shape == (1, 31, 32)


def test_beit_dpt_full(rng):
    bb = BeitBackbone(embed_dim=32, depth=4, num_heads=2, hooks=(0, 1, 2, 3),
                      train_img_size=64, patch_size=16)
    model = DPTDepthModel(backbone=bb, reassemble_channels=(16, 32, 48, 48),
                          features=32)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), dtype=jnp.float32)
    vars_ = model.init(jax.random.PRNGKey(0), x)
    out = jax.jit(model.apply)(vars_, x)
    assert out.shape == (1, 64, 64)


def test_hybrid_backbone_shapes(rng):
    from depthmap_tpu.models.vit import HybridVitBackbone
    bb = HybridVitBackbone(embed_dim=32, depth=2, num_heads=2, hooks=(0, 1),
                           train_grid=4)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), dtype=jnp.float32)
    vars_ = bb.init(jax.random.PRNGKey(0), x)
    (s1, s2, f3, f4), grid = bb.apply(vars_, x)
    assert s1.shape == (1, 16, 16, 256)   # stride 4
    assert s2.shape == (1, 8, 8, 512)     # stride 8
    assert grid == (4, 4)
    assert f3.shape == (1, 17, 32)


def test_beit_precomputed_bias_matches_inline(rng):
    """The hoisted rel-pos-bias path (precompute_rel_biases + rel_bias kwarg)
    must match the in-model gather exactly (it is the production fast path
    for dpt_beit_large_512/384)."""
    from depthmap_tpu.models.beit import precompute_rel_biases
    bb = BeitBackbone(embed_dim=32, depth=4, num_heads=2, hooks=(0, 1, 2, 3),
                      train_img_size=64, patch_size=16)
    x = jnp.asarray(rng.normal(size=(2, 96, 96, 3)), jnp.float32)
    v = bb.init(jax.random.PRNGKey(0), x)
    v = jax.tree.map(
        lambda a: a + 0.01 * jnp.asarray(
            np.random.default_rng(1).normal(size=a.shape), a.dtype), v)
    ref, _ = bb.apply(v, x)
    biases = precompute_rel_biases(bb, v["params"], (6, 6))
    assert len(biases) == 4 and biases[0].shape == (1, 2, 37, 37)
    out, _ = bb.apply(v, x, rel_bias=biases)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(r), np.asarray(o),
                                   rtol=0, atol=5e-6)


def test_dpt_rel_bias_passthrough(rng):
    """DPTDepthModel(x, rel_bias=...) produces the same depth as the
    in-model bias path."""
    from depthmap_tpu.models.beit import precompute_rel_biases
    from depthmap_tpu.models.dpt import DPTDepthModel
    bb = BeitBackbone(embed_dim=32, depth=4, num_heads=2, hooks=(0, 1, 2, 3),
                      train_img_size=64, patch_size=16)
    model = DPTDepthModel(backbone=bb, reassemble_channels=(8, 16, 24, 24),
                          features=16)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x)
    v = jax.tree.map(
        lambda a: a + 0.01 * jnp.asarray(
            np.random.default_rng(2).normal(size=a.shape), a.dtype), v)
    ref = model.apply(v, x)
    biases = precompute_rel_biases(bb, v["params"]["backbone"], (4, 4))
    out = model.apply(v, x, rel_bias=biases)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=0, atol=5e-6)
