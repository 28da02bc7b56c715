import numpy as np
import jax
import jax.numpy as jnp
import pytest

from depthmap_tpu.models.attention import attention_xla
from depthmap_tpu.ops.flash_attention import flash_attention


def _qkv(rng, b=1, h=2, n=100, d=32):
    q = rng.normal(size=(b, h, n, d)).astype(np.float32)
    k = rng.normal(size=(b, h, n, d)).astype(np.float32)
    v = rng.normal(size=(b, h, n, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize("n", [64, 128, 100, 257])
def test_flash_matches_xla(rng, n):
    q, k, v = _qkv(rng, n=n)
    want = np.asarray(attention_xla(q, k, v))
    got = np.asarray(flash_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_flash_with_bias(rng):
    n = 130
    q, k, v = _qkv(rng, n=n)
    bias = jnp.asarray(rng.normal(size=(1, 2, n, n)).astype(np.float32))
    want = np.asarray(attention_xla(q, k, v, bias))
    got = np.asarray(flash_attention(q, k, v, bias=bias, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_flash_with_batched_bias(rng):
    n = 96
    q, k, v = _qkv(rng, b=2, n=n)
    bias = jnp.asarray(rng.normal(size=(2, 2, n, n)).astype(np.float32))
    want = np.asarray(attention_xla(q, k, v, bias))
    got = np.asarray(flash_attention(q, k, v, bias=bias, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_flash_custom_scale(rng):
    q, k, v = _qkv(rng, n=64)
    want = np.asarray(attention_xla(q, k, v, scale=0.25))
    got = np.asarray(flash_attention(q, k, v, scale=0.25, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_attention_rel_streamed_matches_materialized(rng):
    """Streamed per-chunk bias gather must equal attention with the fully
    materialized (H, N, N) bias built from the same table/index."""
    import jax.numpy as jnp
    from depthmap_tpu.models.attention import (RelBiasSpec, attention_xla,
                                               attention_rel_streamed)
    from depthmap_tpu.models.beit import gen_relative_position_index

    gh, gw = 5, 7
    n = gh * gw + 1
    h, d, b = 3, 8, 2
    num_rel = (2 * gh - 1) * (2 * gw - 1)
    table = rng.normal(size=(num_rel + 3, h)).astype(np.float32)
    q = rng.normal(size=(b, h, n, d)).astype(np.float32)
    k = rng.normal(size=(b, h, n, d)).astype(np.float32)
    v = rng.normal(size=(b, h, n, d)).astype(np.float32)

    idx = gen_relative_position_index(gh, gw)
    bias = table[idx.reshape(-1)].reshape(n, n, h).transpose(2, 0, 1)[None]
    ref = attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        jnp.asarray(bias))
    # chunk smaller than n so several chunks + query padding are exercised
    got = attention_rel_streamed(jnp.asarray(q), jnp.asarray(k),
                                 jnp.asarray(v),
                                 RelBiasSpec(jnp.asarray(table), gh, gw),
                                 chunk=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_beit_backbone_streamed_bias_matches(rng, monkeypatch):
    """BeitBackbone with the stream budget forced to 0 must produce the
    same features as the materialized inline path."""
    import jax
    import jax.numpy as jnp
    from depthmap_tpu.models.beit import BeitBackbone

    bb = BeitBackbone(embed_dim=32, depth=2, num_heads=2, hooks=(0, 1),
                      train_img_size=64, patch_size=16)
    x = jnp.asarray(rng.normal(size=(1, 64, 96, 3)), jnp.float32)
    params = jax.jit(bb.init)(jax.random.PRNGKey(0), x)

    monkeypatch.delenv("DEPTHMAP_BIAS_STREAM_BYTES", raising=False)
    feats_mat, grid = bb.apply(params, x)
    monkeypatch.setenv("DEPTHMAP_BIAS_STREAM_BYTES", "0")
    feats_str, grid2 = jax.jit(bb.apply)(params, x)
    assert grid == grid2
    for a, b_ in zip(feats_mat, feats_str):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-5, rtol=2e-5)


def _on_chip_unpadded_cases():
    """Shared body for the TPU-gated unpadded-edge-block parity check; also
    runnable as a standalone script on hardware (ADVICE r4 #1: interpret
    mode always takes the explicit-pad branch, so the shipped unpadded
    Mosaic path — partial edge blocks, garbage-row masking in-kernel —
    needs an on-chip check)."""
    import jax.numpy as jnp
    from depthmap_tpu.ops.flash_attention import flash_attention
    from depthmap_tpu.models.attention import attention_xla
    rng_ = np.random.default_rng(0)
    results = []
    for n in (1025, 513, 130):   # none are multiples of the 128-lane tile
        b, h, d = 2, 4, 64
        q, k, v = (jnp.asarray(rng_.standard_normal((b, h, n, d)),
                               jnp.float32) for _ in range(3))
        bias = jnp.asarray(rng_.standard_normal((1, h, n, n)) * 0.2,
                           jnp.float32)
        ref = attention_xla(q, k, v, bias)
        got = flash_attention(q, k, v, bias=bias, interpret=False)
        results.append(("flash+bias", n,
                        float(jnp.abs(ref - got).max())))
        ref2 = attention_xla(q, k, v, None)
        got2 = flash_attention(q, k, v, interpret=False)
        results.append(("flash", n, float(jnp.abs(ref2 - got2).max())))
        if n > 1024:
            # force the online-softmax SCAN kernel (n_kv > 1: edge-slab
            # masking + log2-space rescale) — auto blocks would pick the
            # single-block whole-row kernel at this N
            got3 = flash_attention(q, k, v, bias=bias, block_q=512,
                                   block_k=512, interpret=False)
            results.append(("flash+bias scan512", n,
                            float(jnp.abs(ref - got3).max())))
    return results


def test_flash_unpadded_edge_blocks_on_chip():
    """Unpadded q/k/v with non-block-multiple N on REAL hardware: the
    Mosaic partial-edge-block path must match the XLA softmax reference.
    Skips on CPU (interpret mode pads explicitly and cannot exercise it)."""
    import jax
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("needs real TPU hardware (interpret mode pads)")
    for name, n, diff in _on_chip_unpadded_cases():
        assert diff < 5e-3, (name, n, diff)


if __name__ == "__main__":
    for row in _on_chip_unpadded_cases():
        print(row)
