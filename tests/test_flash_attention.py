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
