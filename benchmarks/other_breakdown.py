#!/usr/bin/env python
"""Decompose the headline backbone's 'other' pool (mfu_breakdown.py: 35.6 ms
at ~zero FLOPs) into its constituent layout/norm/elementwise passes, each
timed in isolation on the chip at the production shapes (B=8, N=1025,
C=1024, bf16).  This names the actual lever before any fusion work."""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, N, C, H = 8, 1025, 1024, 16
D = C // H
DEPTH = 24


def _fence(out):
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[:1])


def timeit(fn, *args, iters=4):
    out = fn(*args)
    _fence(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _fence(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    cdt = jnp.bfloat16
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * C)), cdt)
    x = jnp.asarray(rng.standard_normal((B, N, C)), cdt)
    attn_out = jnp.asarray(rng.standard_normal((B, H, N, D)), cdt)
    bias = jnp.asarray(rng.standard_normal((1, H, N, N)), cdt)
    gamma = jnp.asarray(rng.standard_normal((C,)), cdt)

    rows = []

    def row(name, t, reps=DEPTH):
        rows.append({"op": name, "ms_x24": round(t * 1e3 * reps, 2),
                     "ms_once": round(t * 1e3, 3)})

    # 1. qkv (B,N,3C) -> 3 x (B,H,N,D) split/transpose (Attention step)
    @jax.jit
    def split_qkv(qkv):
        q, k, v = (jnp.moveaxis(
            qkv.reshape(B, N, 3, H, D), (2, 3), (0, 2))[i]
            for i in range(3))
        return q + 0, k + 0, v + 0
    row("qkv split+transpose", timeit(split_qkv, qkv))

    # 2. attention out (B,H,N,D) -> (B,N,C)
    @jax.jit
    def merge_out(o):
        return o.transpose(0, 2, 1, 3).reshape(B, N, C) + 0
    row("attn out transpose", timeit(merge_out, attn_out))

    # 3. LayerNorm (two per block)
    ln = nn.LayerNorm(epsilon=1e-6)
    lnv = ln.init(jax.random.PRNGKey(0), x)
    lnf = jax.jit(lambda v, a: ln.apply(v, a))
    row("layernorm x2", timeit(lnf, lnv, x), reps=2 * DEPTH)

    # 4. bias pad (inside flash_attention: 1025 -> 1152 whole-row tiles)
    @jax.jit
    def pad_bias(b_):
        return jnp.pad(b_, ((0, 0), (0, 0), (0, 127), (0, 127)))
    row("bias pad 1025->1152", timeit(pad_bias, bias))

    # 5. q/k/v pads (3 x (B,H,N,D) -> 1152)
    @jax.jit
    def pad_qkv(q):
        return (jnp.pad(q, ((0, 0), (0, 0), (0, 127), (0, 0))),) * 1
    row("qkv pad x3", timeit(pad_qkv, attn_out), reps=3 * DEPTH)

    # 6. residual + layer scale (two per block)
    @jax.jit
    def resid(a, h_):
        return a + gamma * h_
    row("residual+gamma x2", timeit(resid, x, x), reps=2 * DEPTH)

    total = sum(r["ms_x24"] for r in rows)
    print(json.dumps({"metric": "backbone_other_breakdown",
                      "sum_ms": round(total, 1), "rows": rows}))


if __name__ == "__main__":
    main()
