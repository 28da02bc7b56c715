#!/usr/bin/env python
"""A/B bench of BEiT transformer-block formulations (VERDICT r4 #2).

The round-4 MFU breakdown attributed 35.6 ms of the 109 ms BEiT-L-512 b8
forward to "backbone other" — zero-FLOP layout/norm traffic, dominated by
the attention-adjacent layout changes: (B,N,3C) -> (B,N,3,H,D) ->
(3,B,H,N,D) before the kernel and (B,H,N,D) -> (B,N,C) after it.  This
bench times a 24-block stack at the headline shapes for each candidate:

  v0_moveaxis — the round-4 transformer.py math (moveaxis + flash kernel)
  v1_einsum   — q/k/v emitted straight to (B,H,N,D) by per-slice einsums,
                attention output consumed by an (hd,c) einsum out-proj
                (SHIPPED since round 5: transformer.py uses this layout)

A v2_packed variant (qkv dense output fed to a packed-qkv kernel whose
index maps sliced q/k/v blocks in place) was measured here in round 5 but
Mosaic rejects its block shape; the kernel and the variant were removed
(see the note at the end of ops/flash_attention.py).

All variants share weights; outputs are cross-checked.  Prints JSON rows.
"""
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
MLP = 4 * C


def _fence(out):
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[:1])


def timeit(fn, *args, iters=6):
    out = fn(*args)
    _fence(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _fence(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, out


def main():
    import jax
    import jax.numpy as jnp
    from depthmap_tpu.ops.flash_attention import flash_attention

    cdt = jnp.bfloat16
    rng = np.random.default_rng(0)

    def mk(*shape, scale=0.02):
        return jnp.asarray(rng.standard_normal(shape) * scale, cdt)

    # one shared weight set (per-block reuse is fine for timing)
    wqkv = mk(C, 3 * C)
    qbias = mk(C)
    vbias = mk(C)
    wproj = mk(C, C)
    bproj = mk(C)
    w1, b1 = mk(C, MLP), mk(MLP)
    w2, b2 = mk(MLP, C), mk(C)
    ln1s, ln1b = jnp.ones((C,), cdt), jnp.zeros((C,), cdt)
    ln2s, ln2b = jnp.ones((C,), cdt), jnp.zeros((C,), cdt)
    g1 = mk(C, scale=1.0)
    g2 = mk(C, scale=1.0)
    bias = mk(1, H, N, N, scale=0.2)
    qkv_bias = jnp.concatenate([qbias, jnp.zeros_like(qbias), vbias])

    x = mk(B, N, C, scale=1.0)

    def ln(t, s, b):
        m = jnp.mean(t, -1, keepdims=True)
        v = jnp.var(t, -1, keepdims=True)
        return (t - m) * jax.lax.rsqrt(v + 1e-6) * s + b

    def mlp_part(t):
        h = jax.nn.gelu(t @ w1 + b1, approximate=False)
        return h @ w2 + b2

    # ---- v0: current layout (moveaxis; kernel in (B,H,N,D))
    def block_v0(t):
        h = ln(t, ln1s, ln1b)
        qkv = (h @ wqkv + qkv_bias).reshape(B, N, 3, H, D)
        q, k, v = (jnp.moveaxis(qkv, (2, 3), (0, 2))[i] for i in range(3))
        o = flash_attention(q, k, v, bias=bias)
        o = o.transpose(0, 2, 1, 3).reshape(B, N, C)
        t = t + g1 * (o @ wproj + bproj)
        return t + g2 * mlp_part(ln(t, ln2s, ln2b))

    # ---- v1: einsum straight to (B,H,N,D); einsum out-proj
    wq = wqkv[:, :C].reshape(C, H, D)
    wk = wqkv[:, C:2 * C].reshape(C, H, D)
    wv = wqkv[:, 2 * C:].reshape(C, H, D)
    wproj_hd = wproj.reshape(H, D, C)

    def block_v1(t):
        h = ln(t, ln1s, ln1b)
        q = jnp.einsum("bnc,chd->bhnd", h, wq) + \
            qbias.reshape(H, D)[None, :, None]
        k = jnp.einsum("bnc,chd->bhnd", h, wk)
        v = jnp.einsum("bnc,chd->bhnd", h, wv) + \
            vbias.reshape(H, D)[None, :, None]
        o = flash_attention(q, k, v, bias=bias)
        o = jnp.einsum("bhnd,hdc->bnc", o, wproj_hd) + bproj
        t = t + g1 * o
        return t + g2 * mlp_part(ln(t, ln2s, ln2b))

    # ---- ablations of v1: find where the non-matmul time lives
    def block_v1_noln(t):
        h = t
        q = jnp.einsum("bnc,chd->bhnd", h, wq)
        k = jnp.einsum("bnc,chd->bhnd", h, wk)
        v = jnp.einsum("bnc,chd->bhnd", h, wv)
        o = flash_attention(q, k, v, bias=bias)
        o = jnp.einsum("bhnd,hdc->bnc", o, wproj_hd)
        t = t + o
        h2 = jax.nn.gelu(t @ w1, approximate=False)
        return t + h2 @ w2

    def block_v1_noattn(t):
        h = ln(t, ln1s, ln1b)
        q = jnp.einsum("bnc,chd->bhnd", h, wq) + \
            qbias.reshape(H, D)[None, :, None]
        o = jnp.einsum("bhnd,hdc->bnc", q, wproj_hd) + bproj
        t = t + g1 * o
        return t + g2 * mlp_part(ln(t, ln2s, ln2b))

    def block_v1_nomlp(t):
        h = ln(t, ln1s, ln1b)
        q = jnp.einsum("bnc,chd->bhnd", h, wq) + \
            qbias.reshape(H, D)[None, :, None]
        k = jnp.einsum("bnc,chd->bhnd", h, wk)
        v = jnp.einsum("bnc,chd->bhnd", h, wv) + \
            vbias.reshape(H, D)[None, :, None]
        o = flash_attention(q, k, v, bias=bias)
        o = jnp.einsum("bhnd,hdc->bnc", o, wproj_hd) + bproj
        return t + g1 * o

    def block_v1_nobias(t):
        h = ln(t, ln1s, ln1b)
        q = jnp.einsum("bnc,chd->bhnd", h, wq)
        k = jnp.einsum("bnc,chd->bhnd", h, wk)
        v = jnp.einsum("bnc,chd->bhnd", h, wv)
        o = flash_attention(q, k, v)
        o = jnp.einsum("bhnd,hdc->bnc", o, wproj_hd)
        t = t + g1 * o
        return t + g2 * mlp_part(ln(t, ln2s, ln2b))

    rows = []
    outs = {}
    variants = [("v0_current", block_v0), ("v1_einsum", block_v1)]
    if os.environ.get("BLOCK_ABLATE", "0") == "1":
        variants += [("v1_noln_nogamma", block_v1_noln),
                     ("v1_noattnkernel", block_v1_noattn),
                     ("v1_nomlp", block_v1_nomlp),
                     ("v1_norelbias", block_v1_nobias)]
    for name, blk in variants:
        @jax.jit
        def stack(t, blk=blk):
            for _ in range(DEPTH):
                t = blk(t)
            return t
        try:
            dt, out = timeit(stack, x)
        except Exception as e:
            rows.append({"variant": name, "error": str(e)[:200]})
            continue
        outs[name] = np.asarray(out, np.float32)
        rows.append({"variant": name, "ms": round(dt * 1e3, 2),
                     "ms_per_frame": round(dt * 1e3 / B, 3)})

    if "v0_current" in outs:
        ref = outs["v0_current"]
        for name, o in outs.items():
            if name != "v0_current":
                rows.append({"check": f"{name} vs v0 max|d|",
                             "value": float(np.abs(o - ref).max())})
    print(json.dumps({"metric": "beit_block_fusion_ab", "rows": rows}))


if __name__ == "__main__":
    main()
