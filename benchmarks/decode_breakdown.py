#!/usr/bin/env python
"""Per-stage timing of the DPT decode path (VERDICT r4 #6).

The round-5 MFU table attributes 21.7 ms (b8) / 37% MFU to
"decode = reassemble + fusion + head" as one derived number.  This bench
times each decode stage at the real BEiT-L-512 shapes so the number is
attributable, and A/Bs the one structural candidate (stride-4/2
ConvTranspose vs an equivalent dense + depth-to-space).

Prints one JSON line with ms per stage.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, G, C = 8, 32, 1024   # batch, token grid, embed dim
F = 256                  # fusion features


def _fence(out):
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[:1])


def timeit(fn, *args, iters=8):
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
    from depthmap_tpu.models.dpt import Reassemble
    from depthmap_tpu.models.midas_blocks import (FeatureFusionBlockCustom,
                                                  Scratch)
    from depthmap_tpu.models.layers import Conv
    from depthmap_tpu.ops.resize import scale2x

    cdt = jnp.bfloat16
    rng = np.random.default_rng(0)
    rows = []

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.05, cdt)

    key = jax.random.PRNGKey(0)
    tokens = mk(B, G * G + 1, C)
    grid = (G, G)

    def cast(tree):
        # production params are bf16 (depth.py compute-dtype policy);
        # flax init returns f32 — cast so the isolated stages match
        return jax.tree.map(
            lambda a: a.astype(cdt)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, tree)

    # ---- reassemble x4 (the real levels/channels)
    reas = []
    for i, ch in enumerate((256, 512, 1024, 1024)):
        mod = Reassemble(ch, i)
        params = cast(jax.jit(mod.init, static_argnums=(2,))(key, tokens, grid))
        fn = jax.jit(lambda p, t, m=mod: m.apply(p, t, grid))
        reas.append((f"reassemble{i}", fn, params))
    t_rea = 0.0
    layers = []
    for name, fn, params in reas:
        t = timeit(fn, params, tokens)
        t_rea += t
        rows.append({"stage": name, "ms": round(t * 1e3, 2)})
        layers.append(fn(params, tokens))

    # ---- scratch projections
    scr = Scratch(F, expand=False)
    sp = cast(jax.jit(scr.init)(key, layers))
    t = timeit(jax.jit(scr.apply), sp, layers)
    rows.append({"stage": "scratch_rn_x4", "ms": round(t * 1e3, 2)})
    rns = jax.jit(scr.apply)(sp, layers)

    # ---- fusion blocks (chained like the model)
    r1, r2, r3, r4 = rns

    def fusion_chain_init():
        mods = [FeatureFusionBlockCustom(F) for _ in range(4)]
        p4m, p3m, p2m, p1m = mods

        def apply_all(v4, v3, v2, v1):
            p4 = p4m.apply(v4, r4, size=r3.shape[1:3])
            p3 = p3m.apply(v3, p4, r3, size=r2.shape[1:3])
            p2 = p2m.apply(v2, p3, r2, size=r1.shape[1:3])
            return p1m.apply(v1, p2, r1)
        v4 = cast(jax.jit(p4m.init, static_argnames=("size",))(
            key, r4, size=tuple(r3.shape[1:3])))
        # fused blocks consume the PREVIOUS level's upsampled output, which
        # has the skip's spatial dims
        v3 = cast(p3m.init(key, r3, r3, size=tuple(r2.shape[1:3])))
        v2 = cast(p2m.init(key, r2, r2, size=tuple(r1.shape[1:3])))
        v1 = cast(p1m.init(key, r1, r1))
        return jax.jit(apply_all), (v4, v3, v2, v1)

    fuse, fvars = fusion_chain_init()
    t = timeit(fuse, *fvars)
    rows.append({"stage": "fusion_x4", "ms": round(t * 1e3, 2)})
    p1 = fuse(*fvars)

    # ---- head
    class Head(nn.Module):
        @nn.compact
        def __call__(self, x):
            out = Conv(F // 2, 3, 1, padding=1, name="c1")(x)
            out = scale2x(out, "bilinear", align_corners=True)
            out = Conv(32, 3, 1, padding=1, name="c2")(out)
            out = nn.relu(out)
            return nn.relu(Conv(1, 1, name="c3")(out.astype(jnp.float32)))

    head = Head()
    hv = cast(jax.jit(head.init)(key, p1))
    t = timeit(jax.jit(head.apply), hv, p1)
    rows.append({"stage": "head", "ms": round(t * 1e3, 2)})

    # ---- A/B: ConvTranspose 4x vs dense + depth-to-space (level 0)
    x0 = mk(B, G, G, 256)
    ct = nn.ConvTranspose(256, (4, 4), strides=(4, 4), padding="VALID")
    ctv = cast(jax.jit(ct.init)(key, x0))
    t_ct = timeit(jax.jit(ct.apply), ctv, x0)
    w_d2s = mk(256, 16 * 256)

    @jax.jit
    def dense_d2s(x):
        h = x @ w_d2s
        h = h.reshape(B, G, G, 4, 4, 256)
        h = h.transpose(0, 1, 3, 2, 4, 5)
        return h.reshape(B, 4 * G, 4 * G, 256)
    t_d2s = timeit(dense_d2s, x0)
    rows.append({"stage": "convT4x_vs_dense_d2s_ms",
                 "convT": round(t_ct * 1e3, 2),
                 "dense_d2s": round(t_d2s * 1e3, 2)})

    print(json.dumps({"metric": "decode_breakdown_beitl512_b8",
                      "rows": rows}))


if __name__ == "__main__":
    main()
