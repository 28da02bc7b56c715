#!/usr/bin/env python
"""Per-stage device-time breakdown of the headline config (BEiT-L 512 b8)
— the MFU profile VERDICT r3 next-#3 asked for.

Times, on the real chip:
  * the full production forward (DepthPredictor path, bf16 policy,
    precomputed rel biases — exactly bench.py's headline);
  * the backbone alone (patch embed + 24 transformer blocks);
  * the flash-attention calls alone at the backbone's shapes (24 layers);
  * the backbone's dense matmuls alone (QKV/proj/MLP, 24 layers);
  * decode = full - backbone (reassemble + fusion + head, derived).

Each stage gets analytic FLOPs, so the table attributes both time and MFU.
Prints one JSON line (rows also land in PARITY.md's round-4 section).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, S = 8, 512          # headline batch and image size
PEAK_BF16 = 197e12     # v5e chip peak, bf16 MXU (394 is the int8 number)


def _fence(out):
    # block_until_ready does not force execution through the axon tunnel;
    # a tiny host readback of the last output does
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
    from depthmap_tpu.pipeline.depth import DepthPredictor
    from depthmap_tpu.ops.flash_attention import flash_attention

    pred = DepthPredictor(1)            # dpt_beit_large_512
    x = jnp.asarray(np.random.default_rng(0)
                    .random((B, S, S, 3)).astype(np.float32))
    cdt = pred.compute_dtype

    # ---- full production forward (the 73 fps path)
    t_full = timeit(lambda a: pred._apply(a, S, S, None), x)

    # ---- backbone alone
    backbone, bb_params = pred._beit_hoist_info()
    bb_vars = {"params": bb_params}
    grid = (S // 16, S // 16)
    biases = pred._rel_biases(grid)
    bb = jax.jit(lambda v, a, rb: backbone.apply(
        v, a.astype(cdt), rel_bias=rb))
    t_backbone = timeit(lambda a: bb(bb_vars, a, biases), x)

    # ---- attention alone at backbone shapes
    gh = S // 16
    n_tok = gh * gh + 1
    heads, dim_head, depth = 16, 64, 24
    q = jnp.asarray(np.random.default_rng(1).standard_normal(
        (B, heads, n_tok, dim_head)), cdt)
    bias = biases[0].astype(cdt)

    @jax.jit
    def attn_stack(q):
        o = q
        for _ in range(depth):
            o = flash_attention(o, q, q, bias=bias)
        return o
    t_attn = timeit(attn_stack, q)

    # ---- backbone dense matmuls alone (qkv + proj + mlp) x 24
    d = 1024
    tok = jnp.asarray(np.random.default_rng(2).standard_normal(
        (B * n_tok, d)), cdt)
    wqkv = jnp.asarray(np.random.default_rng(3).standard_normal(
        (d, 3 * d)), cdt)
    wproj = jnp.asarray(np.random.default_rng(4).standard_normal(
        (d, d)), cdt)
    w1 = jnp.asarray(np.random.default_rng(5).standard_normal(
        (d, 4 * d)), cdt)
    w2 = jnp.asarray(np.random.default_rng(6).standard_normal(
        (4 * d, d)), cdt)

    @jax.jit
    def dense_stack(t):
        o = t
        for _ in range(depth):
            qkv = o @ wqkv
            o = qkv[:, :d] @ wproj
            h = o @ w1
            o = h @ w2
        return o
    t_dense = timeit(dense_stack, tok)

    # ---- analytic FLOPs
    ntok_f = float(B * n_tok)
    f_dense = depth * ntok_f * (2 * d * 3 * d + 2 * d * d
                                + 2 * d * 4 * d + 2 * 4 * d * d)
    f_attn = depth * 2 * 2 * B * heads * n_tok * n_tok * dim_head
    # backbone ~= dense + attn (+ patch embed, layernorms, bias adds)
    f_patch = 2 * B * (S // 16) ** 2 * (16 * 16 * 3) * d
    f_backbone = f_dense + f_attn + f_patch
    # decode: reassemble convs + 4 fusion blocks + head (dominated by the
    # 3x3 convs at 256 ch over the feature pyramid)
    f_full = f_backbone + _decode_flops()

    rows = []

    def row(name, t, f):
        rows.append({"stage": name, "ms": round(t * 1e3, 2),
                     "ms_per_frame": round(t * 1e3 / B, 3),
                     "gflops": round(f / 1e9, 1),
                     "mfu_pct": (round(100 * f / t / PEAK_BF16, 1)
                                 if t > 1e-9 else None)})

    row("full_forward", t_full, f_full)
    row("backbone", t_backbone, f_backbone)
    row("attention_x24(isolated)", t_attn, f_attn)
    row("dense_matmuls_x24(isolated)", t_dense, f_dense)
    t_decode = t_full - t_backbone
    row("decode(reassemble+fusion+head, derived)", t_decode,
        _decode_flops())
    other = t_backbone - t_attn - t_dense
    row("backbone_other(layout/norm/bias, derived)", max(other, 0.0),
        f_patch)
    print(json.dumps({"metric": "mfu_breakdown_beit_large_512_b8",
                      "fps": round(B / t_full, 2), "rows": rows}))


def _decode_flops():
    # feature pyramid at 512 input: grids 32 (x4 stages reassembled to
    # 128/64/32/16), fusion at 256ch with two 3x3 resconvunits per block +
    # head convs; counted from the module shapes (dpt.py:86-125)
    f = 0.0
    ch = 256
    for size in (16, 32, 64, 128):
        f += 2 * B * size * size * (3 * 3 * ch * ch) * 4   # 2 RCUs x 2 convs
    for size, cin in ((128, 256), (64, 512), (32, 1024), (16, 1024)):
        f += 2 * B * size * size * (3 * 3 * cin * ch)      # scratch rn conv
    f += 2 * B * 256 * 256 * (3 * 3 * 256 * 128)           # head_conv1
    f += 2 * B * 512 * 512 * (3 * 3 * 128 * 32)            # head_conv2
    f += 2 * B * 512 * 512 * (32 * 1)                      # head_conv3
    return f


if __name__ == "__main__":
    main()
