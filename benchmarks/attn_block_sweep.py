"""Sweep flash-attention block sizes at the BEiT-L-512 backbone shape.

The headline forward spends ~21 ms/frame-batch in the flash kernel at 20%
MFU (PARITY round-5 MFU table).  d=64 caps the MXU at 50% for both matmuls,
so the kernel's speed-of-light is ~2x current — this sweep checks how much
of that gap is block-shape choice (whole-row 1152 vs scanned splits) before
touching the kernel itself.

Run on the chip: python benchmarks/attn_block_sweep.py
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from depthmap_tpu.ops.flash_attention import flash_attention

B, H, N, D = 8, 16, 1025, 64
PEAK = 197e12  # v5e bf16


def timeit(fn, iters=8):
    fn()  # compile + warm
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.tree.map(lambda a: np.asarray(a[0, 0, 0]) if a.ndim == 4
                     else np.asarray(a.ravel()[0]), out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((H, N, N)) * 0.02, jnp.bfloat16)

    flops = 2 * 2 * B * H * N * N * D  # unpadded useful FLOPs
    pad = 1152
    flops_pad = 2 * 2 * B * H * pad * pad * D

    DEPTH = int(os.environ.get("SWEEP_DEPTH", "8"))
    # chain so the tunnel dispatch floor (~3.4 ms/program on this rig)
    # amortizes away; 8 is deep enough and compiles ~3x faster than 24

    def stack(bq, bk, use_bias=True):
        @jax.jit
        def f(q):
            o = q
            for _ in range(DEPTH):
                o = flash_attention(o, q, q,
                                    bias=bias if use_bias else None,
                                    block_q=bq, block_k=bk)
            return o
        return lambda: f(q)

    all_configs = {
        "auto": ("auto (whole-row 1152)", None, None),
        "512x1152": ("512x1152", 512, 1152),
        "256x1152": ("256x1152", 256, 1152),
        "576x1152": ("576x1152", 576, 1152),
        "384x1152": ("384x1152", 384, 1152),
        "1152x384": ("1152x384", 1152, 384),
        "768x768": ("768x768", 768, 768),
        "512x512": ("512x512", 512, 512),
        # block dims equal to the array dims are legal in Mosaic even when
        # not (8,128)-divisible: no padded cols -> no mask select at all,
        # and the score tile shrinks 1152^2 -> (1025->1032)x1025 internally
        "unpadded": ("unpadded 1025x1025", N, N),
    }
    keys = sys.argv[1:] or ["auto", "512x1152"]
    configs = [all_configs[k] for k in keys if k in all_configs]
    ref = None
    for name, bq, bk in configs:
        try:
            fn = stack(bq, bk)
            t0 = time.perf_counter()
            out = fn()
            print(f"{name:24s} compiled in {time.perf_counter() - t0:.0f}s",
                  flush=True)
            if ref is None:
                ref = np.asarray(out, np.float32)
            else:
                d = np.abs(np.asarray(out, np.float32) - ref).max()
                assert d < 3e-1, (name, d)   # 24 chained layers drift
            dt = timeit(fn) / DEPTH
            print(f"{name:24s} {dt * 1e3:7.2f} ms/layer  "
                  f"MFU {flops / dt / PEAK * 100:5.1f}%  "
                  f"(padded {flops_pad / dt / PEAK * 100:5.1f}%)")
        except Exception as e:
            print(f"{name:24s} FAIL: {type(e).__name__}: {str(e)[:120]}")

    if "nobias" in sys.argv[1:]:
        # no-bias lower bound: how much of the time is the bias stream?
        dt = timeit(stack(None, None, use_bias=False)) / DEPTH
        print(f"{'no-bias (bound)':24s} {dt * 1e3:7.2f} ms/layer  "
              f"MFU {flops / dt / PEAK * 100:5.1f}%")

    if "exp" in sys.argv[1:]:
        # f32-scores exp cost probe: time a pure exp of the score volume,
        # chained to amortize the dispatch floor
        s = jnp.asarray(rng.standard_normal((B, H, pad, pad)) * 0.1,
                        jnp.float32)

        @jax.jit
        def just_exp(s):
            acc = jnp.zeros((B, H, pad), jnp.float32)
            for i in range(8):
                acc = acc + jnp.exp(s + jnp.float32(i) * 1e-3).sum(axis=-1)
            return acc

        dt = timeit(lambda: just_exp(s)) / 8
        n_exp = B * H * pad * pad
        print(f"{'xla exp volume':24s} {dt * 1e3:7.2f} ms  "
              f"({n_exp / dt / 1e9:.1f} Gexp/s)")


if __name__ == "__main__":
    main()
