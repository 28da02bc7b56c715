#!/usr/bin/env python
"""Benchmark: depth frames/sec at 512x512 with dpt_beit_large_512 (the
BASELINE.md headline metric; baseline target 30 fps).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Runs on whatever accelerator jax.devices() offers (TPU in production, CPU in
dev with BENCH_SMALL=1 for a quick smoke run).  Weights are random-initialized
(numerics identical to converted checkpoints, so throughput is representative).
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    small = os.environ.get("BENCH_SMALL", "0") == "1"
    batch = int(os.environ.get("BENCH_BATCH", "4" if small else "32"))
    iters = int(os.environ.get("BENCH_ITERS", "2" if small else "5"))
    size = 128 if small else 512
    model_id = 6 if small else 1  # midas_small for smoke, beit_large_512 real

    from depthmap_tpu.models.build import build_model
    bundle = build_model(model_id)

    x = jnp.zeros((batch, size, size, 3), jnp.bfloat16)
    variables = bundle.module.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, size, size, 3), jnp.float32))
    variables = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, variables)

    @jax.jit
    def forward(variables, x):
        return bundle.module.apply(variables, x)

    # distinct inputs per iteration (the axon tunnel caches identical
    # dispatches, and block_until_ready does not force execution), and a
    # host materialization of the last output to fence the whole queue
    xs = [x + jnp.bfloat16(i) * jnp.bfloat16(1e-3) for i in range(iters)]

    # compile + warmup
    _ = np.asarray(forward(variables, xs[0]))

    best_dt = float("inf")
    for _trial in range(2):    # best-of-2: tunnel latency is noisy
        t0 = time.perf_counter()
        outs = [forward(variables, xi) for xi in xs]
        _ = np.asarray(outs[-1])  # launches execute in order; last fences all
        best_dt = min(best_dt, time.perf_counter() - t0)

    fps = batch * iters / best_dt
    print(json.dumps({
        "metric": f"depth_fps_{size}px_{bundle.spec.name}_b{batch}",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
