#!/usr/bin/env python
"""On-chip Marigold precision decision data (VERDICT r3 next-#4):
times the production-size pipeline (processing_res, 5-member ensemble,
12 DDIM steps) in full f32 vs mixed precision (bf16 VAE/UNet, f32
latent/scheduler — DEPTHMAP_MARIGOLD_DTYPE=bfloat16) and reports s/image
plus the drift between the two depth maps.  Prints one JSON line.

BENCH_SMALL=1 shrinks the config for smoke runs.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_once(compute_dtype, img, res, ens, steps, variables=None):
    from depthmap_tpu.models.marigold.pipeline import MarigoldPipeline
    pipe = MarigoldPipeline(variables=variables,
                            compute_dtype=compute_dtype)
    vars_f32 = pipe.vars if compute_dtype == "float32" else None
    d = pipe(img, processing_res=res, ensemble_size=ens,
             denoising_steps=steps)         # compile + warmup
    t0 = time.perf_counter()
    d = pipe(img, processing_res=res, ensemble_size=ens,
             denoising_steps=steps)
    dt = time.perf_counter() - t0
    return d, dt, vars_f32


def main():
    small = os.environ.get("BENCH_SMALL", "0") == "1"
    res = 128 if small else 768
    ens = 2 if small else 5
    steps = 2 if small else 12
    h, w = (96, 128) if small else (576, 768)
    rng = np.random.default_rng(0)
    img = rng.random((h, w, 3)).astype(np.float32)

    d32, t32, vars_f32 = run_once("float32", img, res, ens, steps)
    # same weights for the mixed run (set_variables applies the bf16 cast)
    d16, t16, _ = run_once("bfloat16", img, res, ens, steps,
                           variables=vars_f32)

    drift = np.abs(d32 - d16)
    # depth is in [0,1]; i16 counts = drift * 65535
    print(json.dumps({
        "metric": "marigold_precision_decision",
        "config": f"res{res}_ens{ens}_steps{steps}",
        "f32_s_per_image": round(t32, 2),
        "bf16_mixed_s_per_image": round(t16, 2),
        "speedup": round(t32 / t16, 2),
        "drift_mean": float(np.round(drift.mean(), 6)),
        "drift_p99": float(np.round(np.quantile(drift, 0.99), 6)),
        "drift_max": float(np.round(drift.max(), 6)),
        "drift_mean_i16_counts": round(float(drift.mean()) * 65535, 1),
    }))


if __name__ == "__main__":
    main()
