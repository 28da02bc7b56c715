#!/usr/bin/env python
"""Stereo throughput benchmark: SBS pairs/sec at 1080p (BASELINE.md metric 2;
the reference computes stereo on CPU with numba, README.md:60)."""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp
    from depthmap_tpu.ops.stereo import apply_stereo_divergence_naive
    from depthmap_tpu.ops.polylines import (_get_lib, _polylines_native)

    rng = np.random.default_rng(0)
    h, w = 1080, 1920
    img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    nd = rng.random((h, w)).astype(np.float32)
    div_px = 2.5 / 100 * w

    results = {}

    # TPU path (naive fill): frames batched (the stereo-video fast path);
    # divergence is a fixed UI constant (the warp window is compiled for it)
    from depthmap_tpu.ops.stereo import stereo_pair_batch
    N = 8
    imgs = jnp.asarray(np.stack(
        [(img.astype(np.int32) + i) % 256 for i in range(N)]).astype(np.uint8))
    nds = jnp.asarray(np.stack([(nd + i * 1e-3) % 1.0 for i in range(N)]))
    best = 0.0
    for trial in range(3):
        l, r = stereo_pair_batch(imgs, nds, div_px, -div_px, 0.0, 0.0, 1.0,
                                 "naive")
        _ = np.asarray(l[0, 0, 0])
        t0 = time.perf_counter()
        l, r = stereo_pair_batch(imgs, nds, div_px, -div_px, 0.0, 0.0, 1.0,
                                 "naive")
        _ = np.asarray(l[0, 0, 0]), np.asarray(r[0, 0, 0])
        best = max(best, N / (time.perf_counter() - t0))
    results["tpu_naive_pairs_per_sec"] = round(best, 2)

    # native polylines (per eye)
    if _get_lib() is not None:
        t0 = time.perf_counter()
        _polylines_native(img, nd.astype(np.float64), div_px, 0, 1.0, True)
        _polylines_native(img, nd.astype(np.float64), -div_px, 0, 1.0, True)
        dt = time.perf_counter() - t0
        results["native_polylines_pairs_per_sec"] = round(1 / dt, 2)

    print(json.dumps({"metric": "stereo_sbs_pairs_per_sec_1080p",
                      "value": results.get("tpu_naive_pairs_per_sec"),
                      "unit": "pairs/sec", "detail": results,
                      "vs_baseline": round(
                          results.get("tpu_naive_pairs_per_sec", 0) / 24, 3)}))


if __name__ == "__main__":
    main()
