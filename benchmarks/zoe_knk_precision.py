#!/usr/bin/env python
"""ZoeDepth k / nk precision decision (VERDICT r4 #7).

Applies the zoedepth_n methodology (PARITY round 3) to zoedepth_k (8) and
zoedepth_nk (9): measure throughput and eval-oracle drift for
  * f32          — full precision oracle,
  * bf16 (ship)  — the current default, mirroring the reference's .half()
                   policy for these types (depthmap_generation.py:262-276),
  * selective    — bf16 relative-depth core, f32 metric head
                   (DEPTHMAP_ZOE_KNK_HEAD_F32=1),
all sharing ONE set of random-init weights so drift is purely dtype.
Prints one JSON line with fps + a1/abs_rel/rel-drift stats per config.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fps(pred, x, iters=4):
    import jax.numpy as jnp
    xs = [jnp.asarray(x + np.float32(i) * np.float32(1e-3))
          for i in range(iters)]
    h, w = x.shape[1:3]
    net = (pred.spec.default_net_size[1], pred.spec.default_net_size[0])
    out = pred._apply(xs[0], h, w, net)
    _ = np.asarray(out[0, :1, :1])
    best = 1e9
    for _t in range(2):
        t0 = time.perf_counter()
        outs = [pred._apply(xi, h, w, net) for xi in xs]
        _ = np.asarray(outs[-1][0, :1, :1])
        best = min(best, time.perf_counter() - t0)
    # fps measured on iteration 0's input so the drift compare below sees
    # identical inputs across configs
    return x.shape[0] * iters / best, np.asarray(pred._apply(xs[0], h, w,
                                                             net))


def main():
    import jax.numpy as jnp
    from depthmap_tpu.pipeline.depth import DepthPredictor
    from depthmap_tpu.utils import metrics

    small = os.environ.get("BENCH_SMALL", "0") == "1"
    batch = 2 if small else 8
    rows = []
    for mid in (8, 9):
        base = DepthPredictor(mid, compute_dtype=jnp.float32)
        params = base.variables   # f32 tree, shared by all configs
        w_net, h_net = base.spec.default_net_size
        rng = np.random.default_rng(0)
        x = rng.random((batch, h_net, w_net, 3)).astype(np.float32)

        def run_cfg(tag, env=None, val="1", dtype=None):
            prev = os.environ.get(env) if env else None
            if env:
                os.environ[env] = val
            try:
                pred = DepthPredictor(mid, params=params,
                                      compute_dtype=dtype)
                xs_fps, out = _fps(pred, x)
                fps = xs_fps
            finally:
                if env:
                    if prev is None:
                        del os.environ[env]
                    else:
                        os.environ[env] = prev
            return fps, out.astype(np.float64)

        fps32, ref = run_cfg("f32", dtype=jnp.float32)
        # selective became the no-env default (round 5), so whole-model
        # bf16 (the reference's .half() policy) needs the explicit opt-out
        fpsbf, obf = run_cfg("bf16_full", env="DEPTHMAP_ZOE_KNK_HEAD_F32",
                             val="0")
        fpssel, osel = run_cfg("selective", env="DEPTHMAP_ZOE_KNK_HEAD_F32")

        def drift(o):
            m = metrics.compute_metrics(
                ref, o, min_depth_eval=float(ref.min()) * 0.5 + 1e-6,
                max_depth_eval=float(ref.max()) * 2.0 + 1e-3)
            rel = np.abs(o - ref) / np.maximum(np.abs(ref), 1e-6)
            return {"a1": round(float(m["a1"]), 4),
                    "abs_rel_pct": round(100 * float(m["abs_rel"]), 3),
                    "rel_mean_pct": round(100 * float(rel.mean()), 3),
                    "rel_p99_pct": round(
                        100 * float(np.percentile(rel, 99)), 3),
                    "rel_max_pct": round(100 * float(rel.max()), 3)}

        rows.append({"model": base.spec.name,
                     "fps_f32": round(fps32, 2),
                     "fps_bf16_full": round(fpsbf, 2),
                     "fps_selective": round(fpssel, 2),
                     "drift_bf16_full": drift(obf),
                     "drift_selective": drift(osel)})
    print(json.dumps({"metric": "zoe_knk_precision", "rows": rows}))


if __name__ == "__main__":
    main()
