"""TPU certification sweep: every model family (ids 0-14) builds, compiles
and runs one forward at its DEFAULT production net size on real hardware.

CPU tests cannot catch TPU-only failures (Mosaic scoped-vmem overflows,
HBM limits — e.g. the f32 flash-attention whole-row tile that crashed
ZoeDepth-N compilation); this sweep certifies the whole zoo on-chip.
Last full run (single v5e, round 2): 15/15 OK, see PARITY.md.

Usage: python benchmarks/family_sweep.py   (from the repo root; ~20 min)
"""
import os, sys, time, traceback
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from depthmap_tpu.pipeline.depth import DepthPredictor
from depthmap_tpu.registry import MODELS

rng = np.random.default_rng(0)
img = rng.random((384, 512, 3)).astype(np.float32)
results = {}
for mid in range(15):
    t0 = time.perf_counter()
    try:
        kw = {}
        if mid == 10:
            kw = {"marigold_ensembles": 2, "marigold_steps": 2}
        pred = DepthPredictor(mid, **kw)
        nw, nh = pred.spec.default_net_size
        out = pred.predict(img, nw, nh)
        assert out.shape == img.shape[:2] and np.isfinite(out).all()
        results[mid] = f"OK {time.perf_counter()-t0:.0f}s net={nw}x{nh}"
    except Exception as e:
        results[mid] = f"FAIL {type(e).__name__}: {str(e)[:160]}"
    print(f"[{mid:2d}] {MODELS[mid].name}: {results[mid]}", flush=True)
    del pred
n_fail = sum("FAIL" in v for v in results.values())
print(f"SWEEP DONE: {15 - n_fail}/15 OK", flush=True)
