"""Float64 twin-funnel parity driver (run in a SUBPROCESS by
tests/test_funnel_parity_f64.py — `jax_enable_x64` is process-global, so it
must not leak into the regular f32 test session).

Runs one model family end-to-end through BOTH funnels with the float stack
removed: the torch reference model in double precision, our flax model on
float64 twins of the same converted weights (jax x64).  With forward noise
at ~1e-15 instead of f32's ~1e-3, any residual disagreement is a
COMPOSITION defect — this converts the old I16_TOL=1700 "float noise"
justification into a measurement (VERDICT r3 next-#2).

The only remaining f32 quantization points are symmetric or terminal: both
preprocess stacks emit float32 tensors by construction (dmidas
transforms.py semantics), and our predictor's final
`pred.astype(float32)` quantizes a float64 value once, bounding the i16
disagreement at single counts.
"""
from __future__ import annotations

import json
import sys
import tempfile


def main(model_type: int, net: int) -> dict:
    import os
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import numpy as np
    import torch

    import tests.test_reference_funnel_parity as T
    from tests.ref_funnel import import_reference_core, install_model

    ref_core = import_reference_core()
    tm, variables = T._model_parity_case(model_type)
    tm = tm.double()
    variables = jax.tree.map(
        lambda a: np.asarray(a, np.float64)
        if np.asarray(a).dtype == np.float32 else np.asarray(a), variables)

    if model_type == 6:
        # estimatemidas feeds a float32 sample straight into model.forward
        class F64Forward(torch.nn.Module):
            def __init__(self, m):
                super().__init__()
                self.m = m

            def forward(self, x):
                return self.m(x.double())
        tm = F64Forward(tm)
    elif model_type == 0:
        # estimateleres calls model.depth_model(img_torch f32)
        inner = tm.depth_model

        class F64Call(torch.nn.Module):
            def __init__(self, m):
                super().__init__()
                self.m = m

            def forward(self, x):
                return self.m(x.double())
        tm.depth_model = F64Call(inner)
    # model_type 12 (DA2) casts its input to the parameter dtype itself
    # (depthmap_generation.py:554-556)

    install_model(ref_core, model_type, tm)

    rng = np.random.default_rng(0)
    h, w = 100, 140
    img = T._structured_image(rng, h, w)
    inp = {
        "model_type": model_type,
        "net_width": net, "net_height": net,
        "do_output_depth": True,
        "do_output_depth_prediction": True,
    }
    with tempfile.TemporaryDirectory() as td:
        ref = T._by_type(T._run_ref_funnel(
            ref_core, td + "/ref", [img], None, ["a"], inp))
        ours = T._by_type(T._run_our_funnel(
            td + "/ours", [img], None, ["a"], inp,
            cache=T._install_our_predictor(model_type, variables,
                                           compute_dtype="float64")))

    r_raw = np.asarray(ref["depth_prediction"][0], np.float64)
    o_raw = np.asarray(ours["depth_prediction"][0], np.float64)
    span = max(r_raw.max() - r_raw.min(), np.finfo(np.float32).eps)
    rel = np.abs(r_raw - o_raw) / span
    r_i16 = np.asarray(ref["depth"][0]).astype(np.int64)
    o_i16 = np.asarray(ours["depth"][0]).astype(np.int64)
    d = np.abs(r_i16 - o_i16)
    return {
        "raw_rel_max": float(rel.max()),
        "raw_rel_mean": float(rel.mean()),
        "i16_max": int(d.max()),
        "i16_mean": float(d.mean()),
        "shape_ok": bool(r_raw.shape == o_raw.shape
                         and r_i16.shape == o_i16.shape),
    }


if __name__ == "__main__":
    out = main(int(sys.argv[1]), int(sys.argv[2]))
    print("F64TWIN " + json.dumps(out))
