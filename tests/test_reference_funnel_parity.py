"""Whole-pipeline golden parity vs the REFERENCE's own funnel.

Drives the reference `core_generation_funnel` (/root/reference/src/core.py:83)
— its real orchestration, estimate* wrappers, numpy/cv2 derivative stages —
against depthmap_tpu's funnel on identical inputs:

 * composition parity: identical custom 16-bit depthmaps through both
   funnels; every derived output (i16 depth PNG array, stereo uint8 in all
   fill algorithms, normalmap, heatmap) must be BIT-EXACT — this is the
   stage-composition bar (resize -> i16 -> derivatives) at pipeline
   granularity;
 * model-path parity: both funnels end-to-end (reference torch model vs our
   flax model on the SAME converted random weights) for three families
   (midas_v21_small / DA2-small / LeReS); raw predictions and i16 depth must
   agree within float-stack tolerance (bounds quantified; deviations
   documented in PARITY.md §whole-pipeline).

The reference side runs its genuine code: the ModelHolder is only spared the
checkpoint download (tests/ref_funnel.install_model).
"""
from __future__ import annotations

import numpy as np
import pytest
import torch
from PIL import Image

from tests.ref_funnel import import_reference_core, install_model
from tests.torch_ref import randomize_

from depthmap_tpu.options import GenerationOptions
from depthmap_tpu.pipeline.core import PredictorCache, core_generation_funnel
from depthmap_tpu.pipeline.depth import DepthPredictor


def _structured_image(rng, h, w):
    """Natural-ish test card: gradient + blobs (so stereo warps move
    pixels and normals have structure)."""
    yy, xx = np.mgrid[:h, :w].astype(np.float32)
    img = np.stack([xx / w, yy / h, (xx + yy) / (h + w)], -1)
    img = (img * 215).astype(np.uint8)
    img += (rng.random((h, w, 3)) * 40).astype(np.uint8)
    from tests.ref_funnel import sanitize_for_python_fallback
    return Image.fromarray(sanitize_for_python_fallback(img))


def _structured_depth(rng, h, w):
    """Smooth uint16 depth with a tear (foreground blob on background)."""
    yy, xx = np.mgrid[:h, :w].astype(np.float32)
    d = 0.25 + 0.4 * (xx / w)
    d[(yy - h * 0.55) ** 2 + (xx - w * 0.6) ** 2 < (min(h, w) * 0.25) ** 2] \
        = 0.85
    d += rng.random((h, w)).astype(np.float32) * 0.01
    return Image.fromarray((d * 65535).astype(np.uint16), mode="I;16")


def _run_ref_funnel(ref_core, outpath, images, depthmaps, names, inp_dict):
    ops = {"boost_rmax": 1600, "precision": "autocast", "no_half": False,
           "marigold_ensembles": 5, "marigold_steps": 12}
    return list(ref_core.core_generation_funnel(
        str(outpath), list(images), depthmaps, list(names), dict(inp_dict),
        ops=ops))


def _run_our_funnel(outpath, images, depthmaps, names, inp_dict, cache=None):
    return list(core_generation_funnel(
        str(outpath), list(images), depthmaps, list(names),
        GenerationOptions.from_dict(dict(inp_dict)),
        ops={"no_half": True}, predictor_cache=cache))


def _by_type(results):
    out = {}
    for _idx, typ, res in results:
        out.setdefault(typ, []).append(res)
    return out


@pytest.mark.parametrize("fill", ["none", "naive", "naive_interpolating",
                                  "polylines_soft", "polylines_sharp"])
def test_composition_parity_custom_depthmap(rng, tmp_path, fill):
    """Identical custom depthmap -> every derived output bit-exact vs the
    reference funnel (custom ingest core.py:145-174, stereo :250-258,
    normalmap :260-268, heatmap :270-273)."""
    ref_core = import_reference_core()
    h, w = 96, 128
    img = _structured_image(rng, h, w)
    dm = _structured_depth(rng, h, w)

    inp = {
        "do_output_depth": True,
        "gen_stereo": True,
        "stereo_modes": ["left-right", "red-cyan-anaglyph", "top-bottom"],
        "stereo_divergence": 2.5, "stereo_separation": 0.5,
        "stereo_balance": 0.2, "stereo_offset_exponent": 2.0,
        "stereo_fill_algo": fill,
        "gen_normalmap": True,
        "gen_heatmap": True,
    }

    ref = _by_type(_run_ref_funnel(ref_core, tmp_path / "ref", [img], [dm],
                                   ["a"], inp))
    ours = _by_type(_run_our_funnel(tmp_path / "ours", [img], [dm], ["a"],
                                    inp))

    assert set(ref) == set(ours), (set(ref), set(ours))
    for typ in sorted(ref):
        for r, o in zip(ref[typ], ours[typ]):
            ra, oa = np.asarray(r), np.asarray(o)
            assert ra.shape == oa.shape, (typ, ra.shape, oa.shape)
            assert ra.dtype == oa.dtype, (typ, ra.dtype, oa.dtype)
            ndiff = int((ra != oa).sum())
            if typ == "normalmap":
                # enumerated deviation (PARITY.md §whole-pipeline): the
                # reference computes Sobel/normalize in float64
                # (normalmap_generation.py:29-39); TPU-native math is f32,
                # so the uint8 truncation can land one count away on
                # float-tie pixels.  Bound: |d|<=1 on <=0.1% of bytes.
                d = np.abs(ra.astype(np.int64) - oa.astype(np.int64))
                assert d.max() <= 1, f"normalmap max |d|={d.max()}"
                assert ndiff <= ra.size // 1000, \
                    f"normalmap: {ndiff}/{ra.size} tie-pixels"
                continue
            assert ndiff == 0, \
                f"{typ}: {ndiff}/{ra.size} bytes differ " \
                f"(max |d|={np.abs(ra.astype(np.int64) - oa.astype(np.int64)).max()})"


def _install_our_predictor(model_type, variables, compute_dtype="float32"):
    pred = DepthPredictor(model_type, params=variables,
                          compute_dtype=compute_dtype)

    class Cache(PredictorCache):
        def get(self, model_type_, tiling_mode=False, **kw):
            return pred

    return Cache()


def _bump_biases(tm, frac=0.1):
    """Shift every bias positive so the randomized nets don't die through
    their ReLU/non_negative heads (all-zero outputs would hit the funnel's
    broken-depthmap blackout, core.py:206-208, and test nothing)."""
    with torch.no_grad():
        for n, p in tm.named_parameters():
            if n.endswith("bias"):
                p.add_(frac)
    return tm


def _model_parity_case(model_type):
    """(torch_model, converted_variables) on identical random weights."""
    from depthmap_tpu.models.convert import SDict
    if model_type == 6:
        from tests.torch_oracles import OracleMidasSmall
        from depthmap_tpu.models.convert import convert_midas_small
        tm = _bump_biases(randomize_(OracleMidasSmall().eval(), seed=31))
        return tm, convert_midas_small(SDict(tm.state_dict()))
    if model_type == 12:
        from ddepth_anything_v2 import DepthAnythingV2
        from depthmap_tpu.models.convert import convert_da2_small
        tm = _bump_biases(randomize_(DepthAnythingV2(
            encoder="vits", features=64,
            out_channels=[48, 96, 192, 384]).eval(), seed=32))
        return tm, convert_da2_small(SDict(tm.state_dict()))
    if model_type == 0:
        from lib.multi_depth_model_woauxi import RelDepthModel
        from depthmap_tpu.models.convert import convert_leres
        tm = _bump_biases(randomize_(
            RelDepthModel(backbone="resnext101").eval(), seed=33))
        return tm, convert_leres(SDict(tm.state_dict()))
    raise AssertionError(model_type)


# Measured float-stack bounds (PARITY.md §whole-pipeline).  At RANDOM
# weights (no BN/layer statistics of a trained net to damp it), torch-f64ish
# vs XLA-f32 forward noise amplifies through the deep stacks to ~1e-2 of the
# prediction range at isolated pixels (mean ~3e-3); measured across seeds.
# The bound's job is to catch COMPOSITION bugs (a channel swap measured
# 8.7e-2 max; wrong interp modes are similar) while tolerating forward
# float noise — per-family numerics are pinned tightly (atol 2e-4..3e-3) by
# the dedicated forward-parity tests, and everything downstream of the model
# is bit-exact per test_composition_parity_custom_depthmap.
I16_TOL = 1700          # = 2.6% of the 16-bit range, at isolated pixels
I16_MEAN_TOL = 400
RAW_RANGE_TOL = 2.5e-2
RAW_RANGE_MEAN_TOL = 5e-3


@pytest.mark.parametrize("model_type,net",
                         [(6, 64), (12, 112), (0, 128)],
                         ids=["midas_v21_small", "da2_small", "leres"])
def test_model_path_parity(rng, tmp_path, model_type, net):
    """Both funnels end-to-end on the same converted weights: reference
    estimate* wrapper composition (depthmap_generation.py:375-560) vs our
    DepthPredictor.  Raw predictions within RAW_RANGE_TOL of the range,
    i16 depth within I16_TOL counts."""
    ref_core = import_reference_core()
    tm, variables = _model_parity_case(model_type)
    install_model(ref_core, model_type, tm)

    h, w = 100, 140
    img = _structured_image(rng, h, w)
    inp = {
        "model_type": model_type,
        "net_width": net, "net_height": net,
        "do_output_depth": True,
        "do_output_depth_prediction": True,
    }

    ref = _by_type(_run_ref_funnel(ref_core, tmp_path / "ref", [img], None,
                                   ["a"], inp))
    ours = _by_type(_run_our_funnel(
        tmp_path / "ours", [img], None, ["a"], inp,
        cache=_install_our_predictor(model_type, variables)))

    r_raw = np.asarray(ref["depth_prediction"][0], np.float64)
    o_raw = np.asarray(ours["depth_prediction"][0], np.float64)
    assert r_raw.shape == o_raw.shape
    rng_span = max(r_raw.max() - r_raw.min(), np.finfo(np.float32).eps)
    rel = np.abs(r_raw - o_raw) / rng_span
    assert rel.max() < RAW_RANGE_TOL, \
        f"raw prediction range-relative diff {rel.max():.2e}"
    assert rel.mean() < RAW_RANGE_MEAN_TOL, \
        f"raw prediction mean range-relative diff {rel.mean():.2e}"

    r_i16 = np.asarray(ref["depth"][0]).astype(np.int64)
    o_i16 = np.asarray(ours["depth"][0]).astype(np.int64)
    d = np.abs(r_i16 - o_i16)
    assert d.max() <= I16_TOL, f"i16 max diff {d.max()}"
    assert np.mean(d) <= I16_MEAN_TOL, f"i16 mean diff {np.mean(d):.2f}"
