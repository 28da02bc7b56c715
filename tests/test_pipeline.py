import os

import numpy as np
import pytest
from PIL import Image

from depthmap_tpu.options import GenerationOptions
from depthmap_tpu.pipeline.core import core_generation_funnel
from depthmap_tpu.pipeline.preprocess import resize_get_size


def _img(rng, h=64, w=80):
    return Image.fromarray((rng.random((h, w, 3)) * 255).astype(np.uint8))


def test_resize_get_size_semantics():
    # upper_bound keeps AR, multiple of 32, no larger than target
    w, h = resize_get_size(640, 480, 256, 256, "upper_bound", True, 32)
    assert w <= 256 or h <= 256
    assert w % 32 == 0 and h % 32 == 0
    # lower_bound at least as large
    w, h = resize_get_size(640, 480, 256, 256, "lower_bound", True, 32)
    assert w >= 256 and h >= 256
    # minimal scales least
    w, h = resize_get_size(300, 300, 256, 256, "minimal", True, 32)
    assert w == h  # square stays square


def test_funnel_depth_only(rng, tmp_path):
    inp = GenerationOptions(model_type=6, net_width=64, net_height=64)
    results = list(core_generation_funnel(
        str(tmp_path), [_img(rng)], None, ["a"], inp))
    types = [t for _, t, _ in results]
    assert types == ["depth"]
    depth = results[0][2]
    assert depth.mode.startswith("I;16") or depth.mode == "I"
    assert depth.size == (80, 64)


def test_funnel_all_outputs(rng, tmp_path):
    inp = GenerationOptions(model_type=6, net_width=64, net_height=64,
                            gen_stereo=True, stereo_fill_algo="naive",
                            gen_normalmap=True, gen_heatmap=True,
                            gen_simple_mesh=True)
    results = list(core_generation_funnel(
        str(tmp_path), [_img(rng)], None, ["a"], inp))
    types = [t for _, t, _ in results]
    assert "depth" in types
    assert "left-right" in types and "red-cyan-anaglyph" in types
    assert "normalmap" in types and "heatmap" in types
    assert "simple_mesh" in types
    mesh_path = [r for _, t, r in results if t == "simple_mesh"][0]
    assert os.path.exists(mesh_path)
    head = open(mesh_path).read(400)
    assert head.splitlines()[1].startswith("v ")


def test_funnel_custom_depthmap(rng, tmp_path):
    img = _img(rng)
    dm = Image.fromarray((rng.random((64, 80)) * 65535).astype(np.uint16),
                         mode="I;16")
    inp = GenerationOptions(model_type=6)
    results = list(core_generation_funnel(
        str(tmp_path), [img], [dm], ["a"], inp))
    assert results[0][1] == "depth"


def test_funnel_options_dict_input(rng, tmp_path):
    results = list(core_generation_funnel(
        str(tmp_path), [_img(rng)], None, ["a"],
        {"MODEL_TYPE": 6, "NET_WIDTH": 64, "NET_HEIGHT": 64,
         "DO_OUTPUT_DEPTH": True, "unknown_junk": 42}))
    assert results[0][1] == "depth"


def test_funnel_combine_axis(rng, tmp_path):
    inp = GenerationOptions(model_type=6, net_width=64, net_height=64,
                            output_depth_combine=True)
    results = list(core_generation_funnel(
        str(tmp_path), [_img(rng)], None, ["a"], inp))
    assert results[0][1] == "concat_depth"
    assert results[0][2].size == (160, 64)  # horizontal concat


def test_funnel_depth_anything_v2_small(rng, tmp_path):
    """Drive the funnel through the DA2 family (the reference default is
    DA2; vits keeps the test fast) — exercises the mult-of-14 lower_bound
    preprocessing and bilinear align_corners=True upsample."""
    inp = GenerationOptions(model_type=12, net_width=56, net_height=56)
    results = list(core_generation_funnel(
        str(tmp_path), [_img(rng, 60, 80)], None, ["a"], inp))
    assert results[0][1] == "depth"
    assert results[0][2].size == (80, 60)


def test_funnel_ops_plumbing(rng, tmp_path):
    """Environment-level settings (reference backbone.gather_ops) must reach
    the engines: boost_rmax -> BoostEngine.estimate's whole_size_threshold,
    marigold knobs -> the predictor cache kwargs."""
    import numpy as np
    from depthmap_tpu.pipeline.core import PredictorCache
    seen = {}

    class StubBoost:
        def estimate(self, img, whole_size_threshold=1600):
            seen["rmax"] = whole_size_threshold
            return np.asarray(img)[..., 0].astype("float32")

    class Cache(PredictorCache):
        def get_boost(self, model_type, weights_dir="./models", **kw):
            seen["kw"] = kw
            return StubBoost()

    inp = GenerationOptions(model_type=6, boost=True,
                            net_width=64, net_height=64)
    results = list(core_generation_funnel(
        str(tmp_path), [_img(rng)], None, ["a"], inp,
        ops={"boost_rmax": 320, "marigold_steps": 7},
        predictor_cache=Cache()))
    assert seen["rmax"] == 320
    assert seen["kw"]["marigold_steps"] == 7
    assert results[0][1] == "depth"


def test_funnel_boost_without_pix2pix_weights_fails_loudly(
        rng, tmp_path, monkeypatch):
    """Boost with no merge-net checkpoint must refuse (not silently merge
    through a random-init pix2pix emitting plausible-looking wrong depth);
    DEPTHMAP_ALLOW_RANDOM_PIX2PIX=1 is the explicit opt-out."""
    from depthmap_tpu.pipeline.core import PredictorCache
    monkeypatch.delenv("DEPTHMAP_ALLOW_RANDOM_PIX2PIX", raising=False)
    monkeypatch.delenv("DEPTHMAP_ALLOW_DOWNLOAD", raising=False)
    inp = GenerationOptions(model_type=6, boost=True,
                            net_width=64, net_height=64)
    with pytest.raises(FileNotFoundError, match="pix2pix"):
        list(core_generation_funnel(
            str(tmp_path), [_img(rng)], None, ["a"], inp,
            predictor_cache=PredictorCache()))


def test_funnel_no_half_forces_f32(rng, tmp_path):
    """The reference's no_half op must override the per-model bf16 policy."""
    import jax.numpy as jnp
    from depthmap_tpu.pipeline.core import PredictorCache
    cache = PredictorCache()
    inp = GenerationOptions(model_type=6, net_width=64, net_height=64)
    list(core_generation_funnel(str(tmp_path), [_img(rng)], None, ["a"],
                                inp, ops={"no_half": True},
                                predictor_cache=cache))
    assert cache._predictor.compute_dtype == jnp.dtype("float32")


def test_funnel_rembg_mask_semantics(rng, tmp_path, monkeypatch):
    """Background pixels (pure black, alpha<=0.2 in the rembg output) force
    depth to 0/far IN PLACE — the same array already stored for the 3D
    mesh pass, matching the reference's aliasing (core.py:215-226)."""
    from depthmap_tpu.pipeline import rembg_integration as R
    h, w = 64, 80

    def fake_removal(images, model):
        out = []
        for im in images:
            a = np.asarray(im.convert("RGBA")).copy()
            a[: h // 2] = [0, 0, 0, 0]      # top half = removed background
            out.append(Image.fromarray(a))
        return out

    monkeypatch.setattr(R, "rembg_available", lambda: True)
    monkeypatch.setattr(R, "batched_background_removal", fake_removal)
    inp = GenerationOptions(model_type=6, net_width=64, net_height=64,
                            gen_rembg=True,
                            save_background_removal_masks=True)
    results = list(core_generation_funnel(
        str(tmp_path), [_img(rng)], None, ["a"], inp))
    types = [t for _, t, _ in results]
    assert "background_removed" in types and "foreground_mask" in types
    depth = np.asarray([r for _, t, r in results if t == "depth"][0])
    assert (depth[: h // 2] == 0).all()       # masked to far
    assert depth[h // 2:].max() > 0


def test_funnel_compute_device_cpu(rng, tmp_path):
    """compute_device='CPU' must place prediction on the host backend
    (reference core.py:113-121 device selector)."""
    from depthmap_tpu.pipeline.core import PredictorCache
    cache = PredictorCache()
    inp = GenerationOptions(model_type=6, net_width=64, net_height=64,
                            compute_device="CPU")
    results = list(core_generation_funnel(
        str(tmp_path), [_img(rng)], None, ["a"], inp,
        predictor_cache=cache))
    assert results[0][1] == "depth"
    assert cache._predictor._device is not None
    assert cache._predictor._device.platform == "cpu"


def test_predict_finalized_matches_composed_path(rng):
    """The fused device chain (forward -> finalize -> i16, one download)
    must be bit-identical to the funnel's composed path
    (predict -> finalize_depth -> convert_to_i16)."""
    import jax.numpy as jnp
    from depthmap_tpu.ops import numerics
    from depthmap_tpu.pipeline.depth import DepthPredictor

    pred = DepthPredictor(6, weights_dir="/nonexistent")
    img01 = rng.random((96, 128, 3)).astype(np.float32)
    fused = pred.predict_finalized(img01, 64, 64)
    raw = pred.predict(img01, 64, 64)
    out = np.asarray(numerics.finalize_depth(
        jnp.asarray(raw), invert=pred.raw_prediction_invert))
    composed = np.array(numerics.convert_to_i16(
        jnp.asarray(np.clip(out, 0, 1))))
    assert fused.dtype == np.uint16
    np.testing.assert_array_equal(fused, composed)
    assert fused.flags.writeable

    # clip path too (Range mode)
    fused_c = pred.predict_finalized(img01, 64, 64, clip=True,
                                     clip_mode="Range", clip_far=0.1,
                                     clip_near=0.9)
    out_c = np.asarray(numerics.finalize_depth(
        jnp.asarray(raw), invert=pred.raw_prediction_invert, clip=True,
        clip_mode="Range", clip_far=0.1, clip_near=0.9))
    composed_c = np.array(numerics.convert_to_i16(
        jnp.asarray(np.clip(out_c, 0, 1))))
    np.testing.assert_array_equal(fused_c, composed_c)


def test_funnel_batched_fused_matches_serial(rng, tmp_path, monkeypatch):
    """Same-shape images ride one batched fused dispatch; in f32 the outputs
    (values AND yield order) match the serial path within the i16 quantum,
    including with a custom-depthmap image interleaved.  (In the default
    bf16 policy, batched convs may reassociate by ~1 ULP of the raw
    prediction — the same property predict_batch has always had; pinned by
    the tolerance check below.)"""
    from depthmap_tpu.pipeline.core import PredictorCache
    from depthmap_tpu.pipeline.depth import DepthPredictor

    imgs = [_img(rng) for _ in range(3)]
    depths = [None, Image.fromarray(
        (rng.random((_img(rng).height, _img(rng).width)) * 65535)
        .astype(np.uint16)), None]
    inp = GenerationOptions(model_type=6, net_width=64, net_height=64,
                            do_output_depth=True, gen_heatmap=True)

    def run(forced_serial, dtype_env):
        mp = pytest.MonkeyPatch()
        try:
            if dtype_env:
                mp.setenv("DEPTHMAP_COMPUTE_DTYPE", dtype_env)
            if forced_serial:
                def boom(*a, **k):
                    raise RuntimeError("forced-serial")
                mp.setattr(DepthPredictor, "predict_finalized_batch", boom)
            return [(i, t, np.asarray(r)) for i, t, r in
                    core_generation_funnel(str(tmp_path), imgs, depths,
                                           None, inp,
                                           predictor_cache=PredictorCache())]
        finally:
            mp.undo()

    batched = run(False, "float32")
    serial = run(True, "float32")
    assert [(i, t) for i, t, _ in batched] == [(i, t) for i, t, _ in serial]
    for (bi, bt, bv), (_, _, sv) in zip(batched, serial):
        d = np.abs(bv.astype(np.int64) - sv.astype(np.int64)).max()
        if bt == "depth":
            assert d <= 1, f"{bi}:{bt} f32 diff {d}"
        else:   # heatmap: a 1-count i16 tie can hop a LUT bin
            frac = (np.abs(bv.astype(np.int64) - sv.astype(np.int64)) > 2
                    ).mean()
            assert frac < 0.01, f"{bi}:{bt} f32 LUT drift {frac:.4%}"

    # default bf16 policy: bounded reassociation drift only
    b16 = run(False, None)
    s16 = run(True, None)
    for (bi, bt, bv), (_, _, sv) in zip(b16, s16):
        if bt == "depth":
            d = np.abs(bv.astype(np.int64) - sv.astype(np.int64)).max()
            assert d <= 1500, f"{bi}:{bt} bf16 drift {d} i16 counts"
