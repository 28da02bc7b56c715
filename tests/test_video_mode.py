import os

import numpy as np
import pytest
from PIL import Image

from depthmap_tpu.options import GenerationOptions
from depthmap_tpu.pipeline import video_mode as vm


def _make_gif(path, n=5, h=48, w=64):
    rng = np.random.default_rng(0)
    frames = [Image.fromarray((rng.random((h, w, 3)) * 255).astype(np.uint8))
              for _ in range(n)]
    frames[0].save(path, save_all=True, append_images=frames[1:],
                   duration=100, loop=0)
    return frames


def test_open_gif(tmp_path):
    p = str(tmp_path / "in.gif")
    _make_gif(p)
    fps, frames = vm.open_path_as_images(p)
    assert len(frames) == 5
    assert abs(fps - 10.0) < 1e-6


def test_open_directory(tmp_path):
    rng = np.random.default_rng(0)
    d = tmp_path / "frames"
    d.mkdir()
    for i in range(3):
        Image.fromarray((rng.random((16, 16, 3)) * 255).astype(np.uint8)
                        ).save(str(d / f"{i:03d}.png"))
    fps, frames = vm.open_path_as_images(str(d))
    assert len(frames) == 3


def test_process_predictions_global_scaling(rng):
    preds = [rng.normal(size=(8, 8)) + i for i in range(4)]
    out = vm.process_predictions(preds, "none")
    allv = np.stack(out)
    assert abs(allv.min()) < 1e-9 and abs(allv.max() - 1.0) < 1e-9


def test_process_predictions_smoothing(rng):
    preds = [rng.normal(size=(8, 8)) for _ in range(6)]
    out = vm.process_predictions(preds, "experimental")
    assert len(out) == 6
    # smoothing only affects the clamp range; frames keep their identity
    assert not np.allclose(out[0], out[1])


def test_gen_video_end_to_end(tmp_path):
    gif = str(tmp_path / "in.gif")
    _make_gif(gif, n=4)
    out = str(tmp_path / "out")
    inp = GenerationOptions(model_type=6, net_width=64, net_height=64,
                            gen_stereo=True, stereo_fill_algo="naive")
    written = vm.gen_video(gif, out, inp, smoothening="experimental")
    assert len(written) >= 2   # depth video + at least one stereo video
    # depth is a REAL 16-bit AVI (raw Y16 without pyav, FFV1 with), not a
    # latent PNG sequence — re-ingest and check fidelity
    depth_avis = [w for w in written if w.endswith(".avi")]
    assert depth_avis
    fps, back = vm.open_path_as_images(depth_avis[0], maybe_depthvideo=True)
    assert len(back) == 4 and back[0].mode.startswith("I")
    assert np.asarray(back[0], dtype=np.uint16).dtype == np.uint16
    gifs = [w for w in written if w.endswith(".gif")]
    assert gifs


def test_predict_video_depths_multichunk_ragged(rng):
    """Pass 1 with more frames than the chunk size: the pipelined chunked
    path (incl. the padded ragged tail) matches an unchunked batch call
    frame for frame."""
    from depthmap_tpu.pipeline.core import PredictorCache
    n, h, w = 5, 48, 64
    frames = [Image.fromarray((rng.random((h, w, 3)) * 255).astype(np.uint8))
              for _ in range(n)]
    inp = GenerationOptions(model_type=6, net_width=64, net_height=64)
    cache = PredictorCache()
    preds = vm._predict_video_depths(frames, inp, cache, chunk=2)
    assert len(preds) == n
    pred = cache.get(6)
    stack = np.stack([np.asarray(f, np.float32) / 255.0 for f in frames])
    # serial reference with the SAME chunk shapes (incl. the padded tail):
    # identical compiled program -> bit-equal
    want = np.concatenate([
        pred.predict_batch(stack[0:2], 64, 64),
        pred.predict_batch(stack[2:4], 64, 64),
        pred.predict_batch(np.repeat(stack[4:5], 2, axis=0), 64, 64)[:1],
    ])
    if pred.raw_prediction_invert:
        want = -want
    np.testing.assert_array_equal(np.stack(preds), want)


def test_depth_video_roundtrip_fallback(tmp_path):
    """I;16 depth frames -> frames_to_video -> re-ingest: bit-equal.
    Without pyav the encoder falls back to a 16-bit PNG sequence; with pyav
    it writes an FFV1 gray16le AVI (reference video_mode.py:72-84) — both
    paths must round-trip losslessly."""
    from depthmap_tpu.pipeline.video_mode import (frames_to_video,
                                                  open_path_as_images)
    rng = np.random.default_rng(7)
    frames = [Image.fromarray((rng.random((32, 48)) * 65535)
                              .astype(np.uint16), mode="I;16")
              for _ in range(4)]
    written = frames_to_video(12.0, frames, str(tmp_path), "depth")
    assert len(written) == 1
    out = written[0]
    fps, back = open_path_as_images(out, maybe_depthvideo=True)
    assert len(back) == 4
    for orig, got in zip(frames, back):
        np.testing.assert_array_equal(np.asarray(orig, dtype=np.uint16),
                                      np.asarray(got, dtype=np.uint16))


def test_depth_video_ffv1_roundtrip_pyav(tmp_path):
    """Same roundtrip, explicitly through the FFV1 writer (pyav-gated)."""
    pytest.importorskip("av")
    from depthmap_tpu.pipeline.video_mode import (read_depth_video_16,
                                                  write_depth_video_16)
    rng = np.random.default_rng(8)
    frames = [Image.fromarray((rng.random((32, 48)) * 65535)
                              .astype(np.uint16), mode="I;16")
              for _ in range(3)]
    out = str(tmp_path / "d.avi")
    assert write_depth_video_16(frames, 24.0, out)
    fps, back = read_depth_video_16(out)
    assert abs(fps - 24.0) < 1e-6
    for orig, got in zip(frames, back):
        np.testing.assert_array_equal(np.asarray(orig, dtype=np.uint16),
                                      np.asarray(got, dtype=np.uint16))


def test_color_video_codec_chain_gated(tmp_path):
    """Color encode goes through the reference codec priority chain when
    pyav exists; otherwise falls back to GIF (still written)."""
    from depthmap_tpu.pipeline.video_mode import frames_to_video
    rng = np.random.default_rng(9)
    frames = [Image.fromarray((rng.random((32, 48, 3)) * 255)
                              .astype(np.uint8)) for _ in range(3)]
    written = frames_to_video(10.0, frames, str(tmp_path), "color")
    assert written
    try:
        import av  # noqa: F401
        assert written[0].endswith((".avi", ".mp4", ".webm"))
    except ImportError:
        assert written[0].endswith(".gif")


def test_video_stereo_fill_is_canonical_single_image_path(tmp_path, rng):
    """Weak-#6 (r2): video frames must take the SAME fill implementation as
    single images — the canonical sequential host fill for
    naive_interpolating (and the host polylines kernel for polylines_*),
    not the batched device approximation (which deviates on re-entrant
    pixels and is bench-only, ops/stereo.py:123-128).  Pinned by driving
    gen_video with a custom depthmap and asserting frame-level byte
    equality with per-image create_stereoimages."""
    from depthmap_tpu.ops.stereo import create_stereoimages
    from depthmap_tpu.options import GenerationOptions
    from depthmap_tpu.pipeline.video_mode import (frames_to_video, gen_video,
                                                  open_path_as_images)

    H, W = 32, 48
    n = 3
    frames_dir = tmp_path / "frames"
    depth_dir = tmp_path / "depths"
    frames_dir.mkdir()
    depth_dir.mkdir()
    imgs, depths = [], []
    for i in range(n):
        img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        d = (rng.random((H, W)) * 65535).astype(np.uint16)
        imgs.append(img)
        depths.append(d)
        Image.fromarray(img).save(frames_dir / f"f{i:03d}.png")
        Image.fromarray(d).save(depth_dir / f"f{i:03d}.png")

    inp = GenerationOptions(gen_stereo=True, model_type=6,
                            stereo_modes=["left-right"],
                            stereo_fill_algo="naive_interpolating",
                            do_output_depth=False)
    out_dir = tmp_path / "out"
    # capture the derived frames BEFORE the codec chain (the GIF fallback
    # palette-quantizes; the claim under test is the fill path, not codecs)
    captured = {}

    def record(fps, frames, path, basename, bitrate=None):
        captured[basename] = [np.asarray(f.convert("RGB")) for f in frames]
        return [str(out_dir / f"{basename}.fake")]

    import depthmap_tpu.pipeline.video_mode as VM
    monkeypatch = pytest.MonkeyPatch()
    monkeypatch.setattr(VM, "frames_to_video", record)
    try:
        gen_video(str(frames_dir), str(out_dir), inp,
                  custom_depthmap=str(depth_dir))
    finally:
        monkeypatch.undo()
    stereo_frames = [v for k, v in captured.items() if "left-right" in k]
    assert stereo_frames, captured.keys()
    video_frames = stereo_frames[0]
    assert len(video_frames) == n

    for i in range(n):
        # replicate the funnel's depth plumbing: custom ingest /2^16
        # (core.py _ingest_custom_depthmap, no min-max for custom maps),
        # clip + i16 quantize — create_stereoimages receives that uint16 map
        d = depths[i].astype(np.float64) / 65536.0
        i16 = np.asarray(
            np.round(np.clip(d, 0, 1) * 65535)).astype(np.uint16)
        expect = create_stereoimages(
            imgs[i], i16, divergence=2.5, separation=0.0,
            modes=["left-right"],
            fill_technique="naive_interpolating")[0]
        np.testing.assert_array_equal(video_frames[i], expect)
