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
    assert len(written) >= 2   # depth sequence + at least one stereo video
    # depth png sequence with full 16-bit fidelity
    depth_dirs = [w for w in written if os.path.isdir(w)]
    assert depth_dirs
    files = sorted(os.listdir(depth_dirs[0]))
    assert "fps.txt" in files
    img = Image.open(os.path.join(depth_dirs[0], "000000.png"))
    assert img.mode.startswith("I")
    gifs = [w for w in written if w.endswith(".gif")]
    assert gifs
