"""WebUI adapter tests with fake `modules.*`: Script.ui builds the full
option panel, Script.run executes the funnel with NON-default options from
the panel and embeds PNG infotext via create_infotext (VERDICT r1 #7)."""
from __future__ import annotations

import types

import numpy as np
import pytest
from PIL import Image

from tests import fake_gradio


class _Opts:
    return_grid = False
    enable_pnginfo = True
    samples_format = "png"


class _Processed:
    def __init__(self, images):
        self.images = list(images)
        self.all_prompts = ["a prompt"] * len(images)
        self.all_seeds = [1234] * len(images)
        self.all_subseeds = [0] * len(images)
        self.info = "info"


def _make_fake_modules(saved):
    modules = types.ModuleType("modules")
    processing = types.ModuleType("modules.processing")
    shared = types.ModuleType("modules.shared")
    images_mod = types.ModuleType("modules.images")

    def process_images(p):
        return _Processed(p.images)

    infotexts = []

    def create_infotext(p, prompts, seeds, subseeds, extra, pos, i):
        text = f"prompt={prompts[i]}, seed={seeds[i]}"
        infotexts.append(text)
        return text

    def save_image(img, path=None, basename="", seed=None, prompt=None,
                   extension="png", info=None, p=None, suffix=""):
        saved.append({"suffix": suffix, "info": info, "mode": img.mode})

    processing.process_images = process_images
    processing.create_infotext = create_infotext
    shared.opts = _Opts()
    images_mod.save_image = save_image
    modules.processing = processing
    modules.shared = shared
    modules.images = images_mod
    modules._infotexts = infotexts
    return modules


def test_script_ui_builds_full_panel():
    from depthmap_tpu.frontends.webui_script import DepthmapScriptLogic
    s = DepthmapScriptLogic()
    comps = s.ui(is_img2img=False, gr_module=fake_gradio)
    assert len(comps) > 30
    # the inpainted-mesh option is depth-tab-only (reference passes False)
    assert "gen_inpainted_mesh" not in s._bundle.names
    assert "gen_stereo" in s._bundle.names
    assert "save_outputs" in s._bundle.names


def test_script_run_with_non_default_options(tmp_path):
    from depthmap_tpu.frontends.webui_script import DepthmapScriptLogic
    saved = []
    modules = _make_fake_modules(saved)

    s = DepthmapScriptLogic()
    s.ui(is_img2img=False, gr_module=fake_gradio)

    # values in panel order, overriding a few defaults: model 6
    # (midas_v21_small), normalmap ON, save ON
    values = []
    for name in s._bundle.names:
        comp = s._bundle[name]
        v = comp.value
        if name == "model_type":
            v = 6
        elif name == "gen_normalmap":
            v = True
        elif name in ("net_width", "net_height"):
            v = 64
        values.append(v)

    p = types.SimpleNamespace(
        outpath_samples=str(tmp_path), sampler="Euler", tiling=False,
        images=[Image.fromarray(
            (np.random.default_rng(0).random((48, 64, 3)) * 255)
            .astype(np.uint8))])

    processed = s.run(p, *values, modules_ns=modules)
    # depth + normalmap appended to processed.images and saved with infotext
    assert len(processed.images) == 3
    assert len(saved) == 2
    suffixes = {d["suffix"] for d in saved}
    assert suffixes == {"", "normalmap"}
    assert all(d["info"] and "seed=1234" in d["info"] for d in saved)
    assert modules._infotexts, "create_infotext was not called"


def test_script_run_skips_grid_image(tmp_path):
    from depthmap_tpu.frontends.webui_script import DepthmapScriptLogic
    saved = []
    modules = _make_fake_modules(saved)
    modules.shared.opts.return_grid = True

    s = DepthmapScriptLogic()
    s.ui(is_img2img=False, gr_module=fake_gradio)
    values = []
    for name in s._bundle.names:
        v = s._bundle[name].value
        if name == "model_type":
            v = 6
        elif name in ("net_width", "net_height"):
            v = 64
        values.append(v)

    rng = np.random.default_rng(1)
    imgs = [Image.fromarray((rng.random((48, 64, 3)) * 255)
                            .astype(np.uint8)) for _ in range(3)]
    p = types.SimpleNamespace(outpath_samples=str(tmp_path), sampler=None,
                              tiling=None, images=imgs)
    s.run(p, *values, modules_ns=modules)
    # 3 processed images, first treated as grid -> 2 depth outputs saved
    assert len(saved) == 2
