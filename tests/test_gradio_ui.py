"""UI parity tests: the full Blocks graph is built with a fake gradio
(gradio itself is optional and absent here) and every GenerationOptions
field must be reachable; run_generate is driven directly for the single /
batch-dir (with depthmap reuse) / error paths."""
from __future__ import annotations

import dataclasses
import os

import numpy as np
import pytest
from PIL import Image

from depthmap_tpu.options import GenerationOptions
from tests import fake_gradio


def _build():
    from depthmap_tpu.frontends.gradio_ui import build_ui
    return build_ui(gr_module=fake_gradio)


def test_blocks_graph_builds_and_covers_all_options():
    demo = _build()
    bundle = demo.depthmap_bundle
    # every GenerationOptions field is bound to a UI component
    # (do_output_depth_prediction is the hidden video-mode-internal flag)
    fields = {f.name for f in dataclasses.fields(GenerationOptions)}
    fields.discard("do_output_depth_prediction")
    missing = fields - set(bundle.names)
    assert missing == set(), missing
    # input-mode components (reference common_ui.py:283-309) exist
    for name in ("depthmap_mode", "depthmap_input_image", "custom_depthmap",
                 "custom_depthmap_img", "image_batch",
                 "depthmap_batch_input_dir", "depthmap_batch_output_dir",
                 "depthmap_batch_reuse", "depthmap_vm_input",
                 "depthmap_vm_custom_checkbox", "depthmap_vm_custom",
                 "depthmap_vm_smoothening_mode",
                 "depthmap_vm_compress_checkbox",
                 "depthmap_vm_compress_bitrate"):
        assert name in bundle.names, name


def test_visibility_rules_fire():
    demo = _build()
    bundle = demo.depthmap_bundle
    # gen_stereo checkbox carries a visible-if rule for the stereo options
    ev = [e for e in bundle["gen_stereo"].events if e["type"] == "change"]
    assert ev, "no change handler on gen_stereo"
    out = ev[0]["fn"](True)
    assert out.get("visible") is True
    out = ev[0]["fn"](False)
    assert out.get("visible") is False
    # boost hides net_size_match and the size sliders
    bev = [e for e in bundle["boost"].events if e["type"] == "change"][0]
    upd = bev["fn"](True, False)
    assert upd[0].get("visible") is False


def test_model_change_updates_net_size():
    demo = _build()
    bundle = demo.depthmap_bundle
    ev = [e for e in bundle["model_type"].events if e["type"] == "change"][0]
    w_upd, h_upd = ev["fn"](1)   # dpt_beit_large_512 -> 512x512
    assert w_upd.get("value") == 512 and h_upd.get("value") == 512
    w_upd, h_upd = ev["fn"](0)   # res101 -> 448x448
    assert w_upd.get("value") == 448


def test_run_generate_single_image(tmp_path):
    from depthmap_tpu.frontends.gradio_ui import run_generate
    img = Image.fromarray(
        (np.random.default_rng(0).random((64, 96, 3)) * 255)
        .astype(np.uint8))
    named = {"depthmap_mode": "0", "depthmap_input_image": img,
             "custom_depthmap": False, "model_type": 6,
             "net_width": 64, "net_height": 64, "save_outputs": True,
             "gen_normalmap": True}
    gallery, mesh_fi, mesh_disp, html = run_generate(
        named, outpath=str(tmp_path))
    assert len(gallery) == 2          # depth + normalmap
    assert mesh_fi is None
    saved = sorted(os.listdir(tmp_path))
    assert any("depth" in f for f in saved), saved
    assert any("normalmap" in f for f in saved), saved


def test_run_generate_batch_dir_with_reuse(tmp_path):
    from depthmap_tpu.frontends.gradio_ui import run_generate
    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    outdir.mkdir()
    rng = np.random.default_rng(1)
    Image.fromarray((rng.random((48, 64, 3)) * 255).astype(np.uint8)).save(
        indir / "a.png")
    # pre-existing (custom/edited) depthmap in the output dir -> reused
    Image.fromarray((rng.random((48, 64)) * 65535).astype(np.uint16)).save(
        outdir / "a-0000.png")
    named = {"depthmap_mode": "2",
             "depthmap_batch_input_dir": str(indir),
             "depthmap_batch_output_dir": str(outdir),
             "depthmap_batch_reuse": True, "model_type": 6,
             "save_outputs": False}
    gallery, _, _, html = run_generate(named, outpath=str(outdir))
    assert len(gallery) == 1   # the reused depthmap, no prediction run


def test_run_generate_error_paths():
    from depthmap_tpu.frontends.gradio_ui import run_generate
    out = run_generate({"depthmap_mode": "0",
                        "depthmap_input_image": None})
    assert "select an input image" in out[3]
    out = run_generate({"depthmap_mode": "0",
                        "depthmap_input_image": Image.new("RGB", (8, 8)),
                        "custom_depthmap": True,
                        "custom_depthmap_img": None})
    assert "Custom depthmap" in out[3]
    out = run_generate({"depthmap_mode": "2",
                        "depthmap_batch_input_dir": ""})
    assert "input directory" in out[3]
    out = run_generate({"depthmap_mode": "2",
                        "depthmap_batch_input_dir": "/tmp/x",
                        "depthmap_batch_output_dir": "/tmp/x"})
    assert "different directories" in out[3]
