"""AUTOMATIC1111 WebUI extension adapter.

Parity surface with reference scripts/depthmap.py: when this package is
dropped into a WebUI `extensions/` folder (or imported by one), `Script`
runs the generation funnel over the images produced by an SD processing run
and registers the `depthmap_script_*` settings (reference :81-99).  Outside
the WebUI the module imports cleanly and `WEBUI_AVAILABLE` is False.
"""
from __future__ import annotations

from typing import Optional

try:
    from modules import images as webui_images          # type: ignore
    from modules import script_callbacks, shared        # type: ignore
    from modules import scripts as webui_scripts        # type: ignore
    WEBUI_AVAILABLE = True
except Exception:
    webui_images = script_callbacks = shared = webui_scripts = None
    WEBUI_AVAILABLE = False

SETTINGS_DEFAULTS = {
    # reference scripts/depthmap.py:81-99 + src/backbone.py:127-137
    "depthmap_script_keepmodels": True,
    "depthmap_script_boost_rmax": 1600,
    "depthmap_script_marigold_ensembles": 5,
    "depthmap_script_marigold_steps": 12,
    "depthmap_script_save_ply": False,
    "depthmap_script_show_3d": True,
    "depthmap_script_show_3d_inpaint": True,
    "depthmap_script_mesh_maxsize": 2048,
    "depthmap_script_gen_heatmap_from_ui": False,
    "depthmap_script_extra_stereomodes": False,
}


def get_opt(name: str, default=None):
    if WEBUI_AVAILABLE and hasattr(shared.opts, name):
        return getattr(shared.opts, name)
    return SETTINGS_DEFAULTS.get(name, default)


if WEBUI_AVAILABLE:
    class Script(webui_scripts.Script):  # pragma: no cover (needs WebUI)
        def title(self):
            return "DepthMap (TPU)"

        def show(self, is_img2img):
            return True

        def ui(self, is_img2img):
            return []

        def run(self, p, *args):
            from modules.processing import process_images  # type: ignore
            from depthmap_tpu.options import GenerationOptions
            from depthmap_tpu.pipeline.core import core_generation_funnel

            processed = process_images(p)
            inp = GenerationOptions()
            outpath = p.outpath_samples
            gen = core_generation_funnel(
                outpath, processed.images, None, None, inp)
            for count, output_type, result in gen:
                try:
                    webui_images.save_image(
                        result, path=outpath, basename="depthmap",
                        suffix=output_type, info=processed.info, p=p)
                except Exception:
                    pass
            return processed

    def _register_api(_demo, app):  # FastAPI app provided by WebUI
        # mount our handlers onto the WebUI FastAPI app
        from depthmap_tpu.frontends import api as tpu_api

        @app.get("/depth/version")
        async def version():
            return {"version": tpu_api.SCRIPT_VERSION}

        @app.get("/depth/get_options")
        async def get_options():
            from depthmap_tpu.options import GenerationOptions
            return {"options": sorted(GenerationOptions.field_names())}

        @app.post("/depth/generate")
        async def generate(payload: dict):
            return tpu_api.handle_generate(payload)

        @app.post("/depth/generate/video")
        async def generate_video(payload: dict):
            return tpu_api.handle_generate_video(payload)

    try:
        script_callbacks.on_app_started(_register_api)
    except Exception:
        pass
