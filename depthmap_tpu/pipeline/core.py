"""The generation funnel: image(s) -> depth -> all derived outputs.

API-parity with the reference ``core_generation_funnel``
(src/core.py:83-349): a generator yielding (input_index, output_type, result)
tuples so every frontend (CLI, Gradio, REST, video mode) can stream results.
The compute inside is TPU-native: prediction, clip/renormalize, i16
conversion, stereo and normal maps are jitted JAX programs.

Unlike the reference there is no module-global model holder; a
``PredictorCache`` is passed (or created) explicitly.
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, List, Optional, Tuple

import numpy as np
from PIL import Image

from depthmap_tpu.options import GenerationOptions
from depthmap_tpu.ops import numerics
from depthmap_tpu.ops.heatmap import colorize
from depthmap_tpu.ops.normalmap import create_normalmap
from depthmap_tpu.ops.stereo import create_stereoimages
from depthmap_tpu.pipeline.depth import DepthPredictor
from depthmap_tpu.registry import resolve_model_type

import jax.numpy as jnp


class PredictorCache:
    """Keeps the last predictor alive across funnel invocations (the
    reference keeps models resident between runs; src/core.py:41,330-336)."""

    def __init__(self):
        self._predictor: Optional[DepthPredictor] = None
        self._boost = None
        self._kw: Optional[dict] = None

    def get(self, model_type, tiling_mode: bool = False,
            **kw) -> DepthPredictor:
        mt = resolve_model_type(model_type)
        # marigold knobs only shape the type-10 predictor; ignore them in
        # the rebuild decision elsewhere (a changed slider must not evict a
        # compiled BEiT)
        eff_kw = kw if mt == 10 else \
            {k: v for k, v in kw.items() if not k.startswith("marigold_")}
        if self._predictor is None or self._predictor.model_type != mt or \
                self._predictor.tiling_mode != tiling_mode or \
                self._kw != eff_kw:
            self._predictor = DepthPredictor(mt, tiling_mode=tiling_mode,
                                             **eff_kw)
            self._kw = eff_kw
            self._boost = None
        return self._predictor

    def release(self):
        """Drop model references so device buffers free (the reference's
        unload path, core.py:330-336, gated by the keepmodels option)."""
        self._predictor = None
        self._boost = None
        self._kw = None

    def get_boost(self, model_type, weights_dir: str = "./models", **kw):
        from depthmap_tpu.pipeline.boost import BoostEngine
        predictor = self.get(model_type, **kw)
        if self._boost is None:
            self._boost = BoostEngine(
                predictor,
                pix2pix_variables=self._load_pix2pix(weights_dir))
        return self._boost

    @staticmethod
    def _load_pix2pix(weights_dir: str):
        """Converted merge-net weights when the checkpoint is on disk
        (reference always downloads latest_net_G.pth for Boost,
        depthmap_generation.py:288-301); None -> random init (weights
        unavailable in this deployment)."""
        import os
        path = os.path.join(weights_dir, "pix2pix", "latest_net_G.pth")
        if not os.path.exists(path) and \
                os.environ.get("DEPTHMAP_ALLOW_DOWNLOAD") == "1":
            try:
                from depthmap_tpu.utils.download import \
                    ensure_pix2pix_downloaded
                path = ensure_pix2pix_downloaded(weights_dir)
            except Exception as e:
                print(f"pix2pix download failed ({e}); "
                      "Boost merge quality will be degraded")
        if os.path.exists(path):
            import torch
            from depthmap_tpu.models.convert import SDict, convert_pix2pix
            sd = SDict(torch.load(path, map_location="cpu",
                                  weights_only=True))
            return convert_pix2pix(sd)
        advice = ("pix2pix merge-net weights not found: Boost would merge "
                  "through a random-init net and emit plausible-looking but "
                  "wrong depth.  Set DEPTHMAP_ALLOW_DOWNLOAD=1 or place "
                  f"latest_net_G.pth under {weights_dir}/pix2pix/ "
                  "(reference download: depthmap_generation.py:288-301).  "
                  "Set DEPTHMAP_ALLOW_RANDOM_PIX2PIX=1 to run anyway "
                  "(tests/benchmarks only).")
        if os.environ.get("DEPTHMAP_ALLOW_RANDOM_PIX2PIX") == "1":
            print("warning: " + advice)
            return None
        raise FileNotFoundError(advice)

    def unload(self):
        self._predictor = None
        self._boost = None


_default_cache = PredictorCache()


def _ingest_custom_depthmap(dp, target_w: int, target_h: int) -> np.ndarray:
    """Reference custom-depthmap ingest (src/core.py:145-174): resize with
    LANCZOS, 8/16/32-bit autodetect for single-channel, /256 for RGB."""
    if isinstance(dp, Image.Image):
        if dp.width != target_w or dp.height != target_h:
            try:
                dp = dp.resize((target_w, target_h), Image.Resampling.LANCZOS)
            except Exception:
                dp = dp.resize((target_w, target_h))
        if len(dp.getbands()) == 1:
            out = np.asarray(dp, dtype="float")
            out_max = out.max()
            if out_max < 256:
                bit_depth = 8
            elif out_max < 65536:
                bit_depth = 16
            else:
                bit_depth = 32
            out = out / (2.0 ** bit_depth)
        else:
            out = np.asarray(dp, dtype="float")[:, :, 0] / 256.0
    else:
        out = np.asarray(dp, dtype="float")
        assert out.shape[0] == target_h, "Custom depthmap height mismatch"
        assert out.shape[1] == target_w, "Custom depthmap width mismatch"
    return out


def _funnel_net_size(inp, w: int, h: int):
    """Net size for one image: the UI's net-size-match rounds the source
    dims up to multiples of 32 (reference common_ui.py net size logic);
    otherwise the explicit sliders apply.  Single source of truth for the
    serial loop AND the batched pre-pass."""
    if inp.net_size_match:
        return (w + 31) // 32 * 32, (h + 31) // 32 * 32
    return inp.net_width, inp.net_height


def core_generation_funnel(outpath: Optional[str], inputimages: List,
                           inputdepthmaps: Optional[List] = None,
                           inputnames: Optional[List] = None,
                           inp: Any = None,
                           ops: Optional[Dict] = None,
                           predictor_cache: Optional[PredictorCache] = None):
    """Yields (index, output_type, result).  Result types mirror the
    reference: 'depth' (PIL I;16), 'concat_depth', 'depth_prediction' (raw
    np), stereo mode names, 'normalmap', 'heatmap', 'simple_mesh'."""
    if len(inputimages) == 0 or inputimages[0] is None:
        return
    if inputdepthmaps is None or len(inputdepthmaps) == 0:
        inputdepthmaps = [None] * len(inputimages)
    inputdepthmaps_complete = all(x is not None for x in inputdepthmaps)
    inp = GenerationOptions.from_dict(inp if inp is not None else {})
    cache = predictor_cache or _default_cache

    # environment-level settings (reference backbone.gather_ops defaults,
    # backbone.py:132-137; WebUI settings panel feeds these through
    # webui_script.Script.run)
    ops = ops or {}
    boost_rmax = int(ops.get("boost_rmax", 1600))
    predictor_kw = {
        "marigold_ensembles": int(ops.get("marigold_ensembles", 5)),
        "marigold_steps": int(ops.get("marigold_steps", 12)),
    }
    if ops.get("no_half"):
        # reference no_half forces full precision everywhere
        # (backbone.py:134, depthmap_generation.py:262); here it overrides
        # the per-model bf16 policy
        predictor_kw["compute_dtype"] = "float32"
    if str(getattr(inp, "compute_device", "GPU")).upper() == "CPU":
        # the funnel's device selector (reference core.py:113-121):
        # CPU forces host compute
        predictor_kw["device"] = "cpu"

    background_removed_images = []
    if inp.gen_rembg:
        from depthmap_tpu.pipeline.rembg_integration import (
            batched_background_removal, rembg_available)
        if not rembg_available():
            print("rembg is not installed; skipping background removal")
            inp = inp.replace(gen_rembg=False)
        elif inp.pre_depth_background_removal:
            inputimages = batched_background_removal(
                [_as_pil(i) for i in inputimages], inp.rembg_model)
            background_removed_images = inputimages
        else:
            background_removed_images = batched_background_removal(
                [_as_pil(i) for i in inputimages], inp.rembg_model)

    predictor = None
    if not inputdepthmaps_complete:
        predictor = cache.get(inp.model_type, tiling_mode=inp.tiling_mode,
                              **predictor_kw)

    inpaint_imgs = []
    inpaint_depths = []

    # Batched fused fast path (TPU-first: batching is first-class): images
    # that share a shape and need no host-side raw map ride ONE batched
    # forward + finalize + i16 dispatch instead of N serial ones.  Equal to
    # the serial path up to conv-batching reassociation in the compute
    # dtype (f32: within the i16 quantum; bf16: ~1 ULP, same property the
    # video path's predict_batch has always had — pinned in
    # test_funnel_batched_fused_matches_serial).  Any failure falls back to
    # the serial path, which re-raises with the funnel's OOM advice.
    # DEPTHMAP_FUNNEL_BATCH<2 disables the pre-pass.
    fused_batch: Dict[int, np.ndarray] = {}
    rgb_cache: Dict[int, np.ndarray] = {}
    fused_eligible = (predictor is not None and not inp.boost
                      and not inp.do_output_depth_prediction
                      and not inp.gen_simple_mesh
                      and len(inputimages) > 1)
    if fused_eligible:
        import os
        chunk = int(os.environ.get("DEPTHMAP_FUNNEL_BATCH", "8"))
        # bound the pre-pass's host footprint (RGB cache + i16 maps held
        # until the consumer loop pops them); past the cap the serial loop
        # streams one image at a time instead
        max_bytes = int(os.environ.get("DEPTHMAP_FUNNEL_BATCH_MAX_BYTES",
                                       str(1 << 30)))
        total = sum(5 * im.height * im.width if isinstance(im, Image.Image)
                    else 5 * np.asarray(im).shape[0] * np.asarray(im).shape[1]
                    for im in inputimages)     # 3 B rgb + 2 B i16 per px
        groups: Dict[Tuple[int, int], list] = {}
        if chunk >= 2 and total <= max_bytes:
            for count, image in enumerate(inputimages):
                if inputdepthmaps[count] is not None:
                    continue
                arr = np.asarray(_to_rgb(image))
                rgb_cache[count] = arr
                groups.setdefault(arr.shape[:2], []).append((count, arr))
        try:
            # pipelined: keep one chunk's forward in flight while the
            # previous chunk's uint16 maps download (same overlap the video
            # pass-1 stream uses)
            pending = None     # (part, device uint16 stack) or None

            def _drain(p):
                part_, dev_ = p
                for (idx, _), m16 in zip(part_, np.asarray(dev_)):
                    fused_batch[idx] = np.array(m16)

            for (h, w), members in groups.items():
                if len(members) < 2:
                    continue
                nw_, nh_ = _funnel_net_size(inp, w, h)
                for i in range(0, len(members), chunk):
                    part = members[i:i + chunk]
                    stack = np.stack([m[1] for m in part]).astype(
                        np.float32) / 255.0
                    if predictor.model_type == 10:   # Marigold: no single
                        # jittable forward; the serial fallback inside
                        # predict_finalized_batch handles it
                        for (idx, _), m16 in zip(
                                part, predictor.predict_finalized_batch(
                                    stack, nw_, nh_, clip=inp.clipdepth,
                                    clip_mode=inp.clipdepth_mode,
                                    clip_far=inp.clipdepth_far,
                                    clip_near=inp.clipdepth_near)):
                            fused_batch[idx] = np.array(m16)
                        continue
                    dev = predictor._dispatch_finalized_batch(
                        stack, nw_, nh_, clip=inp.clipdepth,
                        clip_mode=inp.clipdepth_mode,
                        clip_far=inp.clipdepth_far,
                        clip_near=inp.clipdepth_near)
                    if pending is not None:
                        _drain(pending)
                    pending = (part, dev)
            if pending is not None:
                _drain(pending)
        except Exception as e:
            print(f"batched depth fast path unavailable ({e}); "
                  "falling back to serial prediction")
            fused_batch.clear()

    for count, image in enumerate(inputimages):
        img = rgb_cache.pop(count, None)
        if img is None:
            img = np.asarray(_to_rgb(image))
        h, w = img.shape[:2]

        raw_prediction = None
        raw_prediction_invert = False
        img_output = None
        if inputdepthmaps[count] is not None:
            out = _ingest_custom_depthmap(inputdepthmaps[count], w, h)
        else:
            net_width, net_height = _funnel_net_size(inp, w, h)
            img01 = img.astype(np.float32) / 255.0
            from depthmap_tpu.utils.profiling import stage
            try:
                if inp.boost:
                    boost = cache.get_boost(inp.model_type,
                                            tiling_mode=inp.tiling_mode,
                                            **predictor_kw)
                    with stage("boost_estimate"):
                        raw_prediction = boost.estimate(
                            img01, whole_size_threshold=boost_rmax)
                elif count in fused_batch:
                    img_output = fused_batch.pop(count)
                elif not inp.do_output_depth_prediction \
                        and not inp.gen_simple_mesh:
                    # fused fast path: forward + finalize + i16 in one
                    # device-resident chain, only the uint16 map downloads
                    # (the raw f32 map is only needed on host for the
                    # depth_prediction output and the simple-mesh rescale)
                    with stage("depth_predict"):
                        img_output = predictor.predict_finalized(
                            img01, net_width, net_height,
                            clip=inp.clipdepth, clip_mode=inp.clipdepth_mode,
                            clip_far=inp.clipdepth_far,
                            clip_near=inp.clipdepth_near)
                else:
                    with stage("depth_predict"):
                        raw_prediction = predictor.predict(img01, net_width,
                                                           net_height)
            except Exception as e:
                if "RESOURCE_EXHAUSTED" in str(e) or \
                        "out of memory" in str(e).lower():
                    # parity with the reference's OOM advice (core.py:310-326)
                    suggestion = ("out of device memory, could not generate "
                                  "depthmap! Suggestions:\n")
                    if inp.boost:
                        suggestion += " * Disable BOOST (faster, less " \
                                      "detailed depthmap)\n"
                    else:
                        suggestion += " * Reduce net size (could reduce " \
                                      "quality)\n"
                    if resolve_model_type(inp.model_type) != 6:
                        suggestion += " * Use a smaller model (e.g. " \
                                      "midas_v21_small)\n"
                    raise Exception(suggestion) from e
                raise
            raw_prediction_invert = predictor.raw_prediction_invert

            if img_output is not None:
                out = None
            elif abs(raw_prediction.max() - raw_prediction.min()) > \
                    np.finfo("float").eps:
                if inp.do_output_depth_prediction:
                    pred_out = np.copy(raw_prediction)
                    if raw_prediction_invert:
                        pred_out *= -1
                    yield count, "depth_prediction", pred_out
                out = np.asarray(numerics.finalize_depth(
                    jnp.asarray(raw_prediction), invert=raw_prediction_invert,
                    clip=inp.clipdepth, clip_mode=inp.clipdepth_mode,
                    clip_far=inp.clipdepth_far, clip_near=inp.clipdepth_near))
            else:
                out = np.zeros(raw_prediction.shape)

        if img_output is None:
            # `out` is host data here (custom-depthmap ingest, or a raw map
            # already downloaded for host-side use) — the numpy twin is
            # bit-equal to the device op (test_numerics) and skips a
            # pointless full-res upload+download per frame (8+4 MB @1080p,
            # the video custom-depth pass runs this per frame)
            img_output = numerics.convert_to_i16_np(np.clip(out, 0, 1))

        if inp.gen_inpainted_mesh:
            inpaint_imgs.append(img)
            inpaint_depths.append(img_output)

        if inp.gen_rembg and background_removed_images:
            from depthmap_tpu.pipeline.rembg_integration import (
                background_mask, foreground_mask_image)
            bri = background_removed_images[count]
            bg_mask = background_mask(bri)
            # in-place like the reference (core.py:226): the depth stored
            # for the 3D-inpainted mesh above is the SAME array, so the
            # mask deliberately propagates into the mesh pass
            img_output[bg_mask] = 0  # far value
            yield count, "background_removed", bri
            if inp.save_background_removal_masks:
                yield count, "foreground_mask", foreground_mask_image(bg_mask)

        if inp.do_output_depth:
            img_depth = np.asarray(numerics.invert_i16(jnp.asarray(img_output))) \
                if inp.output_depth_invert else img_output
            if inp.output_depth_combine:
                axis = 1 if inp.output_depth_combine_axis == "Horizontal" else 0
                rgb = np.asarray(numerics.convert_i16_to_rgb(
                    jnp.asarray(img_depth)))
                img_concat = Image.fromarray(
                    np.concatenate((img, rgb), axis=axis))
                yield count, "concat_depth", img_concat
            else:
                yield count, "depth", Image.fromarray(img_depth)  # I;16

        if inp.gen_stereo:
            from depthmap_tpu.utils.profiling import stage
            with stage("stereo"):
                stereoimages = create_stereoimages(
                    img, img_output, inp.stereo_divergence,
                    inp.stereo_separation, inp.stereo_modes,
                    inp.stereo_balance, inp.stereo_offset_exponent,
                    inp.stereo_fill_algo)
            for c, simg in enumerate(stereoimages):
                yield count, inp.stereo_modes[c], Image.fromarray(simg)

        if inp.gen_normalmap:
            normalmap = create_normalmap(
                jnp.asarray(img_output),
                inp.normalmap_pre_blur_kernel if inp.normalmap_pre_blur else None,
                inp.normalmap_sobel_kernel if inp.normalmap_sobel else None,
                inp.normalmap_post_blur_kernel if inp.normalmap_post_blur else None,
                inp.normalmap_invert)
            yield count, "normalmap", Image.fromarray(np.asarray(normalmap))

        if inp.gen_heatmap:
            heatmap = Image.fromarray(colorize(img_output, cmap="inferno"))
            yield count, "heatmap", heatmap

        if inp.gen_simple_mesh:
            from depthmap_tpu.pipeline.mesh import create_simple_mesh_output
            depthi = raw_prediction if raw_prediction is not None else out
            mesh_path = create_simple_mesh_output(
                img, depthi, outpath,
                model_type=resolve_model_type(inp.model_type)
                if not inputdepthmaps_complete else -1,
                boost=inp.boost,
                custom_depthmap=inputdepthmaps[count] is not None,
                occlude=inp.simple_mesh_occlude,
                spherical=inp.simple_mesh_spherical)
            yield count, "simple_mesh", mesh_path

    if inp.gen_inpainted_mesh and inpaint_imgs:
        from depthmap_tpu.pipeline.inpaint_video import run_3dphoto
        try:
            mesh_fi = run_3dphoto(None, inpaint_imgs, inpaint_depths,
                                  inputnames, outpath or ".",
                                  inp.gen_inpainted_mesh_demos, 1, "mp4")
            yield 0, "inpainted_mesh", mesh_fi
        except Exception as e:
            print(f"{e}, some issue with generating inpainted mesh")

    # reference unload semantics (core.py:330-336): keepmodels keeps the
    # model resident between runs (the standalone fallback default, matching
    # backbone.get_opt('...keepmodels', True)); WebUI's registered panel
    # default is False and frees accelerator memory for SD
    if not bool(ops.get("keepmodels", True)):
        cache.release()


def _as_pil(image):
    if isinstance(image, Image.Image):
        return image
    return Image.fromarray(np.asarray(image))


def _to_rgb(image):
    if isinstance(image, Image.Image):
        if image.mode == "I":
            image = image.point(lambda p: p * 0.0039063096)
        return np.asarray(image.convert("RGB"))
    arr = np.asarray(image)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.shape[-1] == 4:
        arr = arr[..., :3]
    return arr
