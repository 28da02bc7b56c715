"""Model construction: id/name -> (flax module, preprocess cfg, output
semantics).  The single place that knows each family's quirks
(reference scatters this across depthmap_generation.py:101-260,384-401)."""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Tuple

from depthmap_tpu.pipeline.preprocess import (HALF_MEAN, HALF_STD,
                                              IMAGENET_MEAN, IMAGENET_STD,
                                              PreprocessCfg)
from depthmap_tpu.registry import MODELS, resolve_model_type


@dataclass
class ModelBundle:
    spec: Any
    module: Any                      # flax module (expects NHWC, returns NHW)
    preprocess: PreprocessCfg
    # how the raw net output is resized back to the input resolution
    upsample_mode: str = "bicubic"
    upsample_align_corners: bool = False
    predicts_depth: bool = False     # True => funnel negates before normalize
    prep_in_model: bool = False      # resize/normalize happen inside the net


def build_model(model_type, tiling_mode: bool = False) -> ModelBundle:
    mt = resolve_model_type(model_type)
    spec = MODELS[mt]

    if mt == 6:  # midas_v21_small
        from depthmap_tpu.models.midas_small import MidasNetSmall
        return ModelBundle(
            spec=spec, module=MidasNetSmall(),
            preprocess=PreprocessCfg(resize_mode="upper_bound",
                                     mean=IMAGENET_MEAN, std=IMAGENET_STD,
                                     swap_channels=True),
            upsample_mode="bicubic", upsample_align_corners=False)

    if mt == 5:  # midas_v21
        from depthmap_tpu.models.midas_net import MidasNet
        return ModelBundle(
            spec=spec, module=MidasNet(),
            preprocess=PreprocessCfg(resize_mode="upper_bound",
                                     mean=IMAGENET_MEAN, std=IMAGENET_STD,
                                     swap_channels=True),
            upsample_mode="bicubic", upsample_align_corners=False)

    if mt in (1, 2, 3, 4):  # DPT family (BEiT / ViT backbones)
        from depthmap_tpu.models.dpt import build_dpt
        return ModelBundle(
            spec=spec, module=build_dpt(spec.variant),
            preprocess=PreprocessCfg(resize_mode="minimal",
                                     mean=HALF_MEAN, std=HALF_STD,
                                     swap_channels=True),
            upsample_mode="bicubic", upsample_align_corners=False)

    if mt == 11:  # Depth Anything v1
        from depthmap_tpu.models.depth_anything import build_depth_anything_v1
        return ModelBundle(
            spec=spec, module=build_depth_anything_v1(),
            preprocess=PreprocessCfg(resize_mode="lower_bound",
                                     mean=IMAGENET_MEAN, std=IMAGENET_STD,
                                     multiple_of=14, swap_channels=True),
            upsample_mode="bilinear", upsample_align_corners=False)

    if mt in (12, 13, 14):  # Depth Anything v2
        from depthmap_tpu.models.depth_anything import build_depth_anything_v2
        # swap_channels: the reference DA2 path double-swaps — the funnel
        # hands BGR floats (depthmap_generation.py:381), estimate..._v2
        # converts back to RGB (:550) but image2tensor swaps AGAIN
        # (ddepth_anything_v2/depth_anything_v2/dpt.py:214) — so the net
        # sees BGR.  Replicated for whole-pipeline parity
        # (test_reference_funnel_parity).
        return ModelBundle(
            spec=spec, module=build_depth_anything_v2(spec.variant),
            preprocess=PreprocessCfg(resize_mode="lower_bound",
                                     mean=IMAGENET_MEAN, std=IMAGENET_STD,
                                     multiple_of=14, swap_channels=True),
            upsample_mode="bilinear", upsample_align_corners=True)

    if mt in (7, 8, 9):  # ZoeDepth (preprocessing handled in-model)
        from depthmap_tpu.models.zoedepth import build_zoedepth
        import cv2
        return ModelBundle(
            spec=spec, module=build_zoedepth(spec.variant),
            preprocess=PreprocessCfg(resize_mode="none",
                                     swap_channels=True),
            upsample_mode="bilinear", upsample_align_corners=True,
            predicts_depth=True, prep_in_model=True)

    if mt == 0:  # LeReS res101
        from depthmap_tpu.models.leres import build_leres
        import cv2
        return ModelBundle(
            spec=spec, module=build_leres(),
            preprocess=PreprocessCfg(resize_mode="squash",
                                     mean=IMAGENET_MEAN, std=IMAGENET_STD,
                                     interpolation=cv2.INTER_LINEAR),
            upsample_mode="bicubic", upsample_align_corners=False,
            predicts_depth=True)

    if mt == 10:  # Marigold (diffusion pipeline, not a plain flax module)
        from depthmap_tpu.models.marigold.pipeline import \
            build_marigold_pipeline
        return ModelBundle(
            spec=spec, module=build_marigold_pipeline(),
            preprocess=PreprocessCfg(resize_mode="lower_bound"),
            predicts_depth=True, prep_in_model=True)

    raise NotImplementedError(f"model {spec.name} not yet implemented")
