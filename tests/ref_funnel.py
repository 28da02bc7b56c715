"""Import scaffolding for driving the REFERENCE's own pipeline
(`src.core.core_generation_funnel`, /root/reference/src/core.py:83)
end-to-end as the golden oracle for whole-pipeline parity tests.

`src.core` transitively imports `src.depthmap_generation`, whose module
header pulls in third-party deps absent from this environment (timm,
skimage, diffusers — torchvision is stubbed in tests/torch_ref.py).  The
stubs below are import-unlocks only: none of the stubbed call paths are
exercised by the funnel configurations under test (the depth model is
injected directly into the ModelHolder, see `install_model`), EXCEPT
`skimage.measure.block_reduce`, which Boost's R_x search calls
(depthmap_generation.py:965) and is therefore implemented for real.

Test-only code; never shipped.
"""
from __future__ import annotations

import sys
import types

import numpy as np

from tests.torch_ref import add_reference_path, stub_torchvision


def stub_timm():
    """timm import surface used at module scope by dmidas backbones
    (backbones/beit.py:1,9; backbones/next_vit.py:22-23; dpt_depth.py:16).
    Only `get_act_layer`/`DropPath`/`trunc_normal_`/`register_model` are
    referenced at import time; none run in the funnel paths under test."""
    if "timm" in sys.modules:
        return
    import torch.nn as nn

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    beit = types.ModuleType("timm.models.beit")
    layers = types.ModuleType("timm.models.layers")
    registry = types.ModuleType("timm.models.registry")

    def gen_relative_position_index(window_size):
        raise NotImplementedError("timm stub: not used in funnel tests")

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()

        def forward(self, x):
            return x

    def trunc_normal_(tensor, *a, **kw):
        return tensor

    def get_act_layer(name):
        return {"relu": nn.ReLU, "gelu": nn.GELU}.get(name, nn.ReLU)

    def register_model(fn):
        return fn

    def create_model(*a, **kw):
        raise NotImplementedError("timm stub: not used in funnel tests")

    beit.gen_relative_position_index = gen_relative_position_index
    layers.DropPath = DropPath
    layers.trunc_normal_ = trunc_normal_
    layers.get_act_layer = get_act_layer
    registry.register_model = register_model
    timm.create_model = create_model
    timm.models = models
    models.beit = beit
    models.layers = layers
    models.registry = registry
    import importlib.machinery
    for name, mod in (("timm", timm), ("timm.models", models),
                      ("timm.models.beit", beit),
                      ("timm.models.layers", layers),
                      ("timm.models.registry", registry)):
        # transformers probes importlib.util.find_spec("timm"), which
        # raises on a sys.modules entry whose __spec__ is None
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = mod


def stub_skimage():
    """skimage.measure.block_reduce — real implementation (Boost's R_x
    search uses it with np.max, depthmap_generation.py:965)."""
    if "skimage" in sys.modules:
        return
    sk = types.ModuleType("skimage")
    measure = types.ModuleType("skimage.measure")

    def block_reduce(image, block_size, func=np.sum, cval=0.0):
        block_size = tuple(block_size)
        assert image.ndim == len(block_size)
        pads = []
        for dim, b in zip(image.shape, block_size):
            pad = (b - dim % b) % b
            pads.append((0, pad))
        padded = np.pad(image, pads, mode="constant", constant_values=cval)
        shape = []
        for dim, b in zip(padded.shape, block_size):
            shape.extend([dim // b, b])
        view = padded.reshape(shape)
        axes = tuple(range(1, view.ndim, 2))
        return func(view, axis=axes)

    measure.block_reduce = block_reduce
    sk.measure = measure
    sys.modules["skimage"] = sk
    sys.modules["skimage.measure"] = measure


def stub_diffusers():
    """diffusers import surface for dmarigold/marigold/marigold_pipeline.py
    (module-scope `from diffusers import ...`).  Marigold is never
    instantiated in the funnel tests."""
    if "diffusers" in sys.modules:
        return
    diffusers = types.ModuleType("diffusers")
    utils = types.ModuleType("diffusers.utils")

    class _Stub:
        def __init__(self, *a, **kw):
            raise NotImplementedError("diffusers stub")

    class DiffusionPipeline:
        def register_modules(self, **kw):
            for k, v in kw.items():
                setattr(self, k, v)

    class BaseOutput(dict):
        def __init__(self, **kw):
            super().__init__(**kw)
            for k, v in kw.items():
                setattr(self, k, v)

    diffusers.DiffusionPipeline = DiffusionPipeline
    diffusers.DDIMScheduler = _Stub
    diffusers.UNet2DConditionModel = _Stub
    diffusers.AutoencoderKL = _Stub
    utils.BaseOutput = BaseOutput
    diffusers.utils = utils
    sys.modules["diffusers"] = diffusers
    sys.modules["diffusers.utils"] = utils


def import_reference_core():
    """Install every stub and import the reference's src.core (+ the modules
    the parity tests poke at).  Returns the `src.core` module."""
    add_reference_path()
    stub_torchvision()
    stub_timm()
    stub_skimage()
    stub_diffusers()
    # the reference targets numpy<2 (np.float_ at
    # stereoimage_generation.py:138,177,197,223,229); restore the alias so
    # its unmodified code runs under the numpy 2 in this environment
    if not hasattr(np, "float_"):
        np.float_ = np.float64
    import src.core as ref_core
    return ref_core


def sanitize_for_python_fallback(img_u8: np.ndarray) -> np.ndarray:
    """numba is absent here, so the reference's pure-python njit fallback
    runs its gap-fill emptiness checks with builtin sum() over uint8
    triples, which WRAPS mod 256 (numba's array sums promote to int64).  A
    non-black pixel whose channel sum is ≡ 0 (mod 256) would be misread as
    'unfilled' by the fallback only — a fallback infidelity, not reference
    semantics.  Nudge such pixels by +1 red so both interpretations agree
    and the numba-semantics comparison stays exact."""
    img = np.array(img_u8, dtype=np.uint8, copy=True)
    s = img.astype(np.int64).sum(axis=-1)
    hazard = (s % 256 == 0) & (s > 0)
    img[hazard, 0] += np.uint8(1)   # (wrap at 255 keeps the sum non-0 too)
    # also avoid true-black pixels in the source (the fill algorithms treat
    # black as 'hole'); lift them to (1,1,1)
    black = s == 0
    img[black] = 1
    return img


def install_model(ref_core, model_type: int, torch_model,
                  resize_mode=None, normalization=None):
    """Point the reference funnel's module-global ModelHolder at an
    already-constructed torch model, skipping load_models' checkpoint
    download (depthmap_generation.py:76-301) while keeping every other
    reference code path (estimate* wrappers, funnel, derivatives) real.

    resize_mode/normalization default to the values load_models would set
    for `model_type` (depthmap_generation.py:97-98,177-191)."""
    import torch
    from src.depthmap_generation import NormalizeImage

    holder = ref_core.model_holder
    if resize_mode is None:
        resize_mode = "upper_bound" if model_type in (5, 6) else "minimal"
    if normalization is None:
        if model_type in (5, 6):
            normalization = NormalizeImage(mean=[0.485, 0.456, 0.406],
                                           std=[0.229, 0.224, 0.225])
        else:
            normalization = NormalizeImage(mean=[0.5, 0.5, 0.5],
                                           std=[0.5, 0.5, 0.5])

    def fake_ensure(model_type_, device, boost, tiling_mode=False):
        holder.depth_model = torch_model
        holder.depth_model_type = model_type
        holder.device = device
        holder.resize_mode = resize_mode
        holder.normalization = normalization
        holder.pix2pix_model = None
        holder.offloaded = False

    holder.ensure_models = fake_ensure
    holder.offload = lambda: None
    holder.unload_models = lambda: None
    torch_model.eval()
    return holder
