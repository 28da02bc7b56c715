"""Converters for the 3D-photo inpainting checkpoints
(edge-model.pth / depth-model.pth / color-model.pth, reference
src/core.py:375-390).

Edge net uses torch spectral_norm wrappers: the checkpoint stores
weight_orig + weight_u; the effective weight is weight_orig / sigma with
sigma from one power-iteration readout (u^T W v).  Partial-conv nets store
input_conv/mask_conv pairs; the mask conv is all-ones and dropped.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from depthmap_tpu.models.convert import SDict, conv_w, convt_w


def spectral_weight(sd: SDict, name: str,
                    transpose: bool = False) -> np.ndarray:
    """Effective conv weight for a spectral_norm-wrapped torch module.

    torch's eval-time compute_weight uses the checkpoint's stored u AND v
    (no power iteration): sigma = u^T W v.  Only recompute v when the
    checkpoint lacks it."""
    if sd.has(name + ".weight_orig"):
        w = sd.raw(name + ".weight_orig")
        u = sd.raw(name + ".weight_u")
        # torch applies spectral_norm over dim=0 (Conv) / dim=1
        # (ConvTranspose) — the caller knows which layer this is; shape
        # inference alone misidentifies square ConvTransposes (in==out)
        dim = 1 if transpose else 0
        assert w.shape[dim] == u.shape[0], (w.shape, u.shape)
        wm = np.moveaxis(w, dim, 0).reshape(w.shape[dim], -1)
        if sd.has(name + ".weight_v"):
            v = sd.raw(name + ".weight_v")
        else:
            v = wm.T @ u
            v = v / max(np.linalg.norm(v), 1e-12)
        sigma = float(u @ (wm @ v))
        return w / sigma
    return sd.raw(name + ".weight")


def _sn_conv(sd: SDict, name: str, transpose: bool = False):
    w = spectral_weight(sd, name, transpose=transpose)
    out = {"kernel": convt_w(w) if transpose else conv_w(w)}
    if sd.has(name + ".bias"):
        out["bias"] = sd.raw(name + ".bias")
    return out


def convert_edge_net(sd: SDict, residual_blocks: int = 8):
    """Inpaint_Edge_Net (networks.py:237-330): encoder convs at Sequential
    indices (enc0: .1 after ReflectionPad, enc1/enc2: .0), dilated resnet
    middle, transposed-conv decoder."""
    p: Dict[str, Any] = {
        "enc0": _sn_conv(sd, "encoder_0.1"),
        "enc1": _sn_conv(sd, "encoder_1.0"),
        "enc2": _sn_conv(sd, "encoder_2.0"),
        "dec0": _sn_conv(sd, "decoder_0.0", transpose=True),
        "dec1": _sn_conv(sd, "decoder_1.0", transpose=True),
        "dec2": _sn_conv(sd, "decoder_2.1"),
    }
    for i in range(residual_blocks):
        t = f"middle.{i}.conv_block"
        p[f"res{i}"] = {"conv1": _sn_conv(sd, f"{t}.1"),
                        "conv2": _sn_conv(sd, f"{t}.5")}
    return {"params": p}


def _pconv(sd: SDict, t: str):
    """PCBActiv -> our PCBActiv {conv: {input_conv: {kernel[, bias]}}} (+bn)."""
    out: Dict[str, Any] = {"conv": {"input_conv": {
        "kernel": conv_w(sd.sd[f"{t}.conv.input_conv.weight"])}}}
    sd.used.add(f"{t}.conv.input_conv.weight")
    # the constant all-ones mask conv is implicit in our implementation
    if sd.has(f"{t}.conv.mask_conv.weight"):
        sd.used.add(f"{t}.conv.mask_conv.weight")
    if sd.has(f"{t}.conv.input_conv.bias"):
        out["conv"]["bias"] = sd.raw(f"{t}.conv.input_conv.bias")
    stats = None
    if sd.has(f"{t}.bn.weight"):
        bn_p, bn_s = sd.bn(f"{t}.bn")
        out["bn"] = bn_p
        stats = {"bn": bn_s}
    return out, stats


def convert_pconv_unet(sd: SDict, layer_size: int = 7,
                       dec_names=None):
    """Inpaint_Depth_Net / Inpaint_Color_Net -> our PartialConvUNet tree."""
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    for i in range(1, layer_size + 1):
        entry, stats = _pconv(sd, f"enc_{i}")
        p[f"enc_{i}"] = entry
        if stats:
            s[f"enc_{i}"] = stats
    for i in range(1, layer_size + 1):
        torch_name = dec_names[i - 1] if dec_names else f"dec_{i}"
        entry, stats = _pconv(sd, torch_name)
        p[torch_name] = entry
        if stats:
            s[torch_name] = stats
    return {"params": {"unet": p}, "batch_stats": {"unet": s}}


def convert_depth_inpaint(sd: SDict):
    return convert_pconv_unet(sd, 7)


def convert_color_inpaint(sd: SDict):
    return convert_pconv_unet(sd, 7, dec_names=(
        "dec_1A", "dec_2A", "dec_3A", "dec_4A", "dec_5A", "dec_6", "dec_7"))


def load_inpaint_nets(weights_dir: str = "./models/3dphoto"):
    """-> dict of flax variables for the 3 nets (None entries when the
    checkpoints are not present)."""
    import os
    import torch
    out = {}
    # accept both the upstream 3d-photo-inpainting release names
    # (edge-model.pth) and underscore variants
    files = {"edge": (("edge-model.pth", "edge_model.pth"),
                      convert_edge_net),
             "depth": (("depth-model.pth", "depth_model.pth"),
                       convert_depth_inpaint),
             "color": (("color-model.pth", "color_model.pth"),
                       convert_color_inpaint)}
    for key, (names, converter) in files.items():
        path = next((p for p in
                     (os.path.join(weights_dir, n) for n in names)
                     if os.path.exists(p)), None)
        if path is None:
            out[key] = None
            continue
        sd = SDict(torch.load(path, map_location="cpu", weights_only=True))
        out[key] = converter(sd)
    return out
