"""Convert a Marigold diffusers checkpoint directory (Bingxin/Marigold:
vae/ + unet/ + text_encoder/ + tokenizer/) into our flax trees.

Reference loads it with diffusers (depthmap_generation.py:211-220); here the
torch state dicts are mapped directly.  The empty-prompt CLIP embedding is
computed once with transformers' Flax CLIP when the text encoder is present.
"""
from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

from depthmap_tpu.models.convert import conv_w, linear_w


def _t(sd, name):
    v = sd[name]
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def _conv(sd, name):
    return {"kernel": conv_w(_t(sd, name + ".weight")),
            "bias": _t(sd, name + ".bias")}


def _lin(sd, name, bias=True):
    w = _t(sd, name + ".weight")
    if w.ndim == 4:   # old VAE attention uses 1x1 convs
        w = w[:, :, 0, 0]
    out = {"kernel": linear_w(w)}
    if bias and name + ".bias" in sd:
        out["bias"] = _t(sd, name + ".bias")
    return out


def _gn(sd, name):
    return {"scale": _t(sd, name + ".weight"), "bias": _t(sd, name + ".bias")}


def _resnet(sd, t):
    out = {"norm1": _gn(sd, f"{t}.norm1"), "conv1": _conv(sd, f"{t}.conv1"),
           "norm2": _gn(sd, f"{t}.norm2"), "conv2": _conv(sd, f"{t}.conv2")}
    if f"{t}.conv_shortcut.weight" in sd:
        out["shortcut"] = _conv(sd, f"{t}.conv_shortcut")
    return out


def _unet_resnet(sd, t):
    out = _resnet(sd, t)
    out["time_emb_proj"] = _lin(sd, f"{t}.time_emb_proj")
    return out


def _vae_attn(sd, t):
    names = {"q": "to_q", "k": "to_k", "v": "to_v", "proj_out": "to_out.0"}
    if f"{t}.query.weight" in sd:   # older diffusers naming
        names = {"q": "query", "k": "key", "v": "value",
                 "proj_out": "proj_attn"}
    return {"norm": _gn(sd, f"{t}.group_norm"),
            **{ours: _lin(sd, f"{t}.{theirs}")
               for ours, theirs in names.items()}}


def _transformer(sd, t):
    tb = f"{t}.transformer_blocks.0"

    def xattn(name):
        return {"to_q": _lin(sd, f"{tb}.{name}.to_q", bias=False),
                "to_k": _lin(sd, f"{tb}.{name}.to_k", bias=False),
                "to_v": _lin(sd, f"{tb}.{name}.to_v", bias=False),
                "to_out": _lin(sd, f"{tb}.{name}.to_out.0")}
    return {
        "norm": _gn(sd, f"{t}.norm"),
        "proj_in": _lin(sd, f"{t}.proj_in"),
        "proj_out": _lin(sd, f"{t}.proj_out"),
        "block0": {
            "norm1": _gn(sd, f"{tb}.norm1"),
            "attn1": xattn("attn1"),
            "norm2": _gn(sd, f"{tb}.norm2"),
            "attn2": xattn("attn2"),
            "norm3": _gn(sd, f"{tb}.norm3"),
            "ff_geglu": {"proj": _lin(sd, f"{tb}.ff.net.0.proj")},
            "ff_out": _lin(sd, f"{tb}.ff.net.2"),
        },
    }


def convert_unet(sd: Dict[str, Any]):
    p: Dict[str, Any] = {
        "conv_in": _conv(sd, "conv_in"),
        "time_fc1": _lin(sd, "time_embedding.linear_1"),
        "time_fc2": _lin(sd, "time_embedding.linear_2"),
        "norm_out": _gn(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }
    for i in range(4):
        for j in range(2):
            p[f"down{i}_res{j}"] = _unet_resnet(
                sd, f"down_blocks.{i}.resnets.{j}")
            if i < 3:
                p[f"down{i}_attn{j}"] = _transformer(
                    sd, f"down_blocks.{i}.attentions.{j}")
        if i < 3:
            p[f"down{i}_downsample"] = _conv(
                sd, f"down_blocks.{i}.downsamplers.0.conv")
    p["mid_res0"] = _unet_resnet(sd, "mid_block.resnets.0")
    p["mid_res1"] = _unet_resnet(sd, "mid_block.resnets.1")
    p["mid_attn"] = _transformer(sd, "mid_block.attentions.0")
    for k in range(4):          # diffusers up_blocks.k == our up{3-k}
        i = 3 - k
        for j in range(3):
            p[f"up{i}_res{j}"] = _unet_resnet(sd, f"up_blocks.{k}.resnets.{j}")
            if i < 3:
                p[f"up{i}_attn{j}"] = _transformer(
                    sd, f"up_blocks.{k}.attentions.{j}")
        if i > 0:
            p[f"up{i}_upsample"] = _conv(
                sd, f"up_blocks.{k}.upsamplers.0.conv")
    return {"params": p}


def convert_vae(sd: Dict[str, Any]):
    enc: Dict[str, Any] = {
        "conv_in": _conv(sd, "encoder.conv_in"),
        "norm_out": _gn(sd, "encoder.conv_norm_out"),
        "conv_out": _conv(sd, "encoder.conv_out"),
        "quant_conv": _conv(sd, "quant_conv"),
        "mid_block1": _resnet(sd, "encoder.mid_block.resnets.0"),
        "mid_block2": _resnet(sd, "encoder.mid_block.resnets.1"),
        "mid_attn": _vae_attn(sd, "encoder.mid_block.attentions.0"),
    }
    for i in range(4):
        for j in range(2):
            enc[f"down{i}_block{j}"] = _resnet(
                sd, f"encoder.down_blocks.{i}.resnets.{j}")
        if i < 3:
            enc[f"down{i}_downsample"] = _conv(
                sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")

    dec: Dict[str, Any] = {
        "post_quant_conv": _conv(sd, "post_quant_conv"),
        "conv_in": _conv(sd, "decoder.conv_in"),
        "norm_out": _gn(sd, "decoder.conv_norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out"),
        "mid_block1": _resnet(sd, "decoder.mid_block.resnets.0"),
        "mid_block2": _resnet(sd, "decoder.mid_block.resnets.1"),
        "mid_attn": _vae_attn(sd, "decoder.mid_block.attentions.0"),
    }
    for k in range(4):          # diffusers up_blocks.k == our up{3-k}
        i = 3 - k
        for j in range(3):
            dec[f"up{i}_block{j}"] = _resnet(
                sd, f"decoder.up_blocks.{k}.resnets.{j}")
        if i > 0:
            dec[f"up{i}_upsample"] = _conv(
                sd, f"decoder.up_blocks.{k}.upsamplers.0.conv")
    return {"params": enc}, {"params": dec}


def empty_text_embed(model_dir: str) -> np.ndarray:
    """(1, 77, 1024) empty-prompt embedding via transformers Flax CLIP."""
    from transformers import CLIPTokenizer, FlaxCLIPTextModel
    tok = CLIPTokenizer.from_pretrained(os.path.join(model_dir, "tokenizer"))
    te = FlaxCLIPTextModel.from_pretrained(
        os.path.join(model_dir, "text_encoder"), from_pt=True)
    inputs = tok("", padding="max_length", max_length=77,
                 return_tensors="np")
    return np.asarray(te(**inputs).last_hidden_state)


def load_marigold_checkpoint(model_dir: str):
    """-> variables dict for MarigoldPipeline."""
    import torch

    def load_bin(sub):
        for fn in ("diffusion_pytorch_model.bin", "pytorch_model.bin"):
            path = os.path.join(model_dir, sub, fn)
            if os.path.exists(path):
                return torch.load(path, map_location="cpu", weights_only=True)
        raise FileNotFoundError(f"no torch weights under {model_dir}/{sub}")

    enc, dec = convert_vae(load_bin("vae"))
    unet = convert_unet(load_bin("unet"))
    try:
        embed = empty_text_embed(model_dir)
    except Exception:
        embed = np.zeros((1, 77, 1024), np.float32)
    return {"encoder": enc, "decoder": dec, "unet": unet,
            "empty_text_embed": embed}
