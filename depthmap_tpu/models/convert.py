"""Torch-checkpoint -> flax-params conversion.

The reference downloads torch checkpoints per model
(src/depthmap_generation.py:101-260 lists files + URLs).  This module maps
those state dicts onto our NHWC flax parameter trees.  Tensor layout rules:

 * Conv2d        (O, I/g, kh, kw) -> (kh, kw, I/g, O)
 * ConvTranspose (I, O, kh, kw)   -> (kh, kw, O, I) flipped spatially
   (flax ConvTranspose correlates with the un-flipped kernel; torch's
   transposed conv applies the kernel as-is on the scatter side — for our
   stride==kernel cases the equivalence is kernel[::-1, ::-1].transpose)
 * Linear        (O, I)           -> (I, O)
 * BatchNorm     weight/bias -> scale/bias; running stats -> batch_stats

Weights are looked up in `weights_dir` by the reference's canonical file
names; conversion results can be cached with orbax/msgpack.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from depthmap_tpu.registry import resolve_model_type

# canonical checkpoint filenames (reference depthmap_generation.py)
CHECKPOINT_FILES = {
    0: "res101.pth",
    7: "ZoeD_M12_N.pt",
    8: "ZoeD_M12_K.pt",
    9: "ZoeD_M12_NK.pt",
    1: "dpt_beit_large_512.pt",
    2: "dpt_beit_large_384.pt",
    3: "dpt_large-midas-2f21e586.pt",
    4: "dpt_hybrid-midas-501f0c75.pt",
    5: "midas_v21-f6b98070.pt",
    6: "midas_v21_small-70d6b9c8.pt",
    11: "depth_anything_vitl14.pth",
    12: "depth_anything_v2_vits.pth",
    13: "depth_anything_v2_vitb.pth",
    14: "depth_anything_v2_vitl.pth",
}


def conv_w(t) -> np.ndarray:
    """torch conv weight -> flax kernel."""
    return np.transpose(np.asarray(t), (2, 3, 1, 0))


def convt_w(t) -> np.ndarray:
    """torch ConvTranspose2d weight -> flax ConvTranspose kernel."""
    a = np.asarray(t)                       # (I, O, kh, kw)
    a = a[:, :, ::-1, ::-1]                 # flip spatial
    return np.transpose(a, (2, 3, 0, 1))    # -> (kh, kw, I, O)


def linear_w(t) -> np.ndarray:
    return np.transpose(np.asarray(t), (1, 0))


def arr(t) -> np.ndarray:
    return np.asarray(t)


class SDict:
    """Thin helper over a torch state dict: typed pulls + coverage check."""

    def __init__(self, sd: Dict[str, Any]):
        self.sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
                   for k, v in sd.items()}
        self.used = set()

    def conv(self, name):
        self.used.add(name + ".weight")
        return conv_w(self.sd[name + ".weight"])

    def conv_b(self, name):
        self.used.add(name + ".bias")
        return arr(self.sd[name + ".bias"])

    def convt(self, name):
        self.used.add(name + ".weight")
        return convt_w(self.sd[name + ".weight"])

    def linear(self, name):
        self.used.add(name + ".weight")
        return linear_w(self.sd[name + ".weight"])

    def raw(self, name):
        self.used.add(name)
        return arr(self.sd[name])

    def has(self, name):
        return name in self.sd

    def bn(self, name):
        """-> (params {scale, bias}, stats {mean, var})."""
        for suffix in (".weight", ".bias", ".running_mean", ".running_var"):
            self.used.add(name + suffix)
        return ({"scale": arr(self.sd[name + ".weight"]),
                 "bias": arr(self.sd[name + ".bias"])},
                {"mean": arr(self.sd[name + ".running_mean"]),
                 "var": arr(self.sd[name + ".running_var"])})

    def unused(self):
        return [k for k in self.sd
                if k not in self.used and not k.endswith("num_batches_tracked")]


def _conv_entry(sd: SDict, name: str, bias: bool = True):
    out = {"kernel": sd.conv(name)}
    if bias and sd.has(name + ".bias"):
        out["bias"] = sd.conv_b(name)
    return {"conv": out}


def _bn_entry(sd: SDict, name: str):
    p, s = sd.bn(name)
    return {"bn": p}, {"bn": s}


def _cba(sd: SDict, conv_name: str, bn_name: str):
    """ConvBnAct params+stats (ConvSame/Conv nested under the block)."""
    p, s = sd.bn(bn_name)
    return ({"ConvSame_0": {"conv": {"kernel": sd.conv(conv_name)}},
             "BatchNorm_0": {"bn": p}},
            {"BatchNorm_0": {"bn": s}})


# --------------------------------------------------------------------------
# midas_v21_small
# --------------------------------------------------------------------------

def convert_midas_small(sd: SDict):
    """Map MidasNet_small checkpoint (dmidas/midas_net_custom.py layout) to
    our MidasNetSmall tree."""
    from depthmap_tpu.models.efficientnet import LITE3

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    # encoder ------------------------------------------------------------
    enc_p: Dict[str, Any] = {}
    enc_s: Dict[str, Any] = {}
    enc_p["stem"], enc_s["stem"] = _cba(sd, "pretrained.layer1.0",
                                        "pretrained.layer1.1")

    # torch grouping: layer1 = [stem, bn, act, stage0, stage1],
    # layer2 = [stage2], layer3 = [stage3, stage4], layer4 = [stage5, stage6]
    stage_prefix = {0: "pretrained.layer1.3", 1: "pretrained.layer1.4",
                    2: "pretrained.layer2.0", 3: "pretrained.layer3.0",
                    4: "pretrained.layer3.1", 5: "pretrained.layer4.0",
                    6: "pretrained.layer4.1"}
    for si, cfg in enumerate(LITE3):
        for bi in range(cfg.repeats):
            t = f"{stage_prefix[si]}.{bi}"
            name = f"s{si}_b{bi}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            if cfg.expand == 1:   # DSConv: conv_dw/bn1, conv_pw/bn2
                bp["dw"], bs["dw"] = _cba(sd, f"{t}.conv_dw", f"{t}.bn1")
                bp["pw"], bs["pw"] = _cba(sd, f"{t}.conv_pw", f"{t}.bn2")
            else:                 # IR: conv_pw/bn1, conv_dw/bn2, conv_pwl/bn3
                bp["pw_exp"], bs["pw_exp"] = _cba(sd, f"{t}.conv_pw",
                                                  f"{t}.bn1")
                bp["dw"], bs["dw"] = _cba(sd, f"{t}.conv_dw", f"{t}.bn2")
                bp["pw_proj"], bs["pw_proj"] = _cba(sd, f"{t}.conv_pwl",
                                                    f"{t}.bn3")
            enc_p[name] = bp
            enc_s[name] = bs
    params["pretrained"] = enc_p
    stats["pretrained"] = enc_s

    # scratch + refinenets ------------------------------------------------
    params["scratch"] = {
        f"layer{i}_rn": {"conv": {"kernel": sd.conv(f"scratch.layer{i}_rn")}}
        for i in (1, 2, 3, 4)}

    def rcu(prefix):
        return {"conv1": _conv_entry(sd, prefix + ".conv1"),
                "conv2": _conv_entry(sd, prefix + ".conv2")}

    for i in (1, 2, 3, 4):
        t = f"scratch.refinenet{i}"
        params[f"refinenet{i}"] = {
            "out_conv": _conv_entry(sd, t + ".out_conv"),
            "resConfUnit2": rcu(t + ".resConfUnit2"),
            **({"resConfUnit1": rcu(t + ".resConfUnit1")} if i != 4 else {}),
        }

    params["output_conv1"] = _conv_entry(sd, "scratch.output_conv.0")
    params["output_conv2"] = _conv_entry(sd, "scratch.output_conv.2")
    params["output_conv3"] = _conv_entry(sd, "scratch.output_conv.4")

    return {"params": params, "batch_stats": stats}


# --------------------------------------------------------------------------
# Depth Anything v1 / v2 (DINOv2 + DPTHead)
# --------------------------------------------------------------------------

def _linear_entry(sd: SDict, name: str):
    out = {"kernel": sd.linear(name)}
    if sd.has(name + ".bias"):
        out["bias"] = sd.raw(name + ".bias")
    return out


def _ln_entry(sd: SDict, name: str):
    return {"scale": sd.raw(name + ".weight"),
            "bias": sd.raw(name + ".bias")}


def _dinov2_block(sd: SDict, t: str):
    return {
        "norm1": _ln_entry(sd, f"{t}.norm1"),
        "attn": {"qkv": _linear_entry(sd, f"{t}.attn.qkv"),
                 "proj": _linear_entry(sd, f"{t}.attn.proj")},
        "gamma_1": sd.raw(f"{t}.ls1.gamma"),
        "norm2": _ln_entry(sd, f"{t}.norm2"),
        "mlp": {"fc1": _linear_entry(sd, f"{t}.mlp.fc1"),
                "fc2": _linear_entry(sd, f"{t}.mlp.fc2")},
        "gamma_2": sd.raw(f"{t}.ls2.gamma"),
    }


def _rcu(sd: SDict, prefix: str):
    return {"conv1": _conv_entry(sd, prefix + ".conv1"),
            "conv2": _conv_entry(sd, prefix + ".conv2")}


def _refinenet(sd: SDict, t: str, with_rcu1: bool = True):
    out = {"out_conv": _conv_entry(sd, t + ".out_conv"),
           "resConfUnit2": _rcu(sd, t + ".resConfUnit2")}
    if with_rcu1 and sd.has(t + ".resConfUnit1.conv1.weight"):
        out["resConfUnit1"] = _rcu(sd, t + ".resConfUnit1")
    return out


def convert_depth_anything(sd: SDict, depth: int):
    """DepthAnythingV2 checkpoints (also DA1's DPT_DINOv2 layout)."""
    enc: Dict[str, Any] = {
        "cls_token": sd.raw("pretrained.cls_token"),
        "pos_embed": sd.raw("pretrained.pos_embed"),
        "patch_embed": {"proj": {
            "kernel": conv_w(sd.sd["pretrained.patch_embed.proj.weight"]),
            "bias": sd.raw("pretrained.patch_embed.proj.bias")}},
        "norm": _ln_entry(sd, "pretrained.norm"),
    }
    sd.used.add("pretrained.patch_embed.proj.weight")
    # mask_token is an MIM-pretraining artifact, dead at inference
    # (ddepth_anything_v2 dinov2.py keeps it in the state dict)
    sd.used.add("pretrained.mask_token")
    for i in range(depth):
        enc[f"block_{i}"] = _dinov2_block(sd, f"pretrained.blocks.{i}")

    head: Dict[str, Any] = {}
    for i in range(4):
        head[f"project{i}"] = _conv_entry(
            sd, f"depth_head.projects.{i}")
    head["resize0"] = {"kernel": sd.convt("depth_head.resize_layers.0"),
                       "bias": sd.raw("depth_head.resize_layers.0.bias")}
    head["resize1"] = {"kernel": sd.convt("depth_head.resize_layers.1"),
                       "bias": sd.raw("depth_head.resize_layers.1.bias")}
    head["resize3"] = _conv_entry(sd, "depth_head.resize_layers.3")
    head["scratch"] = {
        f"layer{i}_rn": {"conv": {
            "kernel": sd.conv(f"depth_head.scratch.layer{i}_rn")}}
        for i in (1, 2, 3, 4)}
    for i in (1, 2, 3, 4):
        head[f"refinenet{i}"] = _refinenet(
            sd, f"depth_head.scratch.refinenet{i}")
    head["output_conv1"] = _conv_entry(sd, "depth_head.scratch.output_conv1")
    head["output_conv2_0"] = _conv_entry(sd,
                                         "depth_head.scratch.output_conv2.0")
    head["output_conv2_2"] = _conv_entry(sd,
                                         "depth_head.scratch.output_conv2.2")
    return {"params": {"pretrained": enc, "depth_head": head}}


def convert_da2_small(sd):
    return convert_depth_anything(sd, 12)


def convert_da2_base(sd):
    return convert_depth_anything(sd, 12)


def convert_da2_large(sd):
    return convert_depth_anything(sd, 24)


# --------------------------------------------------------------------------
# MiDaS 3.x DPT (BEiT / ViT backbones)
# --------------------------------------------------------------------------

def _beit_block(sd: SDict, t: str, i: int):
    block = {
        "norm1": _ln_entry(sd, f"{t}.norm1"),
        "attn": {"qkv": {"kernel": sd.linear(f"{t}.attn.qkv")},
                 "q_bias": sd.raw(f"{t}.attn.q_bias"),
                 "v_bias": sd.raw(f"{t}.attn.v_bias"),
                 "proj": _linear_entry(sd, f"{t}.attn.proj")},
        "gamma_1": sd.raw(f"{t}.gamma_1"),
        "norm2": _ln_entry(sd, f"{t}.norm2"),
        "mlp": {"fc1": _linear_entry(sd, f"{t}.mlp.fc1"),
                "fc2": _linear_entry(sd, f"{t}.mlp.fc2")},
        "gamma_2": sd.raw(f"{t}.gamma_2"),
    }
    sd.used.add(f"{t}.attn.k_bias")  # zero, non-trainable
    rel = {"relative_position_bias_table":
           sd.raw(f"{t}.attn.relative_position_bias_table")}
    for k in list(sd.sd):
        if k.startswith(f"{t}.attn.relative_position_index"):
            sd.used.add(k)
    return block, rel


def _vit_block(sd: SDict, t: str):
    return {
        "norm1": _ln_entry(sd, f"{t}.norm1"),
        "attn": {"qkv": _linear_entry(sd, f"{t}.attn.qkv"),
                 "proj": _linear_entry(sd, f"{t}.attn.proj")},
        "norm2": _ln_entry(sd, f"{t}.norm2"),
        "mlp": {"fc1": _linear_entry(sd, f"{t}.mlp.fc1"),
                "fc2": _linear_entry(sd, f"{t}.mlp.fc2")},
    }


def _dpt_decoder(sd: SDict, reassemble: bool = True, prefix: str = ""):
    out: Dict[str, Any] = {}
    if reassemble:
        for i in range(1, 5):
            t = f"{prefix}pretrained.act_postprocess{i}"
            entry = {"readout": {"project": _linear_entry(sd,
                                                          f"{t}.0.project.0")},
                     "proj": _conv_entry(sd, f"{t}.3")}
            if i in (1, 2):
                entry["resize"] = {"kernel": sd.convt(f"{t}.4"),
                                   "bias": sd.raw(f"{t}.4.bias")}
            elif i == 4:
                entry["resize"] = _conv_entry(sd, f"{t}.4")
            out[f"reassemble{i}"] = entry
    out["scratch"] = {
        f"layer{i}_rn": {"conv": {
            "kernel": sd.conv(f"{prefix}scratch.layer{i}_rn")}}
        for i in (1, 2, 3, 4)}
    for i in (1, 2, 3, 4):
        out[f"refinenet{i}"] = _refinenet(sd, f"{prefix}scratch.refinenet{i}",
                                          with_rcu1=(i != 4))
    out["head_conv1"] = _conv_entry(sd, f"{prefix}scratch.output_conv.0")
    out["head_conv2"] = _conv_entry(sd, f"{prefix}scratch.output_conv.2")
    out["head_conv3"] = _conv_entry(sd, f"{prefix}scratch.output_conv.4")
    return out


def convert_dpt_beit(sd: SDict, depth: int = 24, prefix: str = ""):
    backbone: Dict[str, Any] = {
        "cls_token": sd.raw(f"{prefix}pretrained.model.cls_token"),
        "patch_embed": {"proj": {
            "kernel": conv_w(
                sd.sd[f"{prefix}pretrained.model.patch_embed.proj.weight"]),
            "bias": sd.raw(f"{prefix}pretrained.model.patch_embed.proj.bias")}},
    }
    sd.used.add(f"{prefix}pretrained.model.patch_embed.proj.weight")
    for i in range(depth):
        block, rel = _beit_block(sd, f"{prefix}pretrained.model.blocks.{i}", i)
        backbone[f"block_{i}"] = block
        backbone[f"rel_pos_bias_{i}"] = rel
    params = {"backbone": backbone, **_dpt_decoder(sd, prefix=prefix)}
    return {"params": params}


def convert_dpt_vit(sd: SDict, depth: int = 24):
    backbone: Dict[str, Any] = {
        "cls_token": sd.raw("pretrained.model.cls_token"),
        "pos_embed": sd.raw("pretrained.model.pos_embed"),
        "patch_embed": {"proj": {
            "kernel": conv_w(sd.sd["pretrained.model.patch_embed.proj.weight"]),
            "bias": sd.raw("pretrained.model.patch_embed.proj.bias")}},
    }
    sd.used.add("pretrained.model.patch_embed.proj.weight")
    for i in range(depth):
        backbone[f"block_{i}"] = _vit_block(sd, f"pretrained.model.blocks.{i}")
    params = {"backbone": backbone, **_dpt_decoder(sd)}
    return {"params": params}


# --------------------------------------------------------------------------
# midas_v21 (ResNeXt101-WSL + classic FeatureFusion)
# --------------------------------------------------------------------------

def _bn_pair(sd: SDict, name: str):
    p, s = sd.bn(name)
    return {"bn": p}, {"bn": s}


def _bottleneck(sd: SDict, t: str):
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    for i in (1, 2, 3):
        p[f"conv{i}"] = {"conv": {"kernel": sd.conv(f"{t}.conv{i}")}}
        p[f"bn{i}"], s[f"bn{i}"] = _bn_pair(sd, f"{t}.bn{i}")
    if sd.has(f"{t}.downsample.0.weight"):
        p["downsample_conv"] = {"conv": {
            "kernel": sd.conv(f"{t}.downsample.0")}}
        p["downsample_bn"], s["downsample_bn"] = _bn_pair(
            sd, f"{t}.downsample.1")
    return p, s


def convert_midas_v21(sd: SDict, layers=(3, 4, 23, 3)):
    """MidasNet checkpoint (dmidas/midas_net.py + blocks.py:193-207 split:
    layer1 = [conv1, bn1, relu, maxpool, resnet.layer1])."""
    enc_p: Dict[str, Any] = {
        "conv1": {"conv": {"kernel": sd.conv("pretrained.layer1.0")}}}
    enc_s: Dict[str, Any] = {}
    enc_p["bn1"], enc_s["bn1"] = _bn_pair(sd, "pretrained.layer1.1")
    prefix = {0: "pretrained.layer1.4", 1: "pretrained.layer2",
              2: "pretrained.layer3", 3: "pretrained.layer4"}
    for li, n in enumerate(layers):
        for bi in range(n):
            p, s = _bottleneck(sd, f"{prefix[li]}.{bi}")
            enc_p[f"layer{li + 1}_{bi}"] = p
            enc_s[f"layer{li + 1}_{bi}"] = s

    params: Dict[str, Any] = {"pretrained": enc_p}
    params["scratch"] = {
        f"layer{i}_rn": {"conv": {"kernel": sd.conv(f"scratch.layer{i}_rn")}}
        for i in (1, 2, 3, 4)}
    for i in (1, 2, 3, 4):
        t = f"scratch.refinenet{i}"
        entry = {"resConfUnit2": _rcu(sd, t + ".resConfUnit2")}
        if sd.has(t + ".resConfUnit1.conv1.weight"):
            entry["resConfUnit1"] = _rcu(sd, t + ".resConfUnit1")
        params[f"refinenet{i}"] = entry
    params["output_conv1"] = _conv_entry(sd, "scratch.output_conv.0")
    params["output_conv2"] = _conv_entry(sd, "scratch.output_conv.2")
    params["output_conv3"] = _conv_entry(sd, "scratch.output_conv.4")
    return {"params": params, "batch_stats": {"pretrained": enc_s}}


# --------------------------------------------------------------------------
# pix2pix merge net (recursive UnetSkipConnectionBlock naming)
# --------------------------------------------------------------------------

def convert_pix2pix(sd: SDict, num_downs: int = 10):
    """latest_net_G.pth: nested Sequential names — outermost
    model.model.[0 conv|1 submodule|3 upconv]; mid levels
    ...model.[1 conv|2 bn|3 submodule|5 upconv|6 upbn]; innermost
    ...model.[1 conv|3 upconv|4 upbn]."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    prefix = "model.model"
    for i in range(num_downs):
        outermost = i == 0
        innermost = i == num_downs - 1
        if outermost:
            params[f"down{i}_conv"] = {
                "kernel": conv_w(sd.sd[f"{prefix}.0.weight"])}
            sd.used.add(f"{prefix}.0.weight")
            up_idx = 3
        elif innermost:
            params[f"down{i}_conv"] = {
                "kernel": conv_w(sd.sd[f"{prefix}.1.weight"])}
            sd.used.add(f"{prefix}.1.weight")
            up_idx = 3
        else:
            params[f"down{i}_conv"] = {
                "kernel": conv_w(sd.sd[f"{prefix}.1.weight"])}
            sd.used.add(f"{prefix}.1.weight")
            p, s = sd.bn(f"{prefix}.2")
            params[f"down{i}_bn"] = {"bn": p}
            stats[f"down{i}_bn"] = {"bn": s}
            up_idx = 5
        up_name = f"{prefix}.{up_idx}"
        params[f"up{i}_conv"] = {"kernel": convt_w(sd.sd[up_name + ".weight"])}
        sd.used.add(up_name + ".weight")
        if outermost:
            params[f"up{i}_conv"]["bias"] = sd.raw(up_name + ".bias")
        else:
            bn_idx = up_idx + 1
            p, s = sd.bn(f"{prefix}.{bn_idx}")
            params[f"up{i}_bn"] = {"bn": p}
            stats[f"up{i}_bn"] = {"bn": s}
        if not innermost:
            prefix = f"{prefix}.{1 if outermost else 3}.model"
    wrapped = {"params": {"netG": params},
               "batch_stats": {"netG": stats}}
    return wrapped


# --------------------------------------------------------------------------
# ZoeDepth n/k/nk
# --------------------------------------------------------------------------

def _zoe_mlp2(sd: SDict, t: str):
    """Two-conv MLP head (_net Sequential conv-act-conv[-act])."""
    return {"conv1": _conv_entry(sd, f"{t}._net.0"),
            "conv2": _conv_entry(sd, f"{t}._net.2")}


def _zoe_core_head(sd: SDict, seed_prefix: str, attr_prefix: str):
    out = {"seed_bin_regressor": _zoe_mlp2(sd, seed_prefix)}
    for i in range(4):
        out[f"attractor_{i}"] = _zoe_mlp2(sd, f"{attr_prefix}.{i}")
    return out


def _zoe_clb(sd: SDict, t: str):
    # constant LogBinomial buffers (k_idx / K_minus_1) are derived from
    # n_classes and rebuilt at trace time
    for buf in (".log_binomial_transform.k_idx",
                ".log_binomial_transform.K_minus_1"):
        if sd.has(t + buf):
            sd.used.add(t + buf)
    return {"mlp_conv1": _conv_entry(sd, f"{t}.mlp.0"),
            "mlp_conv2": _conv_entry(sd, f"{t}.mlp.2")}


def convert_zoedepth(sd: SDict, variant: str = "n"):
    """ZoeD_M12_{N,K,NK}.pt (checkpoint['model'] already unwrapped):
    core.core.* = hub BEiT-L-384 DPT; metric head per zoedepth_v1.py /
    zoedepth_nk_v1.py naming."""
    core = convert_dpt_beit(sd, 24, prefix="core.core.")["params"]
    model: Dict[str, Any] = {"core": core,
                             "conv2": _conv_entry(sd, "conv2"),
                             "seed_projector": _zoe_mlp2(sd,
                                                         "seed_projector")}
    for i in range(4):
        model[f"projector_{i}"] = _zoe_mlp2(sd, f"projectors.{i}")
    if variant in ("n", "k"):
        model["head"] = _zoe_core_head(sd, "seed_bin_regressor", "attractors")
        model["clb"] = _zoe_clb(sd, "conditional_log_binomial")
    else:  # nk
        for dom in ("nyu", "kitti"):
            model[f"head_{dom}"] = _zoe_core_head(
                sd, f"seed_bin_regressors.{dom}", f"attractors.{dom}")
            model[f"clb_{dom}"] = _zoe_clb(sd,
                                           f"conditional_log_binomial.{dom}")
        # patch-transformer router
        pt: Dict[str, Any] = {"embedding_conv": _conv_entry(
            sd, "patch_transformer.embedding_convPxP")}
        for i in range(4):
            t = f"patch_transformer.transformer_encoder.layers.{i}"
            pt[f"l{i}_in_proj"] = {
                "kernel": linear_w(sd.raw(f"{t}.self_attn.in_proj_weight")),
                "bias": sd.raw(f"{t}.self_attn.in_proj_bias")}
            pt[f"l{i}_out_proj"] = _linear_entry(sd, f"{t}.self_attn.out_proj")
            pt[f"l{i}_linear1"] = _linear_entry(sd, f"{t}.linear1")
            pt[f"l{i}_linear2"] = _linear_entry(sd, f"{t}.linear2")
            pt[f"l{i}_norm1"] = _ln_entry(sd, f"{t}.norm1")
            pt[f"l{i}_norm2"] = _ln_entry(sd, f"{t}.norm2")
        model["patch_transformer"] = pt
        model["mlp_classifier_0"] = _linear_entry(sd, "mlp_classifier.0")
        model["mlp_classifier_2"] = _linear_entry(sd, "mlp_classifier.2")
    return {"params": {"model": model}}


# --------------------------------------------------------------------------
# LeReS res101
# --------------------------------------------------------------------------

def _leres_ftb(sd: SDict, t: str):
    p = {"conv1": _conv_entry(sd, f"{t}.conv1"),
         "branch_conv1": _conv_entry(sd, f"{t}.conv_branch.1"),
         "branch_conv2": _conv_entry(sd, f"{t}.conv_branch.4")}
    bn_p, bn_s = sd.bn(f"{t}.conv_branch.2")
    p["branch_bn"] = {"bn": bn_p}
    return p, {"branch_bn": {"bn": bn_s}}


def convert_leres(sd: SDict, layers=(3, 4, 23, 3)):
    """res101.pth checkpoint['depth_model'] stripped of 'module.'
    (lib/net_tools.py:27-52): depth_model.encoder_modules.encoder.* =
    torchvision resnext101_32x8d; decoder_modules.* = FTB/FFM/AO stack."""
    E = "depth_model.encoder_modules.encoder"
    D = "depth_model.decoder_modules"
    enc_p: Dict[str, Any] = {
        "conv1": {"conv": {"kernel": sd.conv(f"{E}.conv1")}}}
    enc_s: Dict[str, Any] = {}
    enc_p["bn1"], enc_s["bn1"] = _bn_pair(sd, f"{E}.bn1")
    for li, n in enumerate(layers):
        for bi in range(n):
            p, s = _bottleneck(sd, f"{E}.layer{li + 1}.{bi}")
            enc_p[f"layer{li + 1}_{bi}"] = p
            enc_s[f"layer{li + 1}_{bi}"] = s

    params: Dict[str, Any] = {"encoder": enc_p}
    stats: Dict[str, Any] = {"encoder": enc_s}
    params["conv_ftb"], stats["conv_ftb"] = _leres_ftb(sd, f"{D}.conv")
    params["conv1"] = _conv_entry(sd, f"{D}.conv1")
    for name in ("ffm2", "ffm1", "ffm0"):
        fp: Dict[str, Any] = {}
        fs: Dict[str, Any] = {}
        fp["ftb1"], fs["ftb1"] = _leres_ftb(sd, f"{D}.{name}.ftb1")
        fp["ftb2"], fs["ftb2"] = _leres_ftb(sd, f"{D}.{name}.ftb2")
        params[name] = fp
        stats[name] = fs
    ao_p = {"conv1": _conv_entry(sd, f"{D}.outconv.adapt_conv.0"),
            "conv2": _conv_entry(sd, f"{D}.outconv.adapt_conv.3")}
    bn_p, bn_s = sd.bn(f"{D}.outconv.adapt_conv.1")
    ao_p["bn"] = {"bn": bn_p}
    params["outconv"] = ao_p
    stats["outconv"] = {"bn": {"bn": bn_s}}
    return {"params": params, "batch_stats": stats}


# --------------------------------------------------------------------------
# dpt_hybrid_384 (ResNetV2-50 stages + ViT-B)
# --------------------------------------------------------------------------

def _std_conv(sd: SDict, name: str):
    return {"kernel": sd.conv(name)}


def _gn_act(sd: SDict, name: str):
    return {"gn": {"scale": sd.raw(name + ".weight"),
                   "bias": sd.raw(name + ".bias")}}


def _rnv2_bottleneck(sd: SDict, t: str):
    p = {}
    for i in (1, 2, 3):
        p[f"conv{i}"] = _std_conv(sd, f"{t}.conv{i}")
        p[f"norm{i}"] = _gn_act(sd, f"{t}.norm{i}")
    if sd.has(f"{t}.downsample.conv.weight"):
        p["downsample_conv"] = _std_conv(sd, f"{t}.downsample.conv")
        p["downsample_norm"] = _gn_act(sd, f"{t}.downsample.norm")
    return p


def convert_dpt_hybrid(sd: SDict, depth: int = 12, layers=(3, 4, 9)):
    """dpt_hybrid-midas-501f0c75.pt: timm vit_base_resnet50_384 hybrid
    (patch_embed.backbone = ResNetV2 stem+3 stages) + ViT-B blocks; DPT
    decoder with Identity postprocess for the two resnet taps."""
    P = "pretrained.model"
    rn = {"stem_conv": _std_conv(sd, f"{P}.patch_embed.backbone.stem.conv"),
          "stem_norm": _gn_act(sd, f"{P}.patch_embed.backbone.stem.norm")}
    for si, n in enumerate(layers):
        for bi in range(n):
            rn[f"stage{si}_b{bi}"] = _rnv2_bottleneck(
                sd, f"{P}.patch_embed.backbone.stages.{si}.blocks.{bi}")

    backbone: Dict[str, Any] = {
        "backbone": rn,
        "cls_token": sd.raw(f"{P}.cls_token"),
        "pos_embed": sd.raw(f"{P}.pos_embed"),
        "patch_proj": {"kernel": conv_w(sd.sd[f"{P}.patch_embed.proj.weight"]),
                       "bias": sd.raw(f"{P}.patch_embed.proj.bias")},
    }
    sd.used.add(f"{P}.patch_embed.proj.weight")
    for i in range(depth):
        backbone[f"block_{i}"] = _vit_block(sd, f"{P}.blocks.{i}")

    # decoder: hybrid act_postprocess1/2 are Identity; 3/4 are readout stacks
    out: Dict[str, Any] = {"backbone": backbone}
    for i in (3, 4):
        t = f"pretrained.act_postprocess{i}"
        entry = {"readout": {"project": _linear_entry(sd, f"{t}.0.project.0")},
                 "proj": _conv_entry(sd, f"{t}.3")}
        if i == 4:
            entry["resize"] = _conv_entry(sd, f"{t}.4")
        out[f"reassemble{i}"] = entry
    out.update(_dpt_decoder(sd, reassemble=False))
    return {"params": out}


CONVERTERS = {
    0: convert_leres,
    1: lambda sd: convert_dpt_beit(sd, 24),
    2: lambda sd: convert_dpt_beit(sd, 24),
    3: lambda sd: convert_dpt_vit(sd, 24),
    4: lambda sd: convert_dpt_hybrid(sd, 12),
    5: convert_midas_v21,
    6: convert_midas_small,
    7: lambda sd: convert_zoedepth(sd, "n"),
    8: lambda sd: convert_zoedepth(sd, "k"),
    9: lambda sd: convert_zoedepth(sd, "nk"),
    11: convert_da2_large,   # DA1 vitl14 shares the DA2 layout
    12: convert_da2_small,
    13: convert_da2_base,
    14: convert_da2_large,
}


def convert_state_dict(model_type: int, state_dict: Dict[str, Any]):
    mt = resolve_model_type(model_type)
    if mt not in CONVERTERS:
        raise NotImplementedError(f"no converter for model {mt} yet")
    sd = SDict(state_dict)
    variables = CONVERTERS[mt](sd)
    leftover = [k for k in sd.unused()
                if not k.startswith(("pretrained.model.head",))]
    if leftover:
        import warnings
        warnings.warn(f"{len(leftover)} unconverted tensors, e.g. "
                      f"{leftover[:5]}")
    import jax
    return jax.tree.map(lambda a: np.asarray(a), variables)


def load_converted_weights(model_type, weights_dir: str = "./models"):
    """Load + convert the reference checkpoint for `model_type`; raises
    FileNotFoundError when the checkpoint isn't present locally."""
    mt = resolve_model_type(model_type)
    fn = CHECKPOINT_FILES.get(mt)
    if fn is None:
        raise FileNotFoundError(f"no known checkpoint file for model {mt}")
    path = os.path.join(weights_dir, fn)
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd and mt in (7, 8, 9):
        sd = sd["model"]
    if isinstance(sd, dict) and "depth_model" in sd and mt == 0:
        # LeReS: keys live under checkpoint['depth_model'] and target the
        # RelDepthModel, i.e. start with 'depth_model.' after module-strip
        sd = sd["depth_model"]
        sd = {k[len("module."):] if k.startswith("module.") else k: v
              for k, v in sd.items()}
        if not next(iter(sd)).startswith("depth_model."):
            sd = {"depth_model." + k: v for k, v in sd.items()}
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    return convert_state_dict(mt, sd)
