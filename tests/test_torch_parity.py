"""End-to-end converter/forward parity vs the vendored torch reference.

For every family whose torch code is importable from /root/reference without
missing third-party deps, we: random-init the *reference torch model*, run
the real `convert_*` on its `state_dict()`, and assert the flax forward
matches the torch forward on a fixed input.  This proves the converters and
the flax graphs end-to-end (reference anchors per test).

Families whose reference code needs timm (BEiT/ViT/hybrid DPTs, midas v21 /
v21_small) are covered in test_torch_oracle_parity.py via hand-written torch
oracles that reproduce the checkpoint key layout.
"""
from __future__ import annotations

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")

from tests.torch_ref import (add_reference_path, assert_close, randomize_,
                             stub_torchvision)

add_reference_path()
stub_torchvision()


# --------------------------------------------------------------------------
# LeReS (model 0) — lib/multi_depth_model_woauxi.py:6 RelDepthModel
# --------------------------------------------------------------------------

def test_leres_forward_parity():
    from lib.multi_depth_model_woauxi import RelDepthModel as TorchLeReS

    from depthmap_tpu.models.convert import SDict, convert_leres
    from depthmap_tpu.models.leres import build_leres

    tm = randomize_(TorchLeReS(backbone="resnext101").eval(), seed=1)
    x = np.random.default_rng(0).random((1, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tm.depth_model(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2))))

    sd = SDict(tm.state_dict())
    variables = convert_leres(sd)
    assert sd.unused() == [], sd.unused()[:8]
    j_out = build_leres().apply(variables, x)
    assert_close(t_out[:, 0], j_out, tag="leres", atol=5e-4)


# --------------------------------------------------------------------------
# pix2pix merge net — pix2pix/models/networks.py:444 UnetGenerator
# --------------------------------------------------------------------------

@pytest.mark.parametrize("num_downs,size", [(7, 128)])
def test_pix2pix_forward_parity_small(num_downs, size):
    _pix2pix_parity(num_downs, size)


@pytest.mark.slow
def test_pix2pix_forward_parity_full_1024():
    """The production 'unet_1024' configuration (10 downs at 1024px,
    reference depthmap_generation.py:293-299 via define_G)."""
    _pix2pix_parity(10, 1024)


def _pix2pix_parity(num_downs, size):
    from pix2pix.models.networks import UnetGenerator as TorchUnet

    from depthmap_tpu.models.convert import SDict, convert_pix2pix
    from depthmap_tpu.models.pix2pix import UnetGenerator

    tm = randomize_(TorchUnet(input_nc=2, output_nc=1, num_downs=num_downs,
                              ngf=64,
                              norm_layer=torch.nn.BatchNorm2d,
                              use_dropout=False).eval(), seed=2)
    x = np.random.default_rng(1).random((1, size, size, 2)).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

    sd = SDict(tm.state_dict())
    variables = convert_pix2pix(sd, num_downs=num_downs)
    assert sd.unused() == [], sd.unused()[:8]
    # converter wraps under the Pix2Pix4Depth 'netG' scope
    unwrapped = {"params": variables["params"]["netG"],
                 "batch_stats": variables["batch_stats"]["netG"]}
    j_out = UnetGenerator(num_downs=num_downs).apply(unwrapped, x)
    assert_close(t_out, j_out, tag=f"pix2pix_{num_downs}", atol=5e-4)


# --------------------------------------------------------------------------
# 3D-photo inpainting nets — inpaint/networks.py:62/134/237/332
# --------------------------------------------------------------------------

def test_inpaint_edge_net_parity():
    from inpaint.networks import Inpaint_Edge_Net

    from depthmap_tpu.models.convert_inpaint import convert_edge_net
    from depthmap_tpu.models.convert import SDict
    from depthmap_tpu.models.inpaint_nets import InpaintEdgeNet

    tm = randomize_(Inpaint_Edge_Net(init_weights=True).eval(), seed=3)
    x = np.random.default_rng(2).random((1, 64, 64, 7)).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

    sd = SDict(tm.state_dict())
    variables = convert_edge_net(sd)
    j_out = InpaintEdgeNet().apply(variables, x)
    assert_close(t_out, j_out, tag="edge_net", atol=5e-4)


def test_inpaint_depth_net_parity():
    from inpaint.networks import Inpaint_Depth_Net

    from depthmap_tpu.models.convert_inpaint import convert_depth_inpaint
    from depthmap_tpu.models.convert import SDict
    from depthmap_tpu.models.inpaint_nets import InpaintDepthNet

    tm = randomize_(Inpaint_Depth_Net().eval(), seed=4)
    g = np.random.default_rng(3)
    depth = g.random((1, 128, 128, 1)).astype(np.float32)
    edge = (g.random((1, 128, 128, 1)) > 0.7).astype(np.float32)
    context = (g.random((1, 128, 128, 1)) > 0.4).astype(np.float32)
    mask = np.clip(1.0 - context, 0, 1).astype(np.float32)
    cat = np.concatenate([depth, edge, context, mask], axis=-1)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(np.transpose(cat, (0, 3, 1, 2))))

    sd = SDict(tm.state_dict())
    variables = convert_depth_inpaint(sd)
    j_out = InpaintDepthNet().apply(variables, depth, edge, context, mask)
    assert_close(t_out, j_out, tag="depth_inpaint", atol=5e-4)


def test_inpaint_color_net_parity():
    from inpaint.networks import Inpaint_Color_Net

    from depthmap_tpu.models.convert_inpaint import convert_color_inpaint
    from depthmap_tpu.models.convert import SDict
    from depthmap_tpu.models.inpaint_nets import InpaintColorNet

    tm = Inpaint_Color_Net()
    tm.eval()   # reference train() override forgets `return self`
    tm = randomize_(tm, seed=5)
    g = np.random.default_rng(4)
    rgb = g.random((1, 128, 128, 3)).astype(np.float32)
    edge = (g.random((1, 128, 128, 1)) > 0.7).astype(np.float32)
    context = (g.random((1, 128, 128, 1)) > 0.4).astype(np.float32)
    mask = np.clip(1.0 - context, 0, 1).astype(np.float32)
    cat = np.concatenate([rgb, edge, context, mask], axis=-1)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(np.transpose(cat, (0, 3, 1, 2))))

    sd = SDict(tm.state_dict())
    variables = convert_color_inpaint(sd)
    j_out = InpaintColorNet().apply(variables, rgb, edge, context, mask)
    assert_close(t_out, j_out, tag="color_inpaint", atol=5e-4)


# --------------------------------------------------------------------------
# Depth Anything v2 (models 12/13/14) — ddepth_anything_v2/dpt.py:153
# --------------------------------------------------------------------------

def _da2_parity(encoder, convert_fn, build_variant, seed):
    from ddepth_anything_v2 import DepthAnythingV2

    from depthmap_tpu.models.convert import SDict
    from depthmap_tpu.models.depth_anything import build_depth_anything_v2

    cfgs = {
        "vits": {"encoder": "vits", "features": 64,
                 "out_channels": [48, 96, 192, 384]},
        "vitb": {"encoder": "vitb", "features": 128,
                 "out_channels": [96, 192, 384, 768]},
        "vitl": {"encoder": "vitl", "features": 256,
                 "out_channels": [256, 512, 1024, 1024]},
    }
    tm = randomize_(DepthAnythingV2(**cfgs[encoder]).eval(), seed=seed)
    x = np.random.default_rng(seed).random((1, 70, 70, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

    sd = SDict(tm.state_dict())
    variables = convert_fn(sd)
    assert sd.unused() == [], sd.unused()[:8]
    j_out = build_depth_anything_v2(build_variant).apply(variables, x)
    assert_close(t_out, j_out, tag=f"da2_{encoder}", atol=5e-4)


def test_da2_vits_forward_parity():
    from depthmap_tpu.models.convert import convert_da2_small
    _da2_parity("vits", convert_da2_small, "vits", 6)


@pytest.mark.slow
def test_da2_vitb_forward_parity():
    from depthmap_tpu.models.convert import convert_da2_base
    _da2_parity("vitb", convert_da2_base, "vitb", 7)


@pytest.mark.slow
def test_da2_vitl_forward_parity():
    from depthmap_tpu.models.convert import convert_da2_large
    _da2_parity("vitl", convert_da2_large, "vitl", 8)




def test_eval_metrics_between_torch_and_flax():
    """VERDICT r1 #10: accuracy parity as a *number* — score the converted
    flax model against its torch twin with the reference eval metrics
    (dzoedepth/utils/misc.py:159-249 definitions, utils/metrics.py)."""
    from lib.multi_depth_model_woauxi import RelDepthModel as TorchLeReS

    from depthmap_tpu.models.convert import SDict, convert_leres
    from depthmap_tpu.models.leres import build_leres
    from depthmap_tpu.utils.metrics import compute_metrics

    tm = randomize_(TorchLeReS(backbone="resnext101").eval(), seed=21)
    x = np.random.default_rng(21).random((1, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tm.depth_model(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2))))[0, 0].numpy()

    variables = convert_leres(SDict(tm.state_dict()))
    j_out = np.asarray(build_leres().apply(variables, x))[0]

    # metrics need strictly positive depths; shift both identically
    shift = 1.0 - min(t_out.min(), j_out.min())
    m = compute_metrics(j_out + shift, t_out + shift)
    assert m["a1"] > 0.9999, m
    assert m["abs_rel"] < 1e-4, m
    assert m["rmse"] < 1e-3, m
