"""Forward parity vs hand-written torch oracles for the timm-backed
families (timm itself is not installed — see tests/torch_oracles.py).

Each test: random-init the oracle (checkpoint-layout state dict), run the
real converter, compare flax vs torch forward outputs end-to-end.
"""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.torch_ref import assert_close, randomize_
from tests.torch_oracles import OracleDPT


def _dpt_parity(backbone, img_size, infer_size, convert, build, seed,
                atol=3e-3):
    # raw DPT outputs reach O(100) with random weights; atol is scaled
    # accordingly (rtol 1e-3 carries the real check)
    from depthmap_tpu.models.convert import SDict

    tm = randomize_(OracleDPT(backbone, img_size).eval(), seed=seed)
    x = np.random.default_rng(seed).random(
        (1, infer_size, infer_size, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

    sd = SDict(tm.state_dict())
    variables = convert(sd)
    assert sd.unused() == [], sd.unused()[:8]
    j_out = build().apply(variables, x)
    assert_close(t_out, j_out, tag=f"dpt_{backbone}@{infer_size}", atol=atol)


def test_dpt_beit_large_512_parity_small_window():
    """dpt_beit_large_512 graph at a reduced window — exercises the
    rel-pos-bias bilinear table resize (beit.py:29-62) plus the full
    reassemble/fusion/head stack."""
    from depthmap_tpu.models.build import build_model
    from depthmap_tpu.models.convert import convert_dpt_beit
    _dpt_parity("beitl16_512", 512, 128,
                lambda sd: convert_dpt_beit(sd, depth=24),
                lambda: build_model(1).module, seed=11)


@pytest.mark.slow
def test_dpt_beit_large_512_parity_native():
    """Native 512px window (identity bias path, N=1025)."""
    from depthmap_tpu.models.build import build_model
    from depthmap_tpu.models.convert import convert_dpt_beit
    _dpt_parity("beitl16_512", 512, 512,
                lambda sd: convert_dpt_beit(sd, depth=24),
                lambda: build_model(1).module, seed=11, atol=1e-2)


def test_dpt_beit_large_384_parity():
    from depthmap_tpu.models.build import build_model
    from depthmap_tpu.models.convert import convert_dpt_beit
    _dpt_parity("beitl16_384", 384, 96,
                lambda sd: convert_dpt_beit(sd, depth=24),
                lambda: build_model(2).module, seed=12)


def test_dpt_large_384_vit_parity():
    """dpt_large_384 (ViT-L/16) incl. pos-embed interpolation at a
    non-train window (vit.py:16-73)."""
    from depthmap_tpu.models.build import build_model
    from depthmap_tpu.models.convert import convert_dpt_vit
    _dpt_parity("vitl16_384", 384, 128,
                lambda sd: convert_dpt_vit(sd, depth=24),
                lambda: build_model(3).module, seed=13)


def test_midas_v21_parity():
    """MidasNet (ResNeXt101-WSL encoder via the vendored lib/Resnext_torch +
    classic FeatureFusion decoder, dmidas/midas_net.py:13-76)."""
    from tests.torch_oracles import OracleMidasNet
    from depthmap_tpu.models.build import build_model
    from depthmap_tpu.models.convert import SDict, convert_midas_v21

    tm = randomize_(OracleMidasNet().eval(), seed=14)
    x = np.random.default_rng(14).random((1, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

    sd = SDict(tm.state_dict())
    variables = convert_midas_v21(sd)
    assert sd.unused() == [], sd.unused()[:8]
    j_out = build_model(5).module.apply(variables, x)
    assert_close(t_out, j_out, tag="midas_v21", atol=3e-3)


# --------------------------------------------------------------------------
# ZoeDepth n/k/nk: vendored dzoedepth heads + MidasCore over the BEiT-384
# oracle (the hub download in MidasCore.build is bypassed by constructing
# MidasCore(midas=oracle) directly, dzoedepth/models/base_models/midas.py:190)
# --------------------------------------------------------------------------

def _make_torch_zoe_core():
    import sys
    sys.path.insert(0, "/root/reference")
    from tests.torch_ref import stub_torchvision
    stub_torchvision()
    from dzoedepth.models.base_models.midas import MidasCore
    core = MidasCore(OracleDPT("beitl16_384", 384), trainable=False,
                     fetch_features=True, freeze_bn=True, img_size=384,
                     do_resize=False)
    core.output_channels = [256] * 5   # MIDAS_SETTINGS["DPT_BEiT_L_384"]
    return core


_ZOE_KW = dict(bin_embedding_dim=128, n_attractors=[16, 8, 4, 1],
               attractor_alpha=1000, attractor_gamma=2,
               attractor_kind="mean", attractor_type="inv",
               min_temp=0.0212, max_temp=50.0, train_midas=False,
               midas_lr_factor=1, encoder_lr_factor=10, pos_enc_lr_factor=10)


def _zoe_parity(variant, seed):
    import sys
    sys.path.insert(0, "/root/reference")
    from depthmap_tpu.models.convert import SDict, convert_zoedepth
    from depthmap_tpu.models.zoedepth import build_zoedepth

    core = _make_torch_zoe_core()
    if variant == "nk":
        from dzoedepth.models.zoedepth_nk.zoedepth_nk_v1 import \
            ZoeDepthNK as TorchNK
        class AD(dict):     # attr+item access, like easydict in the reference
            __getattr__ = dict.__getitem__

        bin_conf = [
            AD(name="nyu", n_bins=64, min_depth=1e-3, max_depth=10.0),
            AD(name="kitti", n_bins=64, min_depth=1e-3, max_depth=80.0)]
        tm = TorchNK(core, bin_conf=bin_conf, bin_centers_type="softplus",
                     memory_efficient=True, **_ZOE_KW)
    else:
        from dzoedepth.models.zoedepth.zoedepth_v1 import ZoeDepth as TorchZoe
        bct = "normed" if variant == "k" else "softplus"
        md = 80.0 if variant == "k" else 10.0
        tm = TorchZoe(core, n_bins=64, bin_centers_type=bct, min_depth=1e-3,
                      max_depth=md, **_ZOE_KW)
    tm.eval()
    tm = randomize_(tm, seed=seed)

    x = np.random.default_rng(seed).random((1, 96, 128, 3)).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    with torch.no_grad():
        t_out = tm(xt)["metric_depth"]

    sd = SDict(tm.state_dict())
    variables = convert_zoedepth(sd, variant)
    assert sd.unused() == [], sd.unused()[:10]
    # apply the inner metric module on the same prepped input
    wrapper = build_zoedepth(variant)
    xn = (x - 0.5) / 0.5
    j_out = wrapper.model.apply({"params": variables["params"]["model"]}, xn)
    # the log-binomial head divides logits by a temperature as low as 0.0212,
    # so float accumulation noise from the 24-block BEiT core (~1e-3 on the
    # taps, pure reordering noise — verified tap-by-tap) is amplified;
    # tolerance scales with the head's depth range
    md = {"n": 10.0, "k": 80.0, "nk": 80.0}[variant]
    assert_close(t_out[:, 0], j_out, tag=f"zoe_{variant}",
                 atol=0.005 * md, rtol=0.05)


def test_zoedepth_n_parity():
    _zoe_parity("n", 15)


def test_zoedepth_k_parity():
    """zoedepth_k: bin_centers_type='normed' -> SeedBinRegressor +
    AttractorLayer (bounded/sorted/clipped centers)."""
    _zoe_parity("k", 16)


@pytest.mark.slow
def test_zoedepth_nk_parity():
    """Dual experts + patch-transformer domain router."""
    _zoe_parity("nk", 17)


def test_depth_anything_v1_parity():
    """DA1 == the vendored DA2 vitl graph with last-4 block taps
    (get_intermediate_layers(4), reference depthmap_generation.py:221-236)."""
    import sys
    sys.path.insert(0, "/root/reference")
    from tests.torch_ref import stub_torchvision
    stub_torchvision()
    from ddepth_anything_v2 import DepthAnythingV2

    from depthmap_tpu.models.convert import SDict, convert_depth_anything
    from depthmap_tpu.models.depth_anything import build_depth_anything_v1

    tm = DepthAnythingV2(encoder="vitl", features=256,
                         out_channels=[256, 512, 1024, 1024])
    tm.intermediate_layer_idx = dict(tm.intermediate_layer_idx)
    tm.intermediate_layer_idx["vitl"] = [20, 21, 22, 23]
    tm = randomize_(tm.eval(), seed=18)

    x = np.random.default_rng(18).random((1, 70, 70, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

    sd = SDict(tm.state_dict())
    variables = convert_depth_anything(sd, 24)
    assert sd.unused() == [], sd.unused()[:8]
    j_out = build_depth_anything_v1().apply(variables, x)
    assert_close(t_out, j_out, tag="da1", atol=5e-4)


def test_dpt_hybrid_parity():
    """dpt_hybrid_384 (ResNetV2-50 stages + ViT-B, hooks [0,1,8,11];
    dmidas/backbones/vit.py:120-242 + timm resnetv2 semantics)."""
    from tests.torch_oracles import OracleDPTHybrid
    from depthmap_tpu.models.build import build_model
    from depthmap_tpu.models.convert import SDict, convert_dpt_hybrid

    tm = randomize_(OracleDPTHybrid(384).eval(), seed=19)
    x = np.random.default_rng(19).random((1, 128, 160, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

    sd = SDict(tm.state_dict())
    variables = convert_dpt_hybrid(sd, 12)
    assert sd.unused() == [], sd.unused()[:8]
    j_out = build_model(4).module.apply(variables, x)
    assert_close(t_out, j_out, tag="dpt_hybrid", atol=3e-3)


def test_midas_v21_small_parity():
    """midas_v21_small (tf_efficientnet_lite3 + expand FeatureFusion,
    dmidas/midas_net_custom.py:12-105; TF SAME pads, BN eps 1e-3, ReLU6)."""
    from tests.torch_oracles import OracleMidasSmall
    from depthmap_tpu.models.build import build_model
    from depthmap_tpu.models.convert import SDict, convert_midas_small

    tm = randomize_(OracleMidasSmall().eval(), seed=20)
    x = np.random.default_rng(20).random((1, 96, 128, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

    sd = SDict(tm.state_dict())
    variables = convert_midas_small(sd)
    assert sd.unused() == [], sd.unused()[:8]
    j_out = build_model(6).module.apply(variables, x)
    assert_close(t_out, j_out, tag="midas_v21_small", atol=3e-3)
