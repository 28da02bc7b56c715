"""Converter parity: primitive layout rules checked empirically vs torch."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import flax.linen as nn  # noqa: E402

from depthmap_tpu.models import convert  # noqa: E402
from depthmap_tpu.models.layers import Conv, ConvSame, BatchNorm  # noqa: E402


def test_conv_weight_layout(rng):
    tconv = tnn.Conv2d(5, 7, 3, padding=1)
    x = rng.normal(size=(1, 9, 11, 5)).astype(np.float32)
    with torch.no_grad():
        want = tconv(torch.from_numpy(np.moveaxis(x, -1, 1))).numpy()
    m = Conv(7, 3, padding=1)
    vars_ = {"params": {"conv": {
        "kernel": convert.conv_w(tconv.weight.detach()),
        "bias": np.asarray(tconv.bias.detach())}}}
    got = np.asarray(m.apply(vars_, jnp.asarray(x)))
    np.testing.assert_allclose(got, np.moveaxis(want, 1, -1), atol=1e-5)


def test_grouped_conv_weight_layout(rng):
    tconv = tnn.Conv2d(8, 8, 3, padding=1, groups=8)  # depthwise
    x = rng.normal(size=(1, 6, 6, 8)).astype(np.float32)
    with torch.no_grad():
        want = tconv(torch.from_numpy(np.moveaxis(x, -1, 1))).numpy()
    m = Conv(8, 3, padding=1, groups=8)
    vars_ = {"params": {"conv": {
        "kernel": convert.conv_w(tconv.weight.detach()),
        "bias": np.asarray(tconv.bias.detach())}}}
    got = np.asarray(m.apply(vars_, jnp.asarray(x)))
    np.testing.assert_allclose(got, np.moveaxis(want, 1, -1), atol=1e-5)


@pytest.mark.parametrize("k", [2, 4])
def test_convtranspose_weight_layout(rng, k):
    tconv = tnn.ConvTranspose2d(5, 6, k, stride=k)
    x = rng.normal(size=(1, 4, 3, 5)).astype(np.float32)
    with torch.no_grad():
        want = tconv(torch.from_numpy(np.moveaxis(x, -1, 1))).numpy()
    m = nn.ConvTranspose(6, (k, k), strides=(k, k), padding="VALID")
    got = np.asarray(m.apply(
        {"params": {"kernel": convert.convt_w(tconv.weight.detach()),
                    "bias": np.asarray(tconv.bias.detach())}},
        jnp.asarray(x)))
    np.testing.assert_allclose(got, np.moveaxis(want, 1, -1), atol=1e-5)


def test_linear_weight_layout(rng):
    tl = tnn.Linear(5, 7)
    x = rng.normal(size=(2, 5)).astype(np.float32)
    with torch.no_grad():
        want = tl(torch.from_numpy(x)).numpy()
    got = np.asarray(nn.Dense(7).apply(
        {"params": {"kernel": convert.linear_w(tl.weight.detach()),
                    "bias": np.asarray(tl.bias.detach())}}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_batchnorm_parity(rng):
    tbn = tnn.BatchNorm2d(6, eps=1e-3)
    tbn.eval()
    with torch.no_grad():
        tbn.running_mean.copy_(torch.from_numpy(
            rng.normal(size=6).astype(np.float32)))
        tbn.running_var.copy_(torch.from_numpy(
            (rng.random(6) + 0.5).astype(np.float32)))
        tbn.weight.copy_(torch.from_numpy(
            rng.normal(size=6).astype(np.float32)))
        tbn.bias.copy_(torch.from_numpy(
            rng.normal(size=6).astype(np.float32)))
    x = rng.normal(size=(1, 4, 4, 6)).astype(np.float32)
    with torch.no_grad():
        want = tbn(torch.from_numpy(np.moveaxis(x, -1, 1))).numpy()

    sd = convert.SDict({
        "bn.weight": tbn.weight.detach(), "bn.bias": tbn.bias.detach(),
        "bn.running_mean": tbn.running_mean, "bn.running_var": tbn.running_var})
    p, s = sd.bn("bn")
    m = BatchNorm(eps=1e-3)
    got = np.asarray(m.apply({"params": {"bn": p}, "batch_stats": {"bn": s}},
                             jnp.asarray(x)))
    np.testing.assert_allclose(got, np.moveaxis(want, 1, -1), atol=1e-5)


def test_tf_same_pad_matches_explicit_torch(rng):
    """ConvSame must equal torch conv with TF-style asymmetric pre-padding."""
    tconv = tnn.Conv2d(3, 4, 3, stride=2, bias=False)
    x = rng.normal(size=(1, 7, 9, 3)).astype(np.float32)
    xt = torch.from_numpy(np.moveaxis(x, -1, 1))
    # TF SAME for k=3, s=2, odd input: pad total = k - in%s = 2 -> (1, 1)
    xt = torch.nn.functional.pad(xt, (1, 1, 1, 1))
    with torch.no_grad():
        want = tconv(xt).numpy()
    m = ConvSame(4, 3, 2, use_bias=False)
    got = np.asarray(m.apply(
        {"params": {"conv": {"kernel": convert.conv_w(tconv.weight.detach())}}},
        jnp.asarray(x)))
    np.testing.assert_allclose(got, np.moveaxis(want, 1, -1), atol=1e-5)


def test_midas_small_converter_tree_matches_init(rng):
    """Build a fake checkpoint with the torch names/shapes the converter
    expects (derived by reversing our flax init tree) and check the converted
    tree is structurally identical to model.init's."""
    from depthmap_tpu.models.midas_small import MidasNetSmall
    from depthmap_tpu.models.efficientnet import LITE3

    model = MidasNetSmall()
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    # reverse-map: walk converter expectations, generating torch tensors
    fake = {}

    def add_conv(name, kernel_flax_shape, bias=False):
        kh, kw, i, o = kernel_flax_shape
        fake[name + ".weight"] = torch.zeros((o, i, kh, kw))
        if bias:
            fake[name + ".bias"] = torch.zeros((o,))

    def add_bn(name, c):
        fake[name + ".weight"] = torch.ones((c,))
        fake[name + ".bias"] = torch.zeros((c,))
        fake[name + ".running_mean"] = torch.zeros((c,))
        fake[name + ".running_var"] = torch.ones((c,))

    p = ref["params"]

    def cba(flax_entry, conv_name, bn_name):
        ck = flax_entry["ConvSame_0"]["conv"]["kernel"]
        add_conv(conv_name, ck.shape)
        add_bn(bn_name, ck.shape[-1])

    cba(p["pretrained"]["stem"], "pretrained.layer1.0", "pretrained.layer1.1")
    stage_prefix = {0: "pretrained.layer1.3", 1: "pretrained.layer1.4",
                    2: "pretrained.layer2.0", 3: "pretrained.layer3.0",
                    4: "pretrained.layer3.1", 5: "pretrained.layer4.0",
                    6: "pretrained.layer4.1"}
    for si, cfg in enumerate(LITE3):
        for bi in range(cfg.repeats):
            e = p["pretrained"][f"s{si}_b{bi}"]
            t = f"{stage_prefix[si]}.{bi}"
            if cfg.expand == 1:
                cba(e["dw"], f"{t}.conv_dw", f"{t}.bn1")
                cba(e["pw"], f"{t}.conv_pw", f"{t}.bn2")
            else:
                cba(e["pw_exp"], f"{t}.conv_pw", f"{t}.bn1")
                cba(e["dw"], f"{t}.conv_dw", f"{t}.bn2")
                cba(e["pw_proj"], f"{t}.conv_pwl", f"{t}.bn3")
    for i in (1, 2, 3, 4):
        add_conv(f"scratch.layer{i}_rn",
                 p["scratch"][f"layer{i}_rn"]["conv"]["kernel"].shape)
        t = f"scratch.refinenet{i}"
        r = p[f"refinenet{i}"]
        add_conv(t + ".out_conv", r["out_conv"]["conv"]["kernel"].shape,
                 bias=True)
        for unit in ("resConfUnit1", "resConfUnit2"):
            if unit in r:
                for c in ("conv1", "conv2"):
                    add_conv(f"{t}.{unit}.{c}",
                             r[unit][c]["conv"]["kernel"].shape, bias=True)
    add_conv("scratch.output_conv.0",
             p["output_conv1"]["conv"]["kernel"].shape, bias=True)
    add_conv("scratch.output_conv.2",
             p["output_conv2"]["conv"]["kernel"].shape, bias=True)
    add_conv("scratch.output_conv.4",
             p["output_conv3"]["conv"]["kernel"].shape, bias=True)

    got = convert.convert_state_dict(6, fake)

    ref_shapes = jax.tree.map(lambda a: jnp.shape(a), ref)
    got_shapes = jax.tree.map(lambda a: np.shape(a), got)
    assert jax.tree_util.tree_structure(ref_shapes) == \
        jax.tree_util.tree_structure(got_shapes)
    assert jax.tree.all(jax.tree.map(lambda a, b: a == b,
                                     ref_shapes, got_shapes))


def test_convtranspose_k4s2p1_layout(rng):
    """pix2pix up-convs: torch ConvTranspose2d(k4,s2,p1) == flax
    ConvTranspose(padding=(2,2)) with convt_w weights."""
    tconv = tnn.ConvTranspose2d(5, 6, 4, stride=2, padding=1)
    x = rng.normal(size=(1, 6, 7, 5)).astype(np.float32)
    with torch.no_grad():
        want = tconv(torch.from_numpy(np.moveaxis(x, -1, 1))).numpy()
    m = nn.ConvTranspose(6, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)))
    got = np.asarray(m.apply(
        {"params": {"kernel": convert.convt_w(tconv.weight.detach()),
                    "bias": np.asarray(tconv.bias.detach())}},
        jnp.asarray(x)))
    np.testing.assert_allclose(got, np.moveaxis(want, 1, -1), atol=1e-5)


def test_pix2pix_converter_tree_matches_init(rng):
    from depthmap_tpu.models.pix2pix import Pix2Pix4Depth
    num_downs = 6
    model = Pix2Pix4Depth(num_downs=num_downs, ngf=8)
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64)),
                     jnp.zeros((1, 64, 64)))
    g = ref["params"]["netG"]

    fake = {}
    prefix = "model.model"
    for i in range(num_downs):
        outermost = i == 0
        innermost = i == num_downs - 1
        dk = g[f"down{i}_conv"]["kernel"]
        kh, kw, ic, oc = dk.shape
        didx = 0 if outermost else 1
        fake[f"{prefix}.{didx}.weight"] = torch.zeros((oc, ic, kh, kw))
        if not outermost and not innermost:
            c = dk.shape[-1]
            for suf, val in [("weight", torch.ones(c)),
                             ("bias", torch.zeros(c)),
                             ("running_mean", torch.zeros(c)),
                             ("running_var", torch.ones(c))]:
                fake[f"{prefix}.2.{suf}"] = val
            up_idx = 5
        else:
            up_idx = 3
        uk = g[f"up{i}_conv"]["kernel"]
        kh, kw, ic, oc = uk.shape
        fake[f"{prefix}.{up_idx}.weight"] = torch.zeros((ic, oc, kh, kw))
        if outermost:
            fake[f"{prefix}.{up_idx}.bias"] = torch.zeros(oc)
        else:
            c = oc
            for suf, val in [("weight", torch.ones(c)),
                             ("bias", torch.zeros(c)),
                             ("running_mean", torch.zeros(c)),
                             ("running_var", torch.ones(c))]:
                fake[f"{prefix}.{up_idx + 1}.{suf}"] = val
        if not innermost:
            prefix = f"{prefix}.{1 if outermost else 3}.model"

    sdict = convert.SDict(fake)
    got = convert.convert_pix2pix(sdict, num_downs=num_downs)
    assert not sdict.unused()
    ref_shapes = jax.tree.map(lambda a: jnp.shape(a), ref)
    got_shapes = jax.tree.map(lambda a: np.shape(a), got)
    assert jax.tree_util.tree_structure(ref_shapes) == \
        jax.tree_util.tree_structure(got_shapes)
    assert jax.tree.all(jax.tree.map(lambda a, b: a == b,
                                     ref_shapes, got_shapes))
