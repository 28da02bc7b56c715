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
