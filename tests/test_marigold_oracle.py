"""Marigold numeric parity vs diffusers-layout torch oracles.

Closes the round-2 gap "Marigold numerics rest on assertion": the production
converter (models/marigold/convert.py) runs on a REAL-layout state dict
(tests/marigold_oracle.py) and the flax VAE/UNet forwards must match the
torch forwards; the DDIM trajectory and the test-time ensemble match the
reference implementations (dmarigold/marigold/util/ensemble.py:24,
marigold_pipeline.py:254-359)."""
from __future__ import annotations

import numpy as np
import pytest
import torch

from tests.marigold_oracle import (OracleAutoencoderKL, OracleDDIMScheduler,
                                   OracleMarigoldUNet)
from tests.torch_ref import assert_close, randomize_

from depthmap_tpu.models.marigold.convert import convert_unet, convert_vae
from depthmap_tpu.models.marigold.unet import MarigoldUNet
from depthmap_tpu.models.marigold.vae import Decoder, Encoder


class TrackingDict(dict):
    """Records key reads so the test can assert the converter consumed the
    whole checkpoint (nothing silently ignored)."""

    def __init__(self, sd):
        super().__init__(sd)
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)

    def unused(self):
        return sorted(k for k in self if k not in self.read)


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def test_vae_parity(rng):
    tm = randomize_(OracleAutoencoderKL(base=32).eval(), seed=40)
    sd = TrackingDict({k: v for k, v in tm.state_dict().items()})
    enc_vars, dec_vars = convert_vae(sd)
    assert sd.unused() == [], sd.unused()[:8]

    x = rng.random((1, 32, 40, 3)).astype(np.float32) * 2 - 1
    with torch.no_grad():
        t_mean, t_logvar = tm.encode_moments(_nchw(x))
    j_mean, j_logvar = Encoder(base=32).apply(enc_vars, x)
    assert_close(t_mean, j_mean, tag="vae_enc_mean", atol=2e-4)
    assert_close(t_logvar, j_logvar, tag="vae_enc_logvar", atol=2e-4)

    z = rng.random((1, 4, 5, 4)).astype(np.float32)
    with torch.no_grad():
        t_dec = tm.decode(_nchw(z))
    j_dec = Decoder(base=32).apply(dec_vars, z)
    assert_close(t_dec, j_dec, tag="vae_dec", atol=5e-4)


def test_unet_parity(rng):
    tm = randomize_(OracleMarigoldUNet(base=32, ctx_dim=32,
                                       dim_head=8).eval(), seed=41)
    sd = TrackingDict({k: v for k, v in tm.state_dict().items()})
    variables = convert_unet(sd)
    assert sd.unused() == [], sd.unused()[:8]

    x = rng.random((2, 16, 16, 8)).astype(np.float32) * 2 - 1
    ctx = rng.random((2, 7, 32)).astype(np.float32)
    t = np.array([981, 1], np.int64)
    with torch.no_grad():
        t_out = tm(_nchw(x), torch.from_numpy(t), torch.from_numpy(ctx))
    j_out = MarigoldUNet(base=32, context_dim=32, dim_head=8).apply(
        variables, x, t, ctx)
    assert_close(t_out, j_out, tag="unet", atol=5e-4)


@pytest.mark.parametrize("pred_type", ["v_prediction", "epsilon"])
@pytest.mark.parametrize("steps", [10, 50])
def test_ddim_trajectory_parity(rng, pred_type, steps):
    """Full denoise trajectory: our scheduler == the diffusers semantics
    oracle, step by step, on a synthetic 'model' (fixed random response)."""
    from depthmap_tpu.models.marigold.ddim import DDIMScheduler
    ours = DDIMScheduler(prediction_type=pred_type)
    ref = OracleDDIMScheduler(prediction_type=pred_type)
    ts_ours = ours.set_timesteps(steps)
    ts_ref = ref.set_timesteps(steps)
    np.testing.assert_array_equal(ts_ours, ts_ref)

    fake_out = rng.normal(size=(len(ts_ref), 2, 4, 4)).astype(np.float32)
    s_ours = rng.normal(size=(2, 4, 4)).astype(np.float32)
    s_ref = torch.from_numpy(s_ours.copy())
    for i, t in enumerate(ts_ref):
        # drive both with the same fake model output
        o_ours, x0_ours = ours.step(fake_out[i], int(t), np.asarray(s_ours))
        o_ref, x0_ref = ref.step(torch.from_numpy(fake_out[i]), int(t),
                                 s_ref)
        np.testing.assert_allclose(np.asarray(o_ours), o_ref.numpy(),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(x0_ours), x0_ref.numpy(),
                                   atol=1e-5, rtol=1e-5)
        s_ours = np.asarray(o_ours)
        s_ref = o_ref
    # trajectories stay in lockstep to the end
    np.testing.assert_allclose(s_ours, s_ref.numpy(), atol=1e-4)


def test_ensemble_depths_vs_reference(rng):
    """Our numpy ensemble vs the reference torch/scipy ensemble
    (dmarigold/marigold/util/ensemble.py:24-119) on identical members.

    Exact bit parity is NOT achievable here: the reference's closure returns a
    float32-quantized objective, and scipy BFGS differentiates it by finite
    differences with steps below float32 resolution — the optimizer consumes
    rounding noise, so torch-vs-numpy reduction order shifts the trajectory.
    The sound criteria (see PARITY.md): our solution scores equal-or-better
    under the reference's OWN objective, and the reduced maps agree to the
    optimizer-noise scale."""
    # dmarigold.marigold's __init__ pulls marigold_pipeline -> diffusers;
    # install the import-unlock stubs first
    from tests.ref_funnel import import_reference_core
    import_reference_core()
    import scipy.optimize as so
    from dmarigold.marigold.util import ensemble as ref_mod

    from depthmap_tpu.models.marigold import pipeline as our_mod

    base = rng.random((24, 32)).astype(np.float32)
    members = np.stack([
        base * s + t + rng.normal(scale=0.01, size=base.shape)
        .astype(np.float32)
        for s, t in [(1.0, 0.0), (1.4, -0.2), (0.7, 0.33), (1.1, 0.05),
                     (0.9, -0.1)]])

    # capture each side's optimized (s, t) vector to score both with the
    # reference's objective
    captured = []
    orig_minimize = so.minimize

    def capturing_minimize(fn, x0, **kw):
        res = orig_minimize(fn, x0, **kw)
        captured.append(res.x.copy())
        return res

    so.minimize = capturing_minimize
    ref_mod.minimize = capturing_minimize
    try:
        ours = our_mod.ensemble_depths(members)
        ref, _unc = ref_mod.ensemble_depths(torch.from_numpy(members.copy()))
    finally:
        so.minimize = orig_minimize
        ref_mod.minimize = orig_minimize
    ref = ref.numpy()
    x_ours, x_ref = captured

    def ref_objective(x):
        x = x.astype(np.float32)
        n = members.shape[0]
        s = torch.from_numpy(x[:n]).view(-1, 1, 1)
        t = torch.from_numpy(x[n:]).view(-1, 1, 1)
        arr = torch.from_numpy(members) * s + t
        dists = ref_mod.inter_distances(arr)
        sqrt_dist = torch.sqrt(torch.mean(dists ** 2))
        pred = torch.median(arr, dim=0).values
        near = torch.sqrt((0 - torch.min(pred)) ** 2)
        far = torch.sqrt((1 - torch.max(pred)) ** 2)
        return float(sqrt_dist + (near + far) * 0.02)

    # (a) our optimum is at least as good under the reference's own objective
    assert ref_objective(x_ours) <= ref_objective(x_ref) * (1 + 1e-3)
    # (b) maps agree to optimizer-noise scale, near-perfect correlation
    np.testing.assert_allclose(ours, ref, atol=5e-3,
                               err_msg="ensemble mismatch")
    assert np.corrcoef(ours.ravel(), ref.ravel())[0, 1] > 0.9999


def test_single_infer_composition_vs_oracle(rng):
    """Whole single_infer composition (encode -> concat -> denoise loop ->
    decode -> channel mean -> [0,1]) vs the same loop hand-run with the
    torch oracles (reference marigold_pipeline.py:254-359), identical
    weights and identical injected initial noise."""
    from depthmap_tpu.models.marigold.ddim import DDIMScheduler
    from depthmap_tpu.models.marigold.vae import VAE_SCALE

    vae = randomize_(OracleAutoencoderKL(base=32).eval(), seed=42)
    unet = randomize_(OracleMarigoldUNet(base=32, ctx_dim=32,
                                         dim_head=8).eval(), seed=43)
    enc_vars, dec_vars = convert_vae(dict(vae.state_dict()))
    unet_vars = convert_unet(dict(unet.state_dict()))

    # 64px -> 8x8 latent: three stride-2 UNet levels stay >= 1px with
    # matching skip sizes
    rgb = rng.random((1, 64, 64, 3)).astype(np.float32)
    init_latent = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    ctx = rng.random((1, 7, 32)).astype(np.float32)
    steps = 4

    # --- torch side (reference pipeline math) ---
    sched_t = OracleDDIMScheduler()
    with torch.no_grad():
        rgb_t = _nchw(rgb) * 2 - 1
        mean, _ = vae.encode_moments(rgb_t)
        rgb_latent_t = mean * VAE_SCALE
        lat_t = _nchw(init_latent)
        for t in sched_t.set_timesteps(steps):
            uin = torch.cat([rgb_latent_t, lat_t], dim=1)
            np_t = unet(uin, torch.tensor([t]), torch.from_numpy(ctx))
            lat_t, _ = sched_t.step(np_t, int(t), lat_t)
        depth_t = vae.decode(lat_t / VAE_SCALE).mean(dim=1)
        depth_t = torch.clip(depth_t * 0.5 + 0.5, 0.0, 1.0)

    # --- flax side (same math, our modules) ---
    sched_j = DDIMScheduler()
    j_enc = Encoder(base=32)
    j_dec = Decoder(base=32)
    j_unet = MarigoldUNet(base=32, context_dim=32, dim_head=8)
    mean_j, _ = j_enc.apply(enc_vars, rgb * 2 - 1)
    rgb_latent_j = np.asarray(mean_j) * VAE_SCALE
    lat_j = init_latent
    for t in sched_j.set_timesteps(steps):
        uin = np.concatenate([rgb_latent_j, lat_j], axis=-1)
        np_j = j_unet.apply(unet_vars, uin, np.array([t]), ctx)
        lat_j, _ = sched_j.step(np.asarray(np_j), int(t), lat_j)
        lat_j = np.asarray(lat_j)
    depth_j = np.asarray(j_dec.apply(dec_vars, lat_j / VAE_SCALE)).mean(-1)
    depth_j = np.clip(depth_j * 0.5 + 0.5, 0.0, 1.0)

    assert_close(depth_t, depth_j, tag="single_infer", atol=2e-3)
