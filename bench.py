#!/usr/bin/env python
"""Benchmark: depth frames/sec at 512x512 with dpt_beit_large_512 (the
BASELINE.md headline metric; baseline target 30 fps).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
A second BASELINE metric (1080p video depth+stereo e2e, target 24 fps) is
measured too and recorded in BENCH_EXTRA.json (stdout stays one line for the
driver).  Set BENCH_SKIP_E2E=1 to skip it.

The timed code path IS the production path: a DepthPredictor with the
default per-model compute-dtype policy (bf16 for BEiT, f32 accumulate/output)
and the precomputed-rel-bias forward — exactly what the funnel dispatches.
Weights are random-initialized (numerics identical to converted checkpoints,
so throughput is representative).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def bench_depth_fps():
    small = os.environ.get("BENCH_SMALL", "0") == "1"
    # batch re-sweep on v5e after flash kernel v2 + einsum layout (round 5):
    # b4 81.3, b8 89.9, b16 95.7, b32 94.9 fps — the round-2 b8 optimum
    # (then: b8 72.9 > b16 66.2) moved to b16 once attention stopped being
    # the stall: the cheaper kernel leaves the dense matmuls exposed and
    # they amortize better at the larger batch
    batch = int(os.environ.get("BENCH_BATCH", "4" if small else "16"))
    iters = int(os.environ.get("BENCH_ITERS", "2" if small else "8"))
    size = 128 if small else 512
    model_id = 6 if small else 1  # midas_small for smoke, beit_large_512 real

    import jax.numpy as jnp
    from depthmap_tpu.pipeline.depth import DepthPredictor
    pred = DepthPredictor(model_id)

    # production preprocessed input shape for this model (minimal resize is
    # identity at the native net size), already batched
    rng = np.random.default_rng(0)
    base = rng.random((batch, size, size, 3)).astype(np.float32)
    net_size = None

    def dispatch(x):
        return pred._apply(x, size, size, net_size)

    # distinct inputs per iteration (the axon tunnel caches identical
    # dispatches and block_until_ready does not force execution); fence with
    # a tiny host read of the last output
    xs = [jnp.asarray(base + np.float32(i) * np.float32(1e-3))
          for i in range(iters)]

    _ = np.asarray(dispatch(xs[0])[0, :1, :1])  # compile + warmup

    best_dt = float("inf")
    for _trial in range(2):    # best-of-2: tunnel latency is noisy
        t0 = time.perf_counter()
        outs = [dispatch(xi) for xi in xs]
        _ = np.asarray(outs[-1][0, :1, :1])  # in-order queue: last fences all
        best_dt = min(best_dt, time.perf_counter() - t0)

    fps = batch * iters / best_dt
    return {
        "metric": f"depth_fps_{size}px_{pred.spec.name}_b{batch}",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 30.0, 3),
    }


def bench_video_e2e_fps():
    """Second BASELINE metric: 1080p video depth+stereo SBS end-to-end
    (model forward at net size + upsample to 1080p + i16 conversion + stereo
    SBS warp per frame, frames batched) — target >= 24 fps."""
    small = os.environ.get("BENCH_SMALL", "0") == "1"
    batch = int(os.environ.get("BENCH_E2E_BATCH", "2" if small else "8"))
    iters = int(os.environ.get("BENCH_E2E_ITERS", "2" if small else "4"))
    h, w = (120, 160) if small else (1080, 1920)
    model_id = 6 if small else 1
    net = 128 if small else 512

    import jax
    import jax.numpy as jnp
    from depthmap_tpu.pipeline.depth import DepthPredictor
    from depthmap_tpu.ops import numerics
    from depthmap_tpu.ops.stereo import stereo_pair_batch

    pred = DepthPredictor(model_id)
    rng = np.random.default_rng(0)
    frames = rng.random((batch, net, net, 3)).astype(np.float32)
    images_u8 = (rng.random((batch, h, w, 3)) * 255).astype(np.uint8)
    div_px = (2.5 / 100.0) * w

    @jax.jit
    def derive(raw, imgs):
        # normalize -> i16 -> SBS stereo (the funnel's per-frame device work)
        lo = raw.min(axis=(1, 2), keepdims=True)
        hi = raw.max(axis=(1, 2), keepdims=True)
        out01 = (raw - lo) / jnp.maximum(hi - lo, 1e-6)
        i16 = numerics.convert_to_i16(out01)
        nd = out01
        left, right = stereo_pair_batch(imgs, nd, div_px / 2, -div_px / 2,
                                        0.0, 0.0, 2.0, "naive")
        return i16, left, right

    def step(x, imgs):
        raw = pred._apply(x, h, w, None)
        return derive(raw, imgs)

    xs = [jnp.asarray(frames + np.float32(i) * 1e-3) for i in range(iters)]
    imgs = jnp.asarray(images_u8)
    out = step(xs[0], imgs)
    _ = np.asarray(out[1][0, :1, :1])    # compile + warmup

    best_dt = float("inf")
    for _trial in range(2):
        t0 = time.perf_counter()
        for xi in xs:
            out = step(xi, imgs)
        _ = np.asarray(out[1][0, :1, :1])
        best_dt = min(best_dt, time.perf_counter() - t0)

    fps = batch * iters / best_dt
    return {
        "metric": f"video_depth_stereo_fps_{h}p_{pred.spec.name}_b{batch}",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 24.0, 3),
    }


def measure_link_bandwidth():
    """Host<->device transfer bandwidth (MB/s), so the e2e numbers below are
    interpretable: under the axon tunnel downloads run ~11 MB/s (vs ~12 GB/s
    PCIe on a real TPU host), so any metric that downloads full-res maps
    measures the link, not the framework."""
    import jax
    import jax.numpy as jnp
    mb = 8
    host = np.random.default_rng(0).random((mb << 20) // 4).astype(np.float32)
    t0 = time.perf_counter()
    dev = jnp.asarray(host)
    dev.block_until_ready()
    up = mb / (time.perf_counter() - t0)
    _ = np.asarray((dev + 0.5)[:1])   # warm the add program + download path
    t0 = time.perf_counter()
    _ = np.asarray(dev + 1.0)   # distinct value: defeat transfer dedupe
    down = mb / (time.perf_counter() - t0)
    return {"metric": "link_bandwidth", "upload_mb_s": round(up, 1),
            "download_mb_s": round(down, 1), "unit": "MB/s"}


def bench_funnel_e2e_fps():
    """Funnel-level throughput: PIL image in -> 16-bit depth PIL out through
    the REAL core_generation_funnel (preprocess, upload, forward, fused
    finalize+i16, download of the uint16 map, PIL wrap) — everything the
    device-only headline excludes.  No staging tricks: fresh images each
    iteration."""
    small = os.environ.get("BENCH_SMALL", "0") == "1"
    size = 128 if small else 512
    model_id = 6 if small else 1
    n = 4 if small else 16

    from PIL import Image
    from depthmap_tpu.options import GenerationOptions
    from depthmap_tpu.pipeline.core import PredictorCache, \
        core_generation_funnel

    rng = np.random.default_rng(0)
    imgs = [Image.fromarray((rng.random((size, size, 3)) * 255)
                            .astype(np.uint8)) for _ in range(n)]
    inp = GenerationOptions(model_type=model_id, net_width=size,
                            net_height=size, do_output_depth=True)
    cache = PredictorCache()

    def run(images):
        results = list(core_generation_funnel(None, images, None, None, inp,
                                              predictor_cache=cache))
        assert len(results) == len(images)
        return results

    run(imgs[:2])                      # compile + warmup
    best_dt = float("inf")
    for _trial in range(2):
        t0 = time.perf_counter()
        run(imgs)
        best_dt = min(best_dt, time.perf_counter() - t0)
    fps = n / best_dt
    return {
        "metric": f"funnel_e2e_fps_{size}px_model{model_id}",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "note": "host transfers + preprocessing + PIL included",
    }


def bench_funnel_transfer_split():
    """VERDICT r3 next-#7: make the 'compute-bound on PCIe hosts' claim a
    measurement.  The funnel overlaps uploads/downloads with compute, so
    subtracting the serial transfer time from the e2e frame time is
    invalid on this ~30 MB/s tunnel (the serial transfer time alone can
    exceed the e2e frame time).  The projection is instead built
    bottom-up from direct measurements of the two things a PCIe host
    serializes per frame:
      host work   = PIL->RGB + preprocess + PIL wrap of the i16 map
      device work = forward + fused finalize on a staged device input,
                    result left on device
    projected_pcie_host_fps = 1 / (host + device); one frame's ~3.5 MB
    round trip costs <0.5 ms on a >=10 GB/s PCIe link."""
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from depthmap_tpu.pipeline.core import PredictorCache
    from depthmap_tpu.pipeline.depth import _finalize_i16_jit

    small = os.environ.get("BENCH_SMALL", "0") == "1"
    size = 128 if small else 512
    model_id = 6 if small else 1
    n = 4 if small else 16

    predictor = PredictorCache().get(model_id)
    rng = np.random.default_rng(0)
    imgs = [Image.fromarray((rng.random((size, size, 3)) * 255)
                            .astype(np.uint8)) for _ in range(n)]

    # -- host-side work per frame (pure CPU; same on any host) --
    i16_host = np.zeros((size, size), np.uint16)

    def host_once(im):
        img01 = np.asarray(im.convert("RGB")).astype(np.float32) / 255.0
        x = predictor._prep(img01, size, size)
        Image.fromarray(i16_host)
        return x

    x0 = host_once(imgs[0])
    t0 = time.perf_counter()
    for im in imgs:
        host_once(im)
    host_pf = (time.perf_counter() - t0) / n

    # -- device compute per frame: staged inputs, result left on device.
    # Distinct inputs + a scalar fence on the LAST output: the axon tunnel
    # caches identical dispatches and block_until_ready does not force
    # execution (same hazard bench_depth_fps fences against); the in-order
    # queue makes the last read fence all n dispatches, and the fence RTT
    # itself is ~0.07 ms.
    net_size = (size, size) if predictor.bundle.prep_in_model else None
    xdevs = [jnp.asarray(x0 + np.float32(i) * np.float32(1e-3))
             for i in range(n)]

    def dev_once(xdev):
        raw = predictor._apply(xdev, size, size, net_size)[0]
        return _finalize_i16_jit(raw, predictor.raw_prediction_invert,
                                 False, "Range", 0.0, 1.0)

    _ = np.asarray(dev_once(xdevs[0])[:1, :1])   # compile + warm
    device_pf = float("inf")
    for _trial in range(2):
        t0 = time.perf_counter()
        outs = [dev_once(x) for x in xdevs]
        _ = np.asarray(outs[-1][:1, :1])
        device_pf = min(device_pf, (time.perf_counter() - t0) / n)

    # -- serial cost of one frame's transfer volume on THIS link --
    up = np.random.default_rng(1).random(
        (1, size, size, 3)).astype(np.float32)
    dev = jax.device_put(jnp.zeros((size, size), jnp.uint16))
    _ = np.asarray(dev)

    def xfer_once():
        d = jax.device_put(up)
        jax.block_until_ready(d)
        _ = np.asarray(dev)

    xfer_once()
    t0 = time.perf_counter()
    for _ in range(n):
        xfer_once()
    transfer_pf = (time.perf_counter() - t0) / n

    e2e = bench_funnel_e2e_fps()
    projected_pf = host_pf + device_pf
    return {
        "metric": f"funnel_e2e_transfer_split_{size}px",
        "e2e_fps": e2e["value"],
        "transfer_ms_per_frame": round(transfer_pf * 1e3, 1),
        "host_ms_per_frame": round(host_pf * 1e3, 1),
        "device_ms_per_frame": round(device_pf * 1e3, 1),
        "projected_pcie_host_fps": round(1.0 / projected_pf, 2),
        "unit": "frames/sec",
        "note": "transfer = serial tunnel cost of one frame's up+down "
                "volume (overlapped with compute in the real funnel); "
                "projected = measured host work + device compute, the "
                "per-frame serial path on a PCIe host where transfers "
                "are ~free",
    }


def bench_video_e2e_fill_fps(fill: str, shard: bool = False):
    """1080p video depth+stereo with the PRODUCTION derive chain: batched
    depth pass (predict_batch, as gen_video pass 1), host global scaling,
    per-frame i16 + create_stereoimages with the given fill — the shipping
    default is polylines_sharp (the Pallas device rasterizer); 'naive' is
    the device-fill comparison point.  All transfers included.  With
    shard=True the fill is forced through the shard_map row-split dispatch
    (the multi-chip production path, ops/polylines_pallas.py)."""
    small = os.environ.get("BENCH_SMALL", "0") == "1"
    h, w = (120, 160) if small else (1080, 1920)
    net = 128 if small else 512
    model_id = 6 if small else 1
    n = 2 if small else 8

    from depthmap_tpu.ops import numerics
    from depthmap_tpu.ops.stereo import create_stereoimages
    from depthmap_tpu.pipeline.depth import DepthPredictor
    from depthmap_tpu.pipeline.video_mode import process_predictions

    import jax.numpy as jnp

    pred = DepthPredictor(model_id)
    rng = np.random.default_rng(0)
    frames01 = rng.random((n, h, w, 3)).astype(np.float32)
    frames_u8 = (frames01 * 255).astype(np.uint8)

    def run(stack01):
        preds = pred.predict_batch(stack01, net, net)       # (n, h, w) f32
        preds = process_predictions(list(preds), "none")    # global scaling
        outs = []
        for i in range(len(preds)):
            d = np.clip(preds[i], 0, 1)
            # production funnel path: host twin, no device roundtrip
            i16 = numerics.convert_to_i16_np(d)
            sbs = create_stereoimages(frames_u8[i], i16, 2.5, 0.0,
                                      ["left-right"],
                                      fill_technique=fill)[0]
            outs.append((i16, sbs))
        return outs

    prev_shard = os.environ.get("DEPTHMAP_POLYLINES_SHARD")
    if shard:
        os.environ["DEPTHMAP_POLYLINES_SHARD"] = "1"
    try:
        run(frames01[:n])              # compile + warmup (all shapes)
        best_dt = float("inf")
        for _trial in range(2):
            t0 = time.perf_counter()
            outs = run(frames01 + np.float32(1e-3))
            assert len(outs) == n
            best_dt = min(best_dt, time.perf_counter() - t0)
    finally:
        if shard:                      # restore, don't drop, a user export
            if prev_shard is None:
                del os.environ["DEPTHMAP_POLYLINES_SHARD"]
            else:
                os.environ["DEPTHMAP_POLYLINES_SHARD"] = prev_shard
    fps = n / best_dt
    import jax
    tag = f"_sharded_{len(jax.devices())}dev" if shard else ""
    return {
        "metric": f"video_e2e_fps_{h}p_fill_{fill}{tag}",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "note": "production derive chain, host transfers included",
    }


def bench_model_fps(model_id: int, size: int, batch: int = 8,
                    iters: int = 6):
    """Depth fps for one model family at its default net size (production
    dispatch path, same protocol as the headline)."""
    import jax.numpy as jnp
    from depthmap_tpu.pipeline.depth import DepthPredictor
    pred = DepthPredictor(model_id)
    rng = np.random.default_rng(0)
    base = rng.random((batch, size, size, 3)).astype(np.float32)
    xs = [jnp.asarray(base + np.float32(i) * np.float32(1e-3))
          for i in range(iters)]

    def dispatch(x):
        return pred._apply(x, size, size, None)

    _ = np.asarray(dispatch(xs[0])[0, :1, :1])
    best_dt = float("inf")
    for _trial in range(2):
        t0 = time.perf_counter()
        outs = [dispatch(xi) for xi in xs]
        _ = np.asarray(outs[-1][0, :1, :1])
        best_dt = min(best_dt, time.perf_counter() - t0)
    fps = batch * iters / best_dt
    return {
        "metric": f"depth_fps_{size}px_{pred.spec.name}_b{batch}",
        "value": round(fps, 2),
        "unit": "frames/sec",
    }


def bench_marigold_seconds():
    """Marigold seconds/image at the production config (768 processing res,
    ensemble 5, 12 DDIM steps, batched ensemble).  The SD2 UNet keeps
    self-attention at the full latent resolution (N = 6912 tokens @768);
    routing it through the Pallas flash kernel took this from 127 s to
    ~5 s/image on v5e."""
    small = os.environ.get("BENCH_SMALL", "0") == "1"
    from depthmap_tpu.pipeline.depth import DepthPredictor
    pred = DepthPredictor(10)
    rng = np.random.default_rng(0)
    h, w, res = (96, 128, 128) if small else (384, 512, 768)
    img = rng.random((h, w, 3)).astype(np.float32)
    _ = pred.predict(img, res, res)               # compile
    best = float("inf")
    for i in range(2):
        t0 = time.perf_counter()
        out = pred.predict(img + np.float32(1e-4) * (i + 1), res, res)
        assert np.isfinite(out).all()
        best = min(best, time.perf_counter() - t0)
    return {
        "metric": f"marigold_seconds_per_image_res{res}_e5_s12",
        "value": round(best, 2),
        "unit": "s/image",
    }


def bench_boost_seconds():
    """Boost (multi-resolution merge) seconds/image — the flow the reference
    calls 'very slow' (README.md:46).  Patch double-estimates and pix2pix
    merges are batched on TPU; random weights, throughput-representative."""
    from depthmap_tpu.pipeline.boost import BoostEngine
    from depthmap_tpu.pipeline.depth import DepthPredictor
    small = os.environ.get("BENCH_SMALL", "0") == "1"
    model_id = 6 if small else 1
    h, w = (96, 128) if small else (768, 1024)
    pred = DepthPredictor(model_id)
    eng = BoostEngine(pred)
    if small:   # the 1024^2 merge can't shrink (10-down U-Net), but the
        eng.rf = 64  # receptive field / patch count can
    rng = np.random.default_rng(0)
    imgs = [rng.random((h, w, 3)).astype(np.float32) for _ in range(2)]
    for im in imgs:                 # warmup covers every R_x bucket the
        _ = eng.estimate(im)        # timed images will hit (steady state)
    best = float("inf")
    for im in imgs:
        t0 = time.perf_counter()
        out = eng.estimate(im)
        assert out.shape == (h, w)
        best = min(best, time.perf_counter() - t0)
    return {
        "metric": f"boost_seconds_per_image_{w}x{h}_{pred.spec.name}",
        "value": round(best, 2),
        "unit": "s/image",
    }


def bench_ldi_mesh_seconds():
    """Inpainted-mesh (3D photo) generation seconds/image at 384x512 — the
    reference's vispy/networkx pipeline takes minutes at this size.  Runs the
    geometry + propagation-fallback inpaint path (no net weights in env);
    host-side (the LDI graph build is CPU work in both implementations)."""
    from depthmap_tpu.pipeline.inpaint_mesh import write_mesh
    import tempfile
    rng = np.random.default_rng(0)
    h, w = 384, 512
    img = rng.random((h, w, 3)).astype(np.float32)
    depth = np.full((h, w), 2.0, np.float32)
    depth[:, :w // 2] = 4.0           # plane tear
    yy, xx = np.mgrid[:h, :w]
    depth[(yy - 200) ** 2 + (xx - 300) ** 2 < 60 ** 2] = 1.2  # occluder
    int_mtx = np.array([[max(h, w), 0, w / 2], [0, max(h, w), h / 2],
                        [0, 0, 1]], np.float32)
    config = {"save_obj": True, "save_ply": False, "sparse_iter": 2}
    with tempfile.TemporaryDirectory() as td:
        dt = float("inf")
        for i in range(2):      # first pass pays the jit compiles
            t0 = time.perf_counter()
            write_mesh(img, depth, int_mtx, os.path.join(td, f"m{i}.obj"),
                       config, None)
            dt = min(dt, time.perf_counter() - t0)
    return {
        "metric": f"ldi_mesh_seconds_{w}x{h}_no_nets",
        "value": round(dt, 2),
        "unit": "s/image",
    }


def bench_stereo_pairs_1080p():
    """BASELINE metric 2: stereo SBS pairs/sec at 1080p, device-resident,
    at the production default config (divergence 2.5%, balance 0 ->
    +-1.25% = 24 px per eye, fill polylines_sharp vs naive).  The
    polylines fill runs the Pallas rasterizer (ops/polylines_pallas.py);
    the host C++ kernel is timed for reference."""
    import jax
    import jax.numpy as jnp
    from depthmap_tpu.ops.stereo import stereo_pair_batch
    from depthmap_tpu.ops.polylines import _get_lib, _polylines_native
    from depthmap_tpu.ops.polylines_pallas import polylines_rasterize_pallas

    rng = np.random.default_rng(0)
    small = os.environ.get("BENCH_SMALL", "0") == "1"
    h, w = (120, 256) if small else (1080, 1920)
    img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    ndh = rng.random((h, w)).astype(np.float32)
    di, dn = jnp.asarray(img), jnp.asarray(ndh)
    div_eye = 1.25 / 100 * w                    # per-eye after balance

    rows = []

    def time_pallas():
        both = lambda: (polylines_rasterize_pallas(di, dn, div_eye, 0.0,
                                                   1.0, True),
                        polylines_rasterize_pallas(di, dn, -div_eye, 0.0,
                                                   1.0, True))
        l, r = both()
        _ = np.asarray(l[0, 0]), np.asarray(r[0, 0])
        best = 1e9
        for _t in range(3):
            t0 = time.perf_counter()
            for _i in range(4):
                l, r = both()
            _ = np.asarray(l[0, 0]), np.asarray(r[0, 0])
            best = min(best, (time.perf_counter() - t0) / 4)
        return 1.0 / best

    pal = time_pallas()
    rows.append({"metric": f"stereo_sbs_pairs_per_sec_{h}p_polylines_sharp",
                 "value": round(pal, 2), "unit": "pairs/sec (device)",
                 "vs_baseline": round(pal / 24, 3)})

    # same kernel through the PRODUCTION multi-chip dispatch (shard_map row
    # split, ops/polylines_pallas.py _rasterize_rows_sharded) forced onto
    # this host's devices — proves the benched path IS the sharded one;
    # with one chip the value matches the row above to dispatch noise and
    # scales with the mesh on real multi-chip hosts (rows are independent)
    prev_shard = os.environ.get("DEPTHMAP_POLYLINES_SHARD")
    os.environ["DEPTHMAP_POLYLINES_SHARD"] = "1"
    try:
        n_dev = len(jax.devices())
        pal_sh = time_pallas()
        rows.append(
            {"metric": f"stereo_sbs_pairs_per_sec_{h}p_polylines_sharp_"
                       f"sharded_{n_dev}dev",
             "value": round(pal_sh, 2), "unit": "pairs/sec (device)",
             "vs_baseline": round(pal_sh / 24, 3)})
    finally:                           # restore, don't drop, a user export
        if prev_shard is None:
            del os.environ["DEPTHMAP_POLYLINES_SHARD"]
        else:
            os.environ["DEPTHMAP_POLYLINES_SHARD"] = prev_shard

    imgs = jnp.asarray(img[None])
    nds = jnp.asarray(ndh[None])
    l, r = stereo_pair_batch(imgs, nds, div_eye, -div_eye, 0.0, 0.0, 1.0,
                             "naive")
    _ = np.asarray(l[0, 0, 0])
    best = 1e9
    for _t in range(3):
        t0 = time.perf_counter()
        for _i in range(4):
            l, r = stereo_pair_batch(imgs, nds, div_eye, -div_eye, 0.0,
                                     0.0, 1.0, "naive")
        _ = np.asarray(l[0, 0, 0]), np.asarray(r[0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / 4)
    rows.append({"metric": f"stereo_sbs_pairs_per_sec_{h}p_naive",
                 "value": round(1.0 / best, 2), "unit": "pairs/sec (device)",
                 "vs_baseline": round(1.0 / best / 24, 3)})

    if _get_lib() is not None:
        t0 = time.perf_counter()
        _polylines_native(img, ndh.astype(np.float64), div_eye, 0, 1.0, True)
        _polylines_native(img, ndh.astype(np.float64), -div_eye, 0, 1.0,
                          True)
        dt = time.perf_counter() - t0
        rows.append({"metric":
                     f"stereo_sbs_pairs_per_sec_{h}p_polylines_host_cpp",
                     "value": round(1.0 / dt, 2), "unit": "pairs/sec (host)",
                     "vs_baseline": round(1.0 / dt / 24, 3)})
    return rows


def _headline_with_retry():
    # The tunneled TPU backend occasionally drops a dispatch with a
    # transient FAILED_PRECONDITION (observed once in round 5: the very
    # first warmup dispatch died and took the whole bench with it).  The
    # headline is the one row the driver requires, so retry it a couple of
    # times with a backoff before giving up.
    last = None
    for attempt in range(3):
        try:
            return bench_depth_fps()
        except Exception as e:  # jax.errors.JaxRuntimeError et al.
            last = e
            print(f"headline attempt {attempt + 1} failed: {e}",
                  file=sys.stderr)
            time.sleep(30 * (attempt + 1))
    raise last


def main():
    headline = _headline_with_retry()
    extra = []
    if os.environ.get("BENCH_SKIP_E2E", "0") != "1":
        try:
            extra.extend(bench_stereo_pairs_1080p())
        except Exception as e:
            extra.append({"metric": "stereo_sbs_pairs_1080p",
                          "error": str(e)})
        e2e_rows = [("link_bandwidth", measure_link_bandwidth),
                    ("funnel_e2e_transfer_split",
                     bench_funnel_transfer_split),
                    ("video_device_derive", bench_video_e2e_fps),
                    ("video_e2e_naive",
                     lambda: bench_video_e2e_fill_fps("naive")),
                    ("video_e2e_polylines_sharp",
                     lambda: bench_video_e2e_fill_fps("polylines_sharp")),
                    # VERDICT r4 #10: same pipeline through the PRODUCTION
                    # multi-chip dispatch (shard_map row split) — on one
                    # chip it matches the row above; on a v5e-8 the fill
                    # splits 8 ways
                    ("video_e2e_polylines_sharp_sharded",
                     lambda: bench_video_e2e_fill_fps(
                         "polylines_sharp", shard=True))]
        for name, fn in e2e_rows:
            try:
                extra.append(fn())
            except Exception as e:  # the headline line must still print
                extra.append({"metric": name, "error": str(e)})
    if os.environ.get("BENCH_EXTRA_MODELS", "0") == "1":
        # per-family throughput (opt-in: adds several compiles)
        small = os.environ.get("BENCH_SMALL", "0") == "1"
        families = (((6, 128),) if small else
                    ((13, 518),   # depth_anything_v2 base (UI default)
                     (7, 512),    # zoedepth_n
                     (0, 448)))   # leres res101
        for mid, size in families:
            try:
                extra.append(bench_model_fps(mid, size))
            except Exception as e:
                extra.append({"metric": f"model_{mid}", "error": str(e)})
        try:
            extra.append(bench_boost_seconds())
        except Exception as e:
            extra.append({"metric": "boost_seconds", "error": str(e)})
        try:
            extra.append(bench_marigold_seconds())
        except Exception as e:
            extra.append({"metric": "marigold_seconds", "error": str(e)})
        try:
            extra.append(bench_ldi_mesh_seconds())
        except Exception as e:
            extra.append({"metric": "ldi_mesh_seconds", "error": str(e)})
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_EXTRA.json"), "w") as f:
            json.dump({"headline": headline, "extra": extra}, f, indent=1)
    except OSError:
        pass
    print(json.dumps(headline))


if __name__ == "__main__":
    sys.exit(main())
