"""Depth prediction engine: the TPU-side replacement of the reference's
ModelHolder + estimate* wrappers (src/depthmap_generation.py:40-401).

Differences by design:
 * pure-functional: params are an explicit pytree, the forward is a jitted
   function cached per input-shape bucket (XLA recompile avoidance);
 * the output upsample back to source resolution runs on-device and fuses
   with the forward pass;
 * batching is first-class: predict() takes one image, predict_batch() maps a
   whole stack through one pjit-sharded call (frames/batch = data axis).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from depthmap_tpu.models.build import ModelBundle, build_model
from depthmap_tpu.pipeline.preprocess import preprocess_image
from depthmap_tpu.ops.resize import interpolate
from depthmap_tpu.registry import MODELS, resolve_model_type


# Per-model reduced-precision policy, mirroring the reference's fp16 table
# (depthmap_generation.py:262-276: .half() for 1-6, 8, 9, 11; depth_head +
# pretrained .half() for DA2 12-14; full precision for LeReS 0, zoedepth_n 7
# — "completely trips" in reduced precision — and Marigold 10).  bfloat16 is
# the TPU-native reduced dtype (same exponent range as f32); all MXU
# accumulation stays f32, and every model's final head emits f32 so the
# 16-bit depth map never quantizes through an 8-bit mantissa.
BF16_MODEL_TYPES = frozenset({1, 2, 3, 4, 5, 6, 8, 9, 11, 12, 13, 14})


def default_compute_dtype(model_type: int):
    import os
    env = os.environ.get("DEPTHMAP_COMPUTE_DTYPE")
    if env:
        return jnp.dtype(env)
    return jnp.bfloat16 if model_type in BF16_MODEL_TYPES else jnp.float32


@functools.partial(jax.jit, static_argnames=("invert", "clip", "clip_mode"))
def _finalize_i16_jit(raw, invert: bool, clip: bool, clip_mode: str,
                      clip_far, clip_near):
    """finalize_depth + convert_to_i16 fused on device (the funnel's
    post-prediction chain, reference src/core.py:189-211 + :44-50)."""
    from depthmap_tpu.ops import numerics
    out = numerics.finalize_depth(raw, invert=invert, clip=clip,
                                  clip_mode=clip_mode, clip_far=clip_far,
                                  clip_near=clip_near)
    return numerics.convert_to_i16(jnp.clip(out, 0.0, 1.0))


@functools.partial(jax.jit, static_argnames=("invert", "clip", "clip_mode"))
def _finalize_i16_batch_jit(raw, invert: bool, clip: bool, clip_mode: str,
                            clip_far, clip_near):
    """Per-image finalize over a (N, H, W) stack — each frame normalizes
    against its OWN min/max, exactly like the serial funnel."""
    return jax.vmap(lambda r: _finalize_i16_jit.__wrapped__(
        r, invert, clip, clip_mode, clip_far, clip_near))(raw)


class DepthPredictor:
    """Loads/initializes one depth model and runs jit-compiled inference."""

    def __init__(self, model_type, params: Optional[Any] = None,
                 weights_dir: str = "./models", seed: int = 0,
                 compute_dtype=None, tiling_mode: bool = False,
                 marigold_ensembles: int = 5, marigold_steps: int = 12,
                 device: Optional[str] = None):
        from depthmap_tpu.models.layers import set_tiling_mode
        # device: None = the default accelerator; "cpu" = force host compute
        # (the funnel's GPU/CPU selector, reference core.py:113-121)
        self._device = None
        if device is not None:
            platform = str(device).lower()
            try:
                self._device = jax.devices(platform)[0]
            except RuntimeError:
                print(f"compute device {device!r} unavailable; "
                      "using the default backend")
        self.model_type = resolve_model_type(model_type)
        self.spec = MODELS[self.model_type]
        self.tiling_mode = tiling_mode
        self.marigold_ensembles = marigold_ensembles
        self.marigold_steps = marigold_steps
        set_tiling_mode(tiling_mode)  # trace-time flag for all convs
        self.bundle: ModelBundle = build_model(self.model_type)
        explicit_dtype = compute_dtype is not None
        if compute_dtype is None:
            compute_dtype = default_compute_dtype(self.model_type)
        self.compute_dtype = jnp.dtype(compute_dtype)
        # Selective precision for zoedepth_n (VERDICT r2 #7): whole-model
        # bf16 drifts too much for a metric head (mean rel 1.2%, p99 3.6% —
        # PARITY.md), but the drift lives in the bins/attractors/log-binomial
        # head, not the BEiT relative-depth core.  Run the core bf16, the
        # head f32: measured drift vs full-f32 is far smaller (PARITY.md
        # round 3).  DEPTHMAP_ZOE_CORE_DTYPE=float32 opts out; an explicit
        # compute_dtype (no_half / DEPTHMAP_COMPUTE_DTYPE) wins.
        import os
        self.core_dtype = self.compute_dtype
        if (self.model_type == 7 and not explicit_dtype
                and "DEPTHMAP_COMPUTE_DTYPE" not in os.environ):
            self.core_dtype = jnp.dtype(
                os.environ.get("DEPTHMAP_ZOE_CORE_DTYPE", "bfloat16"))
        # zoedepth_k / _nk (VERDICT r4 #7): the reference runs these .half()
        # whole-model (depthmap_generation.py:262-276); measured on v5e
        # (benchmarks/zoe_knk_precision.py, PARITY round 5) the
        # zoedepth_n-style split — bf16 relative-depth core, f32 metric
        # head — costs ~0.3% fps and HALVES the metric drift (k: abs_rel
        # 1.16% -> 0.52%; nk: 0.30% -> 0.12% vs f32), so selective is the
        # default.  DEPTHMAP_ZOE_KNK_HEAD_F32=0 restores the reference's
        # whole-model reduced precision.
        if (self.model_type in (8, 9) and not explicit_dtype
                and "DEPTHMAP_COMPUTE_DTYPE" not in os.environ
                and os.environ.get("DEPTHMAP_ZOE_KNK_HEAD_F32") != "0"):
            self.compute_dtype = jnp.dtype(jnp.float32)
            self.core_dtype = jnp.dtype("bfloat16")
        if self.model_type in (7, 8, 9) and \
                self.core_dtype != self.compute_dtype:
            import dataclasses
            m = self.bundle.module
            self.bundle = dataclasses.replace(
                self.bundle,
                module=m.copy(model=m.model.copy(
                    core_dtype=self.core_dtype)))
        self._jit_cache: Dict[Tuple, Any] = {}
        self._bias_cache: Dict[Tuple, Any] = {}
        if self.model_type == 10:   # Marigold pipeline manages its own state
            self._try_load_marigold(weights_dir)
            self.variables = None
            return
        if params is None:
            params = self._try_load_weights(weights_dir)
        if params is None:
            params = self._random_init(seed)
        # cast float params to the compute dtype and place on device ONCE
        # (converted checkpoints arrive as host numpy; without this every
        # dispatch would re-upload the weights).  One jitted program for the
        # whole tree: eager per-leaf casts compile one tiny XLA program per
        # distinct shape (~0.4 s each through remote compile — minutes of
        # startup for a 200-leaf model)
        dt = self.compute_dtype
        cdt = self.core_dtype

        def _cast_to(d):
            def f(a):
                if jnp.issubdtype(a.dtype, jnp.floating):
                    return a.astype(d)
                return a
            return f

        def _cast_tree(tree):
            if cdt == dt:
                return jax.tree.map(_cast_to(dt), tree)
            # selective: the relative-depth core runs in core_dtype, the
            # metric head stays in compute_dtype (f32)
            p = jax.tree.map(_cast_to(dt), tree["params"])
            core = jax.tree.map(_cast_to(cdt), tree["params"]["model"]["core"])
            p = {**p, "model": {**p["model"], "core": core}}
            return {**tree, "params": p}

        with self._device_scope():
            self.variables = jax.jit(_cast_tree)(params)

    def _device_scope(self):
        """Context placing dispatches on the selected device (no-op for the
        default accelerator)."""
        import contextlib
        if self._device is None:
            return contextlib.nullcontext()
        return jax.default_device(self._device)

    # -- init / weights ----------------------------------------------------
    def _random_init(self, seed: int):
        h = w = self.spec.resize_multiple_of * 8
        x = jnp.zeros((1, h, w, 3), jnp.float32)
        # jit the init: un-jitted flax init dispatches op-by-op (thousands of
        # ~ms-latency launches through the TPU tunnel -> minutes of startup);
        # one compiled program brings it to seconds
        with self._device_scope():
            return jax.jit(self.bundle.module.init)(
                jax.random.PRNGKey(seed), x)

    def _try_load_marigold(self, weights_dir: str):
        """Swap converted SD2/Marigold weights into the pipeline when the
        diffusers checkpoint tree is on disk (downloadable via
        utils.download.ensure_marigold_downloaded)."""
        import os
        model_dir = os.path.join(weights_dir, "marigold")
        if not os.path.isdir(model_dir) and \
                os.environ.get("DEPTHMAP_ALLOW_DOWNLOAD") == "1":
            try:
                from depthmap_tpu.utils.download import \
                    ensure_marigold_downloaded
                model_dir = ensure_marigold_downloaded(weights_dir)
            except Exception as e:
                print(f"Marigold download failed ({e})")
        if os.path.isdir(model_dir):
            try:
                from depthmap_tpu.models.marigold.convert import \
                    load_marigold_checkpoint
                self.bundle.module.set_variables(
                    load_marigold_checkpoint(model_dir))
            except FileNotFoundError:
                pass

    def _try_load_weights(self, weights_dir: str):
        import os
        try:
            from depthmap_tpu.models.convert import load_converted_weights
            try:
                return load_converted_weights(self.model_type, weights_dir)
            except FileNotFoundError:
                if os.environ.get("DEPTHMAP_ALLOW_DOWNLOAD") == "1":
                    from depthmap_tpu.utils.download import \
                        ensure_model_downloaded
                    ensure_model_downloaded(self.model_type, weights_dir)
                    return load_converted_weights(self.model_type,
                                                  weights_dir)
                return None
        except (FileNotFoundError, ImportError, KeyError,
                NotImplementedError):
            return None

    # -- inference ---------------------------------------------------------
    def _beit_hoist_info(self):
        """(backbone, backbone_params) when the model contains a BEiT
        backbone whose relative-position bias gather can be hoisted out of
        the per-frame forward: plain DPT (types 1/2) or the ZoeDepth stack
        (types 7-9, backbone at model.core.backbone)."""
        from depthmap_tpu.models.beit import BeitBackbone
        m = self.bundle.module
        bb = getattr(m, "backbone", None)
        if isinstance(bb, BeitBackbone):
            return bb, self.variables["params"]["backbone"]
        core = getattr(getattr(m, "model", None), "core", None)
        bb = getattr(core, "backbone", None)
        if isinstance(bb, BeitBackbone):
            return bb, self.variables["params"]["model"]["core"]["backbone"]
        return None, None

    @property
    def _beit_bias_hoist(self) -> bool:
        return self._beit_hoist_info()[0] is not None

    def _bias_hoist_ok(self, grid: Tuple[int, int]) -> bool:
        """Hoisting keeps all `depth` (H, N, N) bias tensors resident at
        once — the right trade for the hot streaming buckets (BEiT-L @512²:
        ~0.8 GB bf16), catastrophic at Boost's R_x-sized whole-image
        forwards (net 1152x1536 -> 24 x 16 x 6913² ≈ 73 GB).  Above the cap
        the forward computes each block's bias inline (peak = one bias)."""
        backbone, _ = self._beit_hoist_info()
        if backbone is None:
            return False
        n = grid[0] * grid[1] + 1
        resident = (backbone.depth * backbone.num_heads * n * n *
                    self.core_dtype.itemsize)
        return resident <= 2 << 30

    def _rel_biases(self, grid: Tuple[int, int]):
        if grid not in self._bias_cache:
            from depthmap_tpu.models.beit import precompute_rel_biases
            backbone, params = self._beit_hoist_info()
            self._bias_cache[grid] = precompute_rel_biases(
                backbone, params, grid, dtype=self.core_dtype)
        return self._bias_cache[grid]

    def _forward_fn(self, out_h: int, out_w: int,
                    net_size: Optional[Tuple[int, int]] = None,
                    hoist: Optional[bool] = None):
        if hoist is None:
            hoist = self._beit_bias_hoist
        key = (out_h, out_w, net_size, hoist)
        if key not in self._jit_cache:
            bundle = self.bundle
            dt = self.compute_dtype

            if bundle.prep_in_model and hoist:
                @jax.jit
                def run(variables, x, rel_bias):
                    pred = bundle.module.apply(variables, x.astype(dt),
                                               net_size=net_size,
                                               rel_bias=rel_bias)
                    return pred.astype(jnp.float32)
            elif bundle.prep_in_model:
                @jax.jit
                def run(variables, x):
                    pred = bundle.module.apply(variables, x.astype(dt),
                                               net_size=net_size)
                    return pred.astype(jnp.float32)
            elif hoist:
                @jax.jit
                def run(variables, x, rel_bias):
                    pred = bundle.module.apply(variables, x.astype(dt),
                                               rel_bias=rel_bias)
                    pred = pred[..., None].astype(jnp.float32)
                    return interpolate(pred, (out_h, out_w),
                                       bundle.upsample_mode,
                                       bundle.upsample_align_corners)[..., 0]
            else:
                @jax.jit
                def run(variables, x):
                    pred = bundle.module.apply(variables,
                                               x.astype(dt))  # (N, h', w')
                    pred = pred[..., None].astype(jnp.float32)
                    return interpolate(pred, (out_h, out_w),
                                       bundle.upsample_mode,
                                       bundle.upsample_align_corners)[..., 0]
            self._jit_cache[key] = run
        return self._jit_cache[key]

    def _apply(self, x, out_h: int, out_w: int,
               net_size: Optional[Tuple[int, int]] = None):
        """Dispatch one compiled forward on preprocessed input `x`."""
        with self._device_scope():
            backbone, _ = self._beit_hoist_info()
            if backbone is not None:
                if self.bundle.prep_in_model:
                    # ZoeDepth resizes internally; its net input size is a
                    # pure function of static shapes
                    # (ZoeDepthInference.net_input_size)
                    m = self.bundle.module
                    nh, nw = m.net_input_size(x.shape[1], x.shape[2],
                                              net_size, m.img_size)
                    grid = (nh // backbone.patch_size,
                            nw // backbone.patch_size)
                else:
                    grid = (x.shape[1] // backbone.patch_size,
                            x.shape[2] // backbone.patch_size)
                if self._bias_hoist_ok(grid):
                    run = self._forward_fn(out_h, out_w, net_size,
                                           hoist=True)
                    return run(self.variables, x, self._rel_biases(grid))
                run = self._forward_fn(out_h, out_w, net_size, hoist=False)
                return run(self.variables, x)
            run = self._forward_fn(out_h, out_w, net_size, hoist=False)
            return run(self.variables, x)

    def _prep(self, img01: np.ndarray, net_w: int, net_h: int,
              resize_mode: Optional[str] = None) -> np.ndarray:
        if self.bundle.prep_in_model:
            img01 = np.asarray(img01, np.float32)
            if self.bundle.preprocess.swap_channels:
                img01 = img01[:, :, ::-1]
            return img01[None]
        return preprocess_image(np.asarray(img01, np.float32), net_w, net_h,
                                self.bundle.preprocess, resize_mode)

    def predict(self, img01: np.ndarray, net_w: Optional[int] = None,
                net_h: Optional[int] = None,
                resize_mode: Optional[str] = None) -> np.ndarray:
        """img01: (H, W, 3) float RGB in [0,1] -> raw prediction (H, W).

        Equivalent of ModelHolder.get_raw_prediction for one image; the raw
        output keeps model conventions (disparity or depth — see
        spec.predicts_depth)."""
        if net_w is None or net_h is None:
            net_w, net_h = self.spec.default_net_size
        if self.model_type == 10:   # Marigold (estimatemarigold :504-513)
            import cv2
            depth = self.bundle.module(
                np.asarray(img01, np.float32), processing_res=net_w,
                ensemble_size=self.marigold_ensembles,
                denoising_steps=self.marigold_steps, match_input_res=False)
            return cv2.resize(depth, (img01.shape[1], img01.shape[0]),
                              interpolation=cv2.INTER_CUBIC)
        x = self._prep(img01, net_w, net_h, resize_mode)
        out_h, out_w = img01.shape[:2]
        net_size = (net_h, net_w) if self.bundle.prep_in_model else None
        pred = self._apply(jnp.asarray(x), out_h, out_w, net_size)
        return np.asarray(pred[0])

    def predict_finalized(self, img01: np.ndarray,
                          net_w: Optional[int] = None,
                          net_h: Optional[int] = None, *,
                          clip: bool = False, clip_mode: str = "Range",
                          clip_far: float = 0.0, clip_near: float = 1.0,
                          resize_mode: Optional[str] = None) -> np.ndarray:
        """Funnel fast path: forward -> finalize_depth -> convert_to_i16 as
        one device-resident chain; the ONLY device->host transfer is the
        final (H, W) uint16 map (half the bytes of the raw f32 map, and none
        of the funnel's former f32-down / f32-up / i16-down triple trip).
        Numerics identical to predict() + numerics.finalize_depth +
        convert_to_i16 (pinned by tests/test_pipeline.py)."""
        if net_w is None or net_h is None:
            net_w, net_h = self.spec.default_net_size
        if self.model_type == 10:   # Marigold: host pipeline, finalize on
            raw = jnp.asarray(self.predict(img01, net_w, net_h, resize_mode))
        else:
            x = self._prep(np.asarray(img01, np.float32), net_w, net_h,
                           resize_mode)
            out_h, out_w = img01.shape[:2]
            net_size = (net_h, net_w) if self.bundle.prep_in_model else None
            raw = self._apply(jnp.asarray(x), out_h, out_w, net_size)[0]
        with self._device_scope():
            i16 = _finalize_i16_jit(raw, self.raw_prediction_invert,
                                    bool(clip), str(clip_mode),
                                    float(clip_far), float(clip_near))
        return np.array(i16)

    def predict_finalized_batch(self, imgs01: np.ndarray,
                                net_w: Optional[int] = None,
                                net_h: Optional[int] = None, *,
                                clip: bool = False,
                                clip_mode: str = "Range",
                                clip_far: float = 0.0,
                                clip_near: float = 1.0,
                                resize_mode: Optional[str] = None
                                ) -> np.ndarray:
        """Batched fused funnel path: (N, H, W, 3) same-shape stack ->
        (N, H, W) uint16, one forward dispatch for the whole batch, each
        frame finalized against its own min/max.  Matches the serial
        predict_finalized up to conv-batching reassociation in the compute
        dtype (f32: within the i16 quantum; bf16: ~1 ULP of the raw
        prediction); the finalize itself vmaps per frame, so normalization
        is per-image exactly like the serial path."""
        if net_w is None or net_h is None:
            net_w, net_h = self.spec.default_net_size
        imgs01 = np.asarray(imgs01, np.float32)
        if self.model_type == 10:
            return np.stack([
                self.predict_finalized(f, net_w, net_h, clip=clip,
                                       clip_mode=clip_mode,
                                       clip_far=clip_far,
                                       clip_near=clip_near,
                                       resize_mode=resize_mode)
                for f in imgs01])
        return np.array(self._dispatch_finalized_batch(
            imgs01, net_w, net_h, clip=clip, clip_mode=clip_mode,
            clip_far=clip_far, clip_near=clip_near,
            resize_mode=resize_mode))

    def _dispatch_finalized_batch(self, imgs01: np.ndarray, net_w: int,
                                  net_h: int, *, clip: bool,
                                  clip_mode: str, clip_far: float,
                                  clip_near: float,
                                  resize_mode: Optional[str] = None):
        """Async half of predict_finalized_batch: returns the uint16 stack
        as a DEVICE array (dispatch only, no blocking download) so callers
        can keep the next chunk's forward in flight while this one
        downloads."""
        xs = np.concatenate([self._prep(f, net_w, net_h, resize_mode)
                             for f in imgs01], axis=0)
        out_h, out_w = imgs01.shape[1:3]
        net_size = (net_h, net_w) if self.bundle.prep_in_model else None
        raw = self._apply(self._shard_batch(xs), out_h, out_w, net_size)
        with self._device_scope():
            return _finalize_i16_batch_jit(raw, self.raw_prediction_invert,
                                           bool(clip), str(clip_mode),
                                           float(clip_far), float(clip_near))

    def predict_batch(self, imgs01: np.ndarray, net_w: Optional[int] = None,
                      net_h: Optional[int] = None,
                      resize_mode: Optional[str] = None) -> np.ndarray:
        """imgs01: (N, H, W, 3) same-shape stack -> (N, H, W) predictions.
        One compiled call over the batch — the TPU-side fast path for
        batch/video modes and Boost patches."""
        if net_w is None or net_h is None:
            net_w, net_h = self.spec.default_net_size
        if self.model_type == 10:   # Marigold: diffusion pipeline, no
            # single jittable forward — iterate (ensemble batching happens
            # inside the pipeline)
            return np.stack([
                self.predict(f, net_w, net_h, resize_mode)
                for f in np.asarray(imgs01, np.float32)])
        xs = np.concatenate([
            self._prep(f, net_w, net_h, resize_mode)
            for f in np.asarray(imgs01, np.float32)], axis=0)
        out_h, out_w = imgs01.shape[1:3]
        net_size = (net_h, net_w) if self.bundle.prep_in_model else None
        return np.asarray(self._apply(self._shard_batch(xs),
                                      out_h, out_w, net_size))

    def predict_batch_stream(self, stacks, net_w: Optional[int] = None,
                             net_h: Optional[int] = None,
                             resize_mode: Optional[str] = None):
        """Pipelined `predict_batch` over an iterable of same-shape
        (N, H, W, 3) stacks.  JAX dispatch is asynchronous, so the next
        chunk's preprocessing + forward dispatch happen BEFORE the previous
        chunk's device->host download blocks — transfers overlap device
        compute with one chunk in flight.  Yields (N, H, W) float32 arrays
        in input order.  (The reference runs video frames strictly
        serially, src/video_mode.py:148.)"""
        if net_w is None or net_h is None:
            net_w, net_h = self.spec.default_net_size
        if self.model_type == 10:   # Marigold: no single jittable forward
            for stack in stacks:
                yield self.predict_batch(stack, net_w, net_h, resize_mode)
            return
        pending = None
        for stack in stacks:
            stack = np.asarray(stack, np.float32)
            xs = np.concatenate([self._prep(f, net_w, net_h, resize_mode)
                                 for f in stack], axis=0)
            out_h, out_w = stack.shape[1:3]
            net_size = (net_h, net_w) if self.bundle.prep_in_model else None
            dev = self._apply(self._shard_batch(xs), out_h, out_w, net_size)
            if pending is not None:
                yield np.asarray(pending)
            pending = dev
        if pending is not None:
            yield np.asarray(pending)

    @staticmethod
    def _shard_batch(xs: np.ndarray):
        """Multi-chip: split the frame batch over the mesh data axis (frames
        are the data-parallel dimension, SURVEY.md §2.4); single-chip: plain
        device transfer."""
        devices = jax.devices()
        if len(devices) > 1 and xs.shape[0] % len(devices) == 0:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from depthmap_tpu.parallel.mesh import make_mesh
            mesh = make_mesh()
            sharding = NamedSharding(mesh, P("data", *([None] * (xs.ndim - 1))))
            return jax.device_put(jnp.asarray(xs), sharding)
        return jnp.asarray(xs)

    @property
    def raw_prediction_invert(self) -> bool:
        """True when near objects have *small* raw values
        (reference depthmap_generation.py:402)."""
        return self.spec.predicts_depth
