"""Marigold inference pipeline: VAE encode -> DDIM denoise -> decode ->
ensemble.

Parity with reference dmarigold/marigold/marigold_pipeline.py:
 * RGB encoded to latent and concatenated with the evolving depth latent
   (8ch UNet input, :300-317);
 * conditioning = empty-prompt CLIP embedding (:239, stored here as a
   converted parameter);
 * decode = VAE decode then channel mean (:345-359);
 * test-time ensembling of N affine-invariant predictions with scale/shift
   optimization (util/ensemble.py:24) via scipy minimize;
 * VRAM batch-size table replaced by a fixed TPU-friendly ensemble batch.
The denoise loop runs as jitted steps; the ensemble rides the batch axis.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from depthmap_tpu.models.marigold.ddim import DDIMScheduler
from depthmap_tpu.models.marigold.unet import MarigoldUNet
from depthmap_tpu.models.marigold.vae import VAE_SCALE, Decoder, Encoder


class MarigoldPipeline:
    compute_dtype = jnp.dtype(jnp.float32)   # class default; __init__ overrides

    def __init__(self, variables: Optional[dict] = None, seed: int = 0,
                 compute_dtype=None, encoder=None, decoder=None, unet=None):
        # encoder/decoder/unet overrides exist for tiny-config tests and
        # the multichip dryrun; production always uses the full nets
        self.encoder = encoder if encoder is not None else Encoder()
        self.decoder = decoder if decoder is not None else Decoder()
        self.unet = unet if unet is not None else MarigoldUNet()
        self.scheduler = DDIMScheduler()
        # Opt-in mixed precision (DEPTHMAP_MARIGOLD_DTYPE=bfloat16): the
        # VAE/UNet run in the reduced dtype while the DDIM latent state and
        # scheduler arithmetic stay f32 — the same selective split that
        # holds ZoeDepth's drift down (PARITY.md).  The reference keeps
        # Marigold out of its fp16 table (depthmap_generation.py:262-276),
        # so f32 stays the default here.
        if compute_dtype is None:
            import os
            env = os.environ.get("DEPTHMAP_MARIGOLD_DTYPE")
            compute_dtype = jnp.dtype(env) if env else jnp.float32
        self.compute_dtype = jnp.dtype(compute_dtype)
        if variables is None:
            variables = self._random_init(seed)
        self.set_variables(variables)
        self._enc = jax.jit(self.encoder.apply)
        self._dec = jax.jit(self.decoder.apply)
        self._unet = jax.jit(self.unet.apply)
        self._infer_cache = {}

    def set_variables(self, variables: dict) -> None:
        """Attach (converted) weights, applying the compute-dtype policy —
        use this instead of assigning ``.vars`` so mixed precision survives
        a post-construction weight load."""
        if self.compute_dtype != jnp.float32:
            def _cast(x):
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                          jnp.floating):
                    return jnp.asarray(x, self.compute_dtype)
                return x
            variables = jax.tree_util.tree_map(_cast, variables)
        self.vars = variables
        # new weights may be committed to a single device: drop the
        # replication cache so the next sharded run re-replicates them
        self._vars_mesh = None

    def _random_init(self, seed):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        x = jnp.zeros((1, 64, 64, 3))
        z = jnp.zeros((1, 8, 8, 4))
        u = jnp.zeros((1, 8, 8, 8))
        ctx = jnp.zeros((1, 77, self.unet.context_dim))
        # jitted init: one compiled program per net instead of op-by-op
        # dispatch (minutes through the TPU tunnel)
        return {
            "encoder": jax.jit(self.encoder.init)(k1, x),
            "decoder": jax.jit(self.decoder.init)(k2, z),
            "unet": jax.jit(self.unet.init)(
                k3, u, jnp.zeros((1,), jnp.int32), ctx),
            "empty_text_embed": jnp.zeros((1, 77, self.unet.context_dim),
                                          jnp.float32),
        }

    # -- core single inference -------------------------------------------
    def _infer_program(self, denoising_steps: int):
        """ONE jitted program for encode -> noise draw -> the whole DDIM
        loop (lax.fori_loop) -> decode.  The previous formulation dispatched
        each of the 12 UNet steps plus ~6 eager scheduler ops per step
        individually, so on a high-latency link the per-dispatch RTT
        multiplied (39-67 s/image separate-process vs 7.2 s same-process,
        PARITY round-4).  Per-step DDIM coefficients are precomputed exactly
        as the eager scheduler's float() scalars (f32 cast is what the
        weak-typed python-float multiply produced) and indexed by the loop
        counter; the UNet body is traced once."""
        key = int(denoising_steps)
        cache = getattr(self, "_infer_cache", None)
        if cache is None:
            cache = self._infer_cache = {}
        if key in cache:
            return cache[key]
        sched = self.scheduler
        timesteps = sched.set_timesteps(denoising_steps)
        step = sched.num_train_timesteps // denoising_steps
        coef_rows = []
        for t in timesteps:
            prev_t = int(t) - step
            a_t = sched.alphas_cumprod[int(t)]
            a_prev = sched.alphas_cumprod[prev_t] if prev_t >= 0 \
                else sched.final_alpha_cumprod
            coef_rows.append([float(np.sqrt(a_t)), float(np.sqrt(1 - a_t)),
                              float(np.sqrt(a_prev)),
                              float(np.sqrt(1 - a_prev))])
        coefs_host = np.asarray(coef_rows, np.float32)
        tsteps_host = np.asarray(timesteps, np.int32)
        cdt = self.compute_dtype
        v_pred = sched.prediction_type == "v_prediction"
        # the injectable seams (tests swap fakes in); jit-of-jit inlines
        enc_apply, dec_apply = self._enc, self._dec
        unet_apply = self._unet
        n_steps = int(denoising_steps)

        @jax.jit
        def run(variables, rgb01, rng, coefs, tsteps):
            rgb_norm = (rgb01 * 2.0 - 1.0).astype(cdt)
            mean, _ = enc_apply(variables["encoder"], rgb_norm)
            # latent state + scheduler arithmetic stay f32 even in mixed
            # precision; only the net calls see the reduced dtype
            rgb_latent = (mean * VAE_SCALE).astype(jnp.float32)
            n, lh, lw, _ = rgb_latent.shape
            if rng.ndim > 1:   # per-member keys, vmapped draw
                depth_latent = jax.vmap(
                    lambda k: jax.random.normal(k, (lh, lw, 4),
                                                dtype=jnp.float32))(rng)
            else:
                depth_latent = jax.random.normal(rng, (n, lh, lw, 4),
                                                 dtype=jnp.float32)
            ete = variables["empty_text_embed"]
            ctx = jnp.broadcast_to(
                ete, (n,) + tuple(ete.shape[-2:])).astype(cdt)

            def body(i, dl):
                unet_in = jnp.concatenate(
                    [rgb_latent, dl], axis=-1).astype(cdt)
                noise = unet_apply(
                    variables["unet"], unet_in,
                    jnp.full((n,), tsteps[i], jnp.int32),
                    ctx).astype(jnp.float32)
                c0, c1, c2, c3 = (coefs[i, 0], coefs[i, 1], coefs[i, 2],
                                  coefs[i, 3])
                if v_pred:
                    pred_x0 = c0 * dl - c1 * noise
                    eps = c0 * noise + c1 * dl
                else:
                    pred_x0 = (dl - c1 * noise) / c0
                    eps = noise
                return c2 * pred_x0 + c3 * eps

            depth_latent = jax.lax.fori_loop(0, n_steps, body, depth_latent)
            depth = dec_apply(variables["decoder"],
                              (depth_latent / VAE_SCALE).astype(cdt))
            depth = jnp.mean(depth.astype(jnp.float32), axis=-1)  # (:353)
            return jnp.clip(depth * 0.5 + 0.5, 0.0, 1.0)

        self._infer_cache[key] = (run, coefs_host, tsteps_host)
        return self._infer_cache[key]

    def single_infer(self, rgb01: np.ndarray, denoising_steps: int,
                     rng: jax.Array) -> np.ndarray:
        """rgb01: (N, H, W, 3) in [0,1], H/W multiples of 8 ->
        (N, H, W) depth in [0,1].

        ``rng`` is either one key (shared stream, independent noise per batch
        element) or a stack of N keys (one independent stream per ensemble
        member — the batched-ensemble path)."""
        run, coefs, tsteps = self._infer_program(denoising_steps)
        depth = run(self.vars, jnp.asarray(rgb01, jnp.float32), rng,
                    jnp.asarray(coefs), jnp.asarray(tsteps))
        return np.asarray(depth)

    def _shard_ensemble(self, batch, rngs):
        """Distribute ensemble members over the devices' data axis.  Members
        are independent; the mesh uses the largest device count that divides
        the member count (no padded compute — e.g. 5 members on a v5e-8 run
        on 5 chips, a ~5x wall-clock win for the heaviest model in the zoo)
        and jit partitions every net call by following the input sharding.
        The weights are explicitly replicated onto the same mesh (empty
        PartitionSpec): uncommitted arrays would auto-replicate anyway, but
        weights committed to one device by a loading path would otherwise
        copy per call or fail."""
        devs = jax.devices()
        real = batch.shape[0]
        if len(devs) <= 1 or real < 2:
            return batch, rngs, real
        # virtual CPU meshes only shard when asked (the multichip dryrun
        # sets DEPTHMAP_SHARD_ENSEMBLE=1): tiny CPU tests would otherwise
        # pay a second jit compile for the sharded layout
        import os
        if (devs[0].platform == "cpu"
                and os.environ.get("DEPTHMAP_SHARD_ENSEMBLE") != "1"):
            return batch, rngs, real
        d = max(k for k in range(1, min(real, len(devs)) + 1)
                if real % k == 0)
        if d <= 1:
            return batch, rngs, real
        from jax.sharding import Mesh, NamedSharding, PartitionSpec
        mesh = Mesh(np.asarray(devs[:d]), ("data",))
        sh = NamedSharding(mesh, PartitionSpec("data"))
        if getattr(self, "_vars_mesh", None) != mesh:
            rep = NamedSharding(mesh, PartitionSpec())
            self.vars = jax.device_put(self.vars, rep)
            self._vars_mesh = mesh
        return (jax.device_put(jnp.asarray(batch), sh),
                jax.device_put(rngs, sh), real)

    def __call__(self, rgb01: np.ndarray, processing_res: int = 768,
                 ensemble_size: int = 5, denoising_steps: int = 12,
                 seed: int = 0, match_input_res: bool = False) -> np.ndarray:
        """rgb01: (H, W, 3) float in [0,1] -> (h', w') depth in [0,1]."""
        import cv2
        h, w = rgb01.shape[:2]
        scale = processing_res / max(h, w)
        nh = max(int(round(h * scale / 8)) * 8, 8)
        nw = max(int(round(w * scale / 8)) * 8, 8)
        rgb = cv2.resize(rgb01.astype(np.float32), (nw, nh),
                         interpolation=cv2.INTER_CUBIC).clip(0, 1)

        batch = np.repeat(rgb[None], ensemble_size, axis=0)
        rngs = jax.random.split(jax.random.PRNGKey(seed), ensemble_size)
        # ensemble members ride the batch axis: ONE batched denoise with
        # per-member RNG streams (the UNet sees batch=ensemble_size; the
        # reference batches through the VRAM table, marigold_pipeline.py:166).
        # On a multi-chip mesh the members additionally shard over the data
        # axis (they are independent — free ~ensemble-size speedup on v5e-8)
        batch, rngs, real = self._shard_ensemble(batch, rngs)
        preds = self.single_infer(batch, denoising_steps, rngs)[:real]
        depth = ensemble_depths(preds) if ensemble_size > 1 else preds[0]
        if match_input_res:
            depth = cv2.resize(depth, (w, h), interpolation=cv2.INTER_CUBIC)
        return depth


def _lower_median(arr: np.ndarray, axis: int = 0) -> np.ndarray:
    """torch.median semantics: the LOWER of the two middle values for even
    counts (np.median averages them)."""
    n = arr.shape[axis]
    return np.take(np.sort(arr, axis=axis), (n - 1) // 2, axis=axis)


def ensemble_depths(preds: np.ndarray, regularizer_strength: float = 0.02,
                    max_iter: int = 2, tol: float = 1e-3,
                    reduction: str = "median",
                    max_res: Optional[int] = None) -> np.ndarray:
    """Align affine-invariant predictions by per-member scale/shift, then
    reduce.  Numerics-exact port of the reference ensemble
    (dmarigold/marigold/util/ensemble.py:24-119): ONE joint distance term
    sqrt(mean over all pairs), a near/far [0,1] anchoring regularizer, BFGS
    with max_iter=2, median reduction (torch lower-median), final [0,1]
    rescale.  Verified against the reference implementation in
    tests/test_marigold_oracle.py."""
    from scipy.optimize import minimize

    orig = np.asarray(preds, np.float32)
    n = orig.shape[0]
    imgs = orig
    if max_res is not None:
        scale = max_res / max(orig.shape[-2:])
        if scale < 1:       # nearest-neighbor downscale (torch Upsample)
            hh = int(orig.shape[-2] * scale)
            ww = int(orig.shape[-1] * scale)
            ys = (np.arange(hh) / scale).astype(np.int64)
            xs = (np.arange(ww) / scale).astype(np.int64)
            imgs = orig[:, ys][:, :, xs]

    mins = imgs.reshape(n, -1).min(1)
    maxs = imgs.reshape(n, -1).max(1)
    s_init = 1.0 / (maxs - mins)
    t_init = -s_init * mins
    x0 = np.concatenate([s_init, t_init]).astype(np.float64)

    reduce_fn = _lower_median if reduction == "median" else \
        functools.partial(np.mean, axis=0)

    def closure(x):
        x = x.astype(np.float32)
        s, t = x[:n], x[n:]
        arr = imgs * s[:, None, None] + t[:, None, None]
        dists = np.stack([arr[i] - arr[j]
                          for i in range(n) for j in range(i + 1, n)])
        sqrt_dist = np.sqrt(np.mean(dists ** 2))
        pred = reduce_fn(arr)
        near_err = np.sqrt((0.0 - pred.min()) ** 2)
        far_err = np.sqrt((1.0 - pred.max()) ** 2)
        return float(sqrt_dist + (near_err + far_err) * regularizer_strength)

    res = minimize(closure, x0, method="BFGS", tol=tol,
                   options={"maxiter": max_iter, "disp": False})
    x = res.x.astype(np.float32)
    s, t = x[:n], x[n:]
    aligned = reduce_fn(orig * s[:, None, None] + t[:, None, None])
    lo, hi = aligned.min(), aligned.max()
    return (aligned - lo) / (hi - lo) if hi > lo else aligned * 0


def build_marigold_pipeline(variables=None) -> MarigoldPipeline:
    return MarigoldPipeline(variables)


def build_marigold():
    """ModelBundle hook — the pipeline object itself (not a flax module)."""
    return MarigoldPipeline()
