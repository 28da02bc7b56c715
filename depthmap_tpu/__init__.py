"""depthmap_tpu — a TPU-native (JAX/XLA/Pallas/pjit) monocular-depth & 3D pipeline.

A ground-up rebuild of the capabilities of
thygate/stable-diffusion-webui-depthmap-script (reference mounted at
/root/reference): single-image / batch / video monocular depth across the full
model zoo (MiDaS v2.1 / DPT / BEiT, ZoeDepth n/k/nk, LeReS, Marigold, Depth
Anything v1/v2), BoostingMonocularDepth multi-resolution merging, and the
derived outputs (16-bit depth PNGs, stereo SBS/anaglyph pairs, normal maps,
heatmaps, meshes, trajectory videos).

Unlike the reference (a CUDA/torch Gradio extension), the compute path here is
pure JAX: models are functional modules compiled with jit/pjit, hot pixel ops
are Pallas TPU kernels, and batch/video parallelism rides a
`jax.sharding.Mesh`.
"""

__version__ = "0.1.0"


def _enable_persistent_compile_cache():
    """XLA compiles cost tens of seconds on TPU; the persistent cache makes
    every process after the first start in ~1 s per program (verified
    through the remote-compile tunnel: 11.7 s -> 0.9 s).  Opt out with
    DEPTHMAP_NO_XLA_CACHE=1 or override via JAX_COMPILATION_CACHE_DIR."""
    import os
    if os.environ.get("DEPTHMAP_NO_XLA_CACHE") == "1":
        return
    try:
        import jax
        if jax.config.jax_compilation_cache_dir is None:
            cache = os.path.join(
                os.path.expanduser("~"), ".cache", "depthmap_tpu", "xla")
            os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            # persist even sub-second programs: through the remote-compile
            # tunnel every compile costs a >=0.3 s roundtrip, so a disk hit
            # always wins
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              0.0)
    except Exception:
        pass


def _apply_platform_override():
    """DEPTHMAP_PLATFORM=cpu|tpu pins the JAX backend before first init.

    Some accelerator plugins (e.g. remote-tunnel TPUs) prepend themselves to
    the platform list and ignore the JAX_PLATFORMS environment variable, so
    the only reliable off-accelerator switch is `jax.config.update` before
    any backend initialization.  This keeps the CLI/API/UI usable on the
    host when the accelerator is absent or unreachable."""
    import os
    platform = os.environ.get("DEPTHMAP_PLATFORM")
    if not platform:
        return
    try:
        import jax
        jax.config.update("jax_platforms", platform.lower())
    except Exception:
        pass


_apply_platform_override()
_enable_persistent_compile_cache()

from depthmap_tpu.options import GenerationOptions  # noqa: F401,E402
from depthmap_tpu.registry import MODELS, ModelSpec, resolve_model_type  # noqa: F401,E402
