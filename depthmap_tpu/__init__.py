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

from depthmap_tpu.options import GenerationOptions  # noqa: F401
from depthmap_tpu.registry import MODELS, ModelSpec, resolve_model_type  # noqa: F401
