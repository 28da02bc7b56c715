"""Marigold: diffusion-based affine-invariant depth (reference dmarigold/).

Re-implemented from scratch in flax (diffusers is not a dependency): SD2
VAE + 8-channel-input UNet + DDIM scheduler + test-time ensembling.
"""
from depthmap_tpu.models.marigold.pipeline import (MarigoldPipeline,  # noqa
                                                   build_marigold_pipeline)
