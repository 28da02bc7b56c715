"""Pix2Pix merge network (BoostingMonocularDepth's 'unet_1024' generator).

Parity with reference pix2pix/models/networks.py:444-545: a 10-level U-Net
(2-channel input: low-res + high-res depth estimates, 1-channel output),
LeakyReLU(0.2) on the way down, ReLU + ConvTranspose on the way up, BatchNorm
everywhere except the outermost level, tanh output.  Inference wrapper parity
with pix2pix4depth_model.py:96-116 (min-max normalize both inputs to [-1,1]).
Implemented iteratively (the reference builds it recursively) and batched —
the Boost engine merges *all* patches in one forward.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from depthmap_tpu.models.layers import BatchNorm


class UnetGenerator(nn.Module):
    num_downs: int = 10
    ngf: int = 64
    input_nc: int = 2
    output_nc: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (N, S, S, input_nc) with S = 2**num_downs at full depth."""
        ngf = self.ngf
        # channel plan outer->inner
        downs = [ngf, ngf * 2, ngf * 4, ngf * 8] + \
            [ngf * 8] * (self.num_downs - 4)
        skips = []
        h = x
        for i, ch in enumerate(downs):
            if i > 0:
                h = nn.leaky_relu(h, 0.2)
            h = nn.Conv(ch, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                        use_bias=False, name=f"down{i}_conv")(h)
            innermost = i == len(downs) - 1
            if i > 0 and not innermost:
                h = BatchNorm(name=f"down{i}_bn")(h, train)
            skips.append(h)

        # up path inner->outer
        for i in range(len(downs) - 1, -1, -1):
            outermost = i == 0
            out_ch = self.output_nc if outermost else downs[i - 1]
            h = nn.relu(h)
            # flax padding (2,2) == torch ConvTranspose2d(k=4, s=2, p=1)
            # (verified numerically in tests/test_convert.py)
            h = nn.ConvTranspose(
                out_ch, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)),
                use_bias=outermost, name=f"up{i}_conv")(h)
            if not outermost:
                h = BatchNorm(name=f"up{i}_bn")(h, train)
                h = jnp.concatenate([skips[i - 1], h], axis=-1)
        return jnp.tanh(h)


class Pix2Pix4Depth(nn.Module):
    """Inference wrapper: normalize two depth maps, merge, map to [0,1]."""
    num_downs: int = 10
    ngf: int = 64

    def setup(self):
        self.netG = UnetGenerator(num_downs=self.num_downs, ngf=self.ngf)

    def __call__(self, outer, inner, train: bool = False):
        """outer/inner: (N, 1024, 1024) raw depth estimates -> (N, 1024, 1024)
        merged, in [0, 1] (caller renormalizes when needed)."""
        def mm(d):
            lo = jnp.min(d, axis=(1, 2), keepdims=True)
            hi = jnp.max(d, axis=(1, 2), keepdims=True)
            return (d - lo) / jnp.where(hi > lo, hi - lo, 1.0) * 2.0 - 1.0
        x = jnp.stack([mm(outer), mm(inner)], axis=-1)
        out = self.netG(x, train=train)
        return (out[..., 0] + 1.0) / 2.0


def build_pix2pix() -> Pix2Pix4Depth:
    return Pix2Pix4Depth()
