"""3D-photo inpainting networks: edge, depth, and color inpainters.

Parity with reference inpaint/networks.py:
 * PartialConv (:62-104): masked conv renormalized by the valid-mask count;
 * PCBActiv (:106-132) down-7/5/3 encoder + leaky decoder stages;
 * Inpaint_Depth_Net (:134-236): 7-level partial-conv U-Net, 4ch input
   (depth, edge, context, mask), nearest upsampling;
 * Inpaint_Color_Net (:332-430): same shape, 6ch input (rgb, edge, context,
   mask) -> 3ch;
 * Inpaint_Edge_Net (:237-330): spectral-norm conv encoder (7x7 reflect, two
   stride-2), 8 dilated resnet blocks, transposed-conv decoder with skips,
   sigmoid output.  (Spectral norm is baked into converted weights.)
Each has the forward_3P convention: pad input to a multiple of
unit_length=128, run, crop back.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class PartialConv(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, mask):
        k, s = self.kernel, self.stride
        pad = {7: 3, 5: 2, 3: 1}[k]
        out = nn.Conv(self.features, (k, k), strides=(s, s),
                      padding=((pad, pad), (pad, pad)), use_bias=False,
                      name="input_conv")(x * mask)
        # mask "conv": sum of mask over the window across all input channels
        in_ch = x.shape[-1]
        ones = jnp.ones((k, k, in_ch, 1), x.dtype)
        mask_sum = jax.lax.conv_general_dilated(
            mask, ones, (s, s), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        holes = mask_sum == 0
        mask_sum = jnp.where(holes, 1.0, mask_sum)
        slide_winsize = in_ch * k * k

        out = out * slide_winsize / mask_sum
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + b
        out = jnp.where(holes, 0.0, out)
        new_mask = jnp.broadcast_to(jnp.where(holes, 0.0, 1.0), out.shape)
        return out, new_mask


class PCBActiv(nn.Module):
    features: int
    sample: str = "none-3"
    bn: bool = True
    activ: Optional[str] = "relu"
    conv_bias: bool = False

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        k, s = {"down-7": (7, 2), "down-5": (5, 2), "down-3": (3, 2),
                "none-3": (3, 1)}[self.sample]
        h, m = PartialConv(self.features, k, s, use_bias=self.conv_bias,
                           name="conv")(x, mask)
        if self.bn:
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name="bn")(h)
        if self.activ == "relu":
            h = nn.relu(h)
        elif self.activ == "leaky":
            h = nn.leaky_relu(h, 0.2)
        return h, m


def _nearest_up2(x):
    n, h, w, c = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class PartialConvUNet(nn.Module):
    """Shared 7-level partial-conv U-Net (depth and color inpainters)."""
    in_channels: int
    out_channels: int
    layer_size: int = 7
    first_bias: bool = True
    dec_names: Tuple[str, ...] = ()   # custom decoder naming (color net A's)

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        feats = {0: (x, mask)}
        specs = [("enc_1", 64, "down-7", False, self.first_bias),
                 ("enc_2", 128, "down-5", True, self.first_bias and
                  self.in_channels == 4),
                 ("enc_3", 256, "down-5", True, False),
                 ("enc_4", 512, "down-3", True, False)] + \
                [(f"enc_{i + 1}", 512, "down-3", True, False)
                 for i in range(4, self.layer_size)]
        h, m = x, mask
        for i, (name, ch, sample, bn, bias) in enumerate(specs):
            h, m = PCBActiv(ch, sample, bn=bn, conv_bias=bias,
                            name=name)(h, m, train)
            feats[i + 1] = (h, m)

        dec_ch = {7: 512, 6: 512, 5: 512, 4: 256, 3: 128, 2: 64,
                  1: self.out_channels}
        for i in range(self.layer_size, 0, -1):
            h = _nearest_up2(h)
            m = _nearest_up2(m)
            eh, em = feats[i - 1]
            h = jnp.concatenate([h, eh], axis=-1)
            m = jnp.concatenate([m, em], axis=-1)
            name = self.dec_names[i - 1] if self.dec_names else f"dec_{i}"
            last = i == 1
            h, m = PCBActiv(dec_ch[i], "none-3", bn=not last,
                            activ=None if last else "leaky",
                            conv_bias=last, name=name)(h, m, train)
        return h


class InpaintDepthNet(nn.Module):
    """4ch (depth, edge, context, mask) -> 1ch depth."""

    @nn.compact
    def __call__(self, depth, edge, context, mask, train: bool = False):
        x = jnp.concatenate([depth, edge, context, mask], axis=-1)
        input_mask = jnp.concatenate(
            [context + mask] * 4, axis=-1).clip(0, 1)
        out = PartialConvUNet(4, 1, first_bias=True, name="unet")(
            x, input_mask, train)
        return out


class InpaintColorNet(nn.Module):
    """6ch (rgb, edge, context, mask) -> 3ch color."""

    @nn.compact
    def __call__(self, rgb, edge, context, mask, train: bool = False):
        x = jnp.concatenate([rgb, edge, context, mask], axis=-1)
        input_mask = jnp.concatenate([context + mask] * 6, axis=-1).clip(0, 1)
        dec_names = ("dec_1A", "dec_2A", "dec_3A", "dec_4A", "dec_5A",
                     "dec_6", "dec_7")
        out = PartialConvUNet(6, 3, first_bias=False, dec_names=dec_names,
                              name="unet")(x, input_mask, train)
        return jax.nn.sigmoid(out)   # reference networks.py:419


class InstanceNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mean) / jnp.sqrt(var + self.eps)


def _reflect_pad(x, p):
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class EdgeResnetBlock(nn.Module):
    dim: int = 256
    dilation: int = 2

    @nn.compact
    def __call__(self, x):
        # reference ResnetBlock convs: bias=not use_spectral_norm -> False
        # (inpaint/networks.py:475-487)
        h = _reflect_pad(x, self.dilation)
        h = nn.Conv(self.dim, (3, 3), kernel_dilation=(self.dilation,) * 2,
                    padding="VALID", use_bias=False, name="conv1")(h)
        h = InstanceNorm(name="in1")(h)
        h = nn.leaky_relu(h, 0.2)   # reference networks.py:481 LeakyReLU(0.2)
        h = _reflect_pad(h, 1)
        h = nn.Conv(self.dim, (3, 3), padding="VALID", use_bias=False,
                    name="conv2")(h)
        h = InstanceNorm(name="in2")(h)
        return x + h


class InpaintEdgeNet(nn.Module):
    """7ch (rgb, disp, edge, context, mask) -> 1ch edge probability."""
    residual_blocks: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _reflect_pad(x, 3)
        x1 = nn.relu(InstanceNorm(name="in0")(
            nn.Conv(64, (7, 7), padding="VALID", name="enc0")(h)))
        x2 = nn.relu(InstanceNorm(name="in1")(
            nn.Conv(128, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    name="enc1")(x1)))
        x3 = nn.relu(InstanceNorm(name="in2")(
            nn.Conv(256, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    name="enc2")(x2)))
        h = x3
        for i in range(self.residual_blocks):
            h = EdgeResnetBlock(name=f"res{i}")(h)
        x4 = h
        x5 = nn.relu(InstanceNorm(name="in3")(nn.ConvTranspose(
            128, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)),
            name="dec0")(jnp.concatenate([x4, x3], axis=-1))))
        x6 = nn.relu(InstanceNorm(name="in4")(nn.ConvTranspose(
            64, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)),
            name="dec1")(jnp.concatenate([x5, x2], axis=-1))))
        h = _reflect_pad(jnp.concatenate([x6, x1], axis=-1), 3)
        out = nn.Conv(1, (7, 7), padding="VALID", name="dec2")(h)
        return jax.nn.sigmoid(out)

# NOTE: the reference's forward_3P centers crops in a zero canvas padded to
# 128-multiples (inpaint/networks.py:178).  The TPU glue pads to power-of-two
# buckets of 128 instead (pipeline/inpaint_mesh.py `_pad_bucket`) so the
# jitted nets compile O(log) shapes per stream rather than one per crop size.
