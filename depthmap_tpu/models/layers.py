"""Shared NHWC building blocks for the model zoo.

Conventions:
 * layout NHWC (TPU-native); torch checkpoints are transposed at conversion.
 * BatchNorm runs in inference mode by default (running stats folded at
   conversion is optional; we keep stats for fine-tuning support).
 * ``ConvSame`` reproduces TensorFlow 'SAME' asymmetric padding, needed for
   tf_* EfficientNet ports (reference encoder: dmidas/blocks.py:168-190).
"""
from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp


def relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


# Tiling mode: the reference monkey-patches every Conv2d to circular padding
# (src/depthmap_generation.py:251-260).  Here a trace-time flag switches the
# padding mode of all Conv/ConvSame layers (set before building/jitting).
_TILING_MODE = False


def set_tiling_mode(enabled: bool) -> None:
    global _TILING_MODE
    _TILING_MODE = bool(enabled)


def tiling_mode_enabled() -> bool:
    return _TILING_MODE


def tf_same_pads(in_size: int, k: int, s: int) -> tuple:
    """TF SAME padding (lo, hi) for one spatial dim (static shapes)."""
    if in_size % s == 0:
        total = max(k - s, 0)
    else:
        total = max(k - in_size % s, 0)
    return (total // 2, total - total // 2)


class ConvSame(nn.Module):
    """Conv2D with TF 'SAME' asymmetric padding (Conv2dSameExport parity)."""
    features: int
    kernel: int
    stride: int = 1
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        ph = tf_same_pads(x.shape[1], self.kernel, self.stride)
        pw = tf_same_pads(x.shape[2], self.kernel, self.stride)
        if _TILING_MODE and (max(ph) > 0 or max(pw) > 0):
            x = jnp.pad(x, ((0, 0), ph, pw, (0, 0)), mode="wrap")
            ph = pw = (0, 0)
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       strides=(self.stride, self.stride),
                       padding=(ph, pw), feature_group_count=self.groups,
                       use_bias=self.use_bias, name="conv")(x)


class Conv(nn.Module):
    """Conv2D with torch-style symmetric zero padding."""
    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    groups: int = 1
    use_bias: bool = True
    circular: bool = False   # tiling mode: padding_mode='circular'

    @nn.compact
    def __call__(self, x):
        pad = ((self.padding, self.padding), (self.padding, self.padding))
        if (self.circular or _TILING_MODE) and self.padding > 0:
            x = jnp.pad(x, ((0, 0), pad[0], pad[1], (0, 0)), mode="wrap")
            pad = "VALID"
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       strides=(self.stride, self.stride), padding=pad,
                       feature_group_count=self.groups,
                       use_bias=self.use_bias, name="conv")(x)


class BatchNorm(nn.Module):
    """Inference-style BatchNorm with running stats as variables."""
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, epsilon=self.eps,
                            momentum=0.9, name="bn")(x)


class ConvBnAct(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    groups: int = 1
    act: Callable | None = relu6
    eps: float = 1e-3
    same_pad: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.same_pad:
            x = ConvSame(self.features, self.kernel, self.stride,
                         groups=self.groups, use_bias=False)(x)
        else:
            x = Conv(self.features, self.kernel, self.stride,
                     padding=(self.kernel - 1) // 2, groups=self.groups,
                     use_bias=False)(x)
        x = BatchNorm(eps=self.eps)(x, train)
        if self.act is not None:
            x = self.act(x)
        return x
