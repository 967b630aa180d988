"""Convolution wrappers with torch-compatible semantics, NHWC layout.

The DPT/adaptor heads use torch Conv2d / ConvTranspose2d / BatchNorm2d
(`iggt/heads/dpt_head.py:76-128`, `iggt/heads/adaptor.py:9-35`).  These
wrappers fix layouts and padding conventions once so the heads read cleanly
and the weight converter has a single target:

- ``Conv2d``: flax nn.Conv with explicit symmetric padding (torch default).
- ``ConvTranspose2d``: implemented as an input-dilated convolution
  (lhs_dilation = stride, padding = kernel-1-padding) whose kernel is the
  *spatially flipped* torch kernel — exactly torch's gradient-of-conv
  semantics for every (k, s, p) combination used by the heads
  (k4s4p0, k2s2p0, k4s2p1, verified in tests).
- ``FrozenBatchNorm``: inference-form BatchNorm2d with running statistics
  held as parameters (the reference only ships inference).
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn


def _pair(x: Union[int, Tuple[int, int]]) -> Tuple[int, int]:
    return tuple(x) if isinstance(x, (tuple, list)) else (x, x)


class Conv2d(nn.Module):
    """torch-style Conv2d on NHWC: weight (kh, kw, in, out)."""

    features: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = _pair(self.kernel_size)
        s = _pair(self.stride)
        p = _pair(self.padding)
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k[0], k[1], in_ch, self.features),
        )
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
        )
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=s,
            padding=((p[0], p[0]), (p[1], p[1])),
            dimension_numbers=dn,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias.astype(out.dtype)
        return out


class ConvTranspose2d(nn.Module):
    """torch-style ConvTranspose2d on NHWC.

    Kernel param layout: (kh, kw, in, out), stored as the flipped torch
    kernel (the converter does ``w.flip(2,3).transpose(2,3,0,1)``), so the
    forward is a plain dilated conv:
      out = conv(dilate(x, s), kernel, pad = k - 1 - p)
    giving torch's output size (i-1)*s + k - 2p.
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = _pair(self.kernel_size)
        s = _pair(self.stride)
        p = _pair(self.padding)
        pad = (k[0] - 1 - p[0], k[1] - 1 - p[1])
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k[0], k[1], in_ch, self.features),
        )
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
        )
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1, 1),
            padding=((pad[0], pad[0]), (pad[1], pad[1])),
            lhs_dilation=s,
            rhs_dilation=(1, 1),
            dimension_numbers=dn,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias.astype(out.dtype)
        return out


class FrozenBatchNorm(nn.Module):
    """Inference-form BatchNorm2d over the channel (last) axis.

    y = (x - running_mean) / sqrt(running_var + eps) * weight + bias.
    Running stats live as parameters (`mean`, `var`) because the reference
    ships inference-only BN (`iggt/heads/adaptor.py:13-25`).
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = jax.lax.rsqrt(var.astype(jnp.float32) + self.eps) * scale
        out = (x.astype(jnp.float32) - mean) * inv + bias
        return out.astype(x.dtype)
