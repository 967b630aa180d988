"""Shared SAM2 primitives.

Behavioural parity:
- `PositionEmbeddingSine` (`sam2/modeling/position_encoding.py:10-140`):
  normalized sine grid embeddings + point/box encodings.
- `MLP` (`sam2/modeling/sam2_utils.py:105-129`).
- `LayerNorm2d` (`sam2_utils.py:134-146`) — channels-last here, a plain
  LayerNorm over the channel axis (affine, eps 1e-6).
- window partition/unpartition with padding
  (`sam2/modeling/backbones/utils.py:10-54`).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def window_partition(x: jax.Array, ws: int) -> Tuple[jax.Array, Tuple[int, int]]:
    """(B, H, W, C) -> (B*nw, ws, ws, C), zero-padding to multiples."""
    B, H, W, C = x.shape
    pad_h = (ws - H % ws) % ws
    pad_w = (ws - W % ws) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)
    return x, (Hp, Wp)


def window_unpartition(
    windows: jax.Array, ws: int, pad_hw: Tuple[int, int], hw: Tuple[int, int]
) -> jax.Array:
    Hp, Wp = pad_hw
    H, W = hw
    C = windows.shape[-1]
    B = windows.shape[0] // ((Hp // ws) * (Wp // ws))
    x = windows.reshape(B, Hp // ws, Wp // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    return x[:, :H, :W]


class MLP(nn.Module):
    """num_layers-deep MLP (`sam2_utils.py:105-129`); param names layers_i."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    activation: Callable = nn.relu
    sigmoid_output: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = self.activation(x)
        if self.sigmoid_output:
            x = jax.nn.sigmoid(x)
        return x


class LayerNorm2d(nn.Module):
    """Channel LayerNorm on NHWC maps (`sam2_utils.py:134-146`)."""

    features: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("scale", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        xf = x.astype(jnp.float32)
        u = xf.mean(-1, keepdims=True)
        s = ((xf - u) ** 2).mean(-1, keepdims=True)
        out = (xf - u) * jax.lax.rsqrt(s + self.eps)
        return (out * w + b).astype(x.dtype)


class PositionEmbeddingSine:
    """Functional sine position embedding (no params).

    `pe(h, w)` returns the (h, w, 2*num_pos_feats) grid embedding matching
    `position_encoding.py:85-123`; `encode_points`/`encode_boxes` match
    `:47-82`."""

    def __init__(
        self,
        num_pos_feats: int,
        temperature: int = 10000,
        normalize: bool = True,
        scale: Optional[float] = None,
    ):
        assert num_pos_feats % 2 == 0
        self.num_pos_feats = num_pos_feats // 2
        self.temperature = temperature
        self.normalize = normalize
        self.scale = 2 * math.pi if scale is None else scale

    def _dim_t(self) -> jax.Array:
        dim_t = jnp.arange(self.num_pos_feats, dtype=jnp.float32)
        return self.temperature ** (2 * (dim_t // 2) / self.num_pos_feats)

    def __call__(self, h: int, w: int) -> jax.Array:
        """(h, w, C) grid embedding (y-features then x-features)."""
        y = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None]
        x = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]
        y_embed = jnp.broadcast_to(y, (h, w))
        x_embed = jnp.broadcast_to(x, (h, w))
        if self.normalize:
            eps = 1e-6
            y_embed = y_embed / (y_embed[-1:, :] + eps) * self.scale
            x_embed = x_embed / (x_embed[:, -1:] + eps) * self.scale

        dim_t = self._dim_t()
        pos_x = x_embed[..., None] / dim_t
        pos_y = y_embed[..., None] / dim_t

        def interleave(p):
            return jnp.stack(
                [jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], axis=-1
            ).reshape(p.shape[:-1] + (-1,))

        return jnp.concatenate([interleave(pos_y), interleave(pos_x)], axis=-1)

    def _encode_xy(self, x: jax.Array, y: jax.Array):
        x_embed = x * self.scale
        y_embed = y * self.scale
        dim_t = self._dim_t()
        pos_x = x_embed[..., None] / dim_t
        pos_y = y_embed[..., None] / dim_t

        def interleave(p):
            return jnp.stack(
                [jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], axis=-1
            ).reshape(p.shape[:-1] + (-1,))

        return interleave(pos_x), interleave(pos_y)

    def encode_boxes(self, x, y, w, h) -> jax.Array:
        pos_x, pos_y = self._encode_xy(x, y)
        return jnp.concatenate([pos_y, pos_x, h[..., None], w[..., None]], -1)

    def encode_points(self, x, y, labels) -> jax.Array:
        pos_x, pos_y = self._encode_xy(x, y)
        return jnp.concatenate([pos_y, pos_x, labels[..., None]], -1)
