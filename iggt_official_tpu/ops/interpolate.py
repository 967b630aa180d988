"""Image resizing ops.

The DPT fusion pyramid uses bilinear interpolation with align_corners=True
throughout (`iggt/heads/dpt_head.py:249-254,484-509`), which
jax.image.resize does not implement — so we build it from two 1-D gathers
(separable, XLA-fusable, static shapes).  The reference's INT_MAX chunking
(`custom_interpolate`) is unnecessary here: XLA tiles the gather itself.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _axis_weights(in_size: int, out_size: int, dtype) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """align_corners=True sample positions along one axis.

    Returns (idx0, idx1, frac) each of shape (out_size,).
    """
    if out_size == 1:
        scale = 0.0
    else:
        scale = (in_size - 1) / (out_size - 1)
    coords = jnp.arange(out_size, dtype=dtype) * scale
    idx0 = jnp.clip(jnp.floor(coords), 0, in_size - 1).astype(jnp.int32)
    idx1 = jnp.clip(idx0 + 1, 0, in_size - 1)
    frac = coords - idx0.astype(dtype)
    return idx0, idx1, frac


def bilinear_resize_align_corners(
    x: jax.Array, out_hw: Tuple[int, int]
) -> jax.Array:
    """Bilinear resize with align_corners=True on NHWC (or HWC) arrays.

    Matches torch F.interpolate(mode="bilinear", align_corners=True).
    """
    H_out, W_out = out_hw
    *lead, H, W, C = x.shape
    if (H, W) == (H_out, W_out):
        return x
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    xf = x.astype(dtype)

    i0, i1, fy = _axis_weights(H, H_out, dtype)
    rows = (
        xf[..., i0, :, :] * (1 - fy)[:, None, None]
        + xf[..., i1, :, :] * fy[:, None, None]
    )
    j0, j1, fx = _axis_weights(W, W_out, dtype)
    out = (
        rows[..., :, j0, :] * (1 - fx)[:, None]
        + rows[..., :, j1, :] * fx[:, None]
    )
    return out.astype(x.dtype)


def upsample2x_align_corners(x: jax.Array) -> jax.Array:
    """scale_factor=2 bilinear upsample, align_corners=True (NHWC)."""
    H, W = x.shape[-3], x.shape[-2]
    return bilinear_resize_align_corners(x, (2 * H, 2 * W))


def resize_antialias_bicubic(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Antialiased bicubic resize (NHWC / HWC), for pos-embed interpolation.

    Approximates torch F.interpolate(mode="bicubic", antialias=True) used at
    `iggt/layers/vision_transformer.py:205-211` (both are Keys a=-0.5 with
    antialiasing on downscale; parity verified in tests to ~1e-3).
    """
    out_shape = x.shape[:-3] + (out_hw[0], out_hw[1], x.shape[-1])
    return jax.image.resize(x.astype(jnp.float32), out_shape, method="cubic").astype(
        x.dtype
    )
