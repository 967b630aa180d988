"""Image resizing ops.

The DPT fusion pyramid uses bilinear interpolation with align_corners=True
throughout (`iggt/heads/dpt_head.py:249-254,484-509`), which
jax.image.resize does not implement — so we express it as two dense 1-D
interpolation-matrix contractions (separable, rides the MXU; measured ~2x
the gather formulation at the DPT pyramid shapes on v5e, and exact to
float rounding at precision=HIGHEST since each matrix row holds the same
two weights the gather path would apply).  The reference's INT_MAX
chunking (`custom_interpolate`) is unnecessary here: XLA tiles the
contraction itself.
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


def _interp_matrix(in_size: int, out_size: int, dtype) -> jax.Array:
    """(out_size, in_size) align_corners bilinear weights: each row carries
    (1-frac, frac) at (idx0, idx1) — the exact weights of the gather form."""
    i0, i1, frac = _axis_weights(in_size, out_size, dtype)
    rows = jnp.arange(out_size)
    m = jnp.zeros((out_size, in_size), dtype)
    m = m.at[rows, i0].add(1 - frac)
    m = m.at[rows, i1].add(frac)
    return m


def bilinear_resize_align_corners(
    x: jax.Array, out_hw: Tuple[int, int]
) -> jax.Array:
    """Bilinear resize with align_corners=True on NHWC (or HWC) arrays.

    Matches torch F.interpolate(mode="bilinear", align_corners=True).
    precision=HIGHEST keeps the fp32 contraction exact on TPU (each row has
    only the two bilinear weights, so the matmul reproduces the gather
    result to float rounding).
    """
    H_out, W_out = out_hw
    *lead, H, W, C = x.shape
    if (H, W) == (H_out, W_out):
        return x
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    xf = x.astype(dtype)

    A = _interp_matrix(H, H_out, dtype)
    B = _interp_matrix(W, W_out, dtype)
    xf = jnp.einsum("hH,...Hwc->...hwc", A, xf, precision="highest")
    out = jnp.einsum("wW,...hWc->...hwc", B, xf, precision="highest")
    return out.astype(x.dtype)


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
