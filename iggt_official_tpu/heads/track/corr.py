"""Correlation pyramid lookup for the tracker.

Behavioural parity: `iggt/heads/track_modules/blocks.py:148-246`
(`CorrBlock`): an ``avg_pool2d`` feature pyramid; at each level the track
features correlate against the whole map (one matmul, MXU-friendly) and the
(2r+1)^2 neighbourhood around each track's (downscaled) coordinate is
bilinearly sampled from the correlation volume with zero padding.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from iggt_official_tpu.heads.track.sampling import bilinear_sample_nhwc


def build_pyramid(fmaps: jax.Array, num_levels: int):
    """(B, S, H, W, C) -> (levels, scales): each level 2x avg-pooled.

    ``scales[l]`` is the actual cumulative downsample factor of level l —
    it stops growing once the map is exhausted (a dim drops below 2) and
    the coarsest level is repeated to keep the concatenated correlation
    width static.  ``corr_sample`` must divide coords by these, not by
    2**l, or the repeated levels sample around the wrong centroid."""
    B, S, H, W, C = fmaps.shape
    levels = [fmaps]
    scales = [1.0]
    cur = fmaps.reshape(B * S, H, W, C)
    scale = 1.0
    for _ in range(num_levels - 1):
        if cur.shape[1] >= 2 and cur.shape[2] >= 2:
            cur = jax.lax.reduce_window(
                cur, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
            scale *= 2.0
        # else: feature map exhausted — repeat the coarsest level so the
        # concatenated correlation width stays num_levels * (2r+1)^2
        h, w = cur.shape[1], cur.shape[2]
        levels.append(cur.reshape(B, S, h, w, C))
        scales.append(scale)
    return levels, scales


def corr_sample(
    pyramid: List[jax.Array],
    scales: List[float],
    targets: jax.Array,
    coords: jax.Array,
    radius: int,
) -> jax.Array:
    """Sample the correlation pyramid around each track.

    pyramid/scales: from :func:`build_pyramid`; targets (B, S, N, C);
    coords (B, S, N, 2) full-resolution pixel coords.
    Returns (B, S, N, L*(2r+1)^2).
    """
    B, S, N, C = targets.shape
    r = radius
    d = jnp.arange(-r, r + 1, dtype=jnp.float32)
    # NB: the reference stacks meshgrid(dy, dx, 'ij') and adds it to (x, y)
    # coords (`blocks.py:178-183,225-229`), so in the flattened (2r+1)^2
    # window the X offset varies along the OUTER axis — match that order.
    dgrid = jnp.stack(
        [jnp.tile(d[:, None], (1, 2 * r + 1)),      # x offset, outer axis
         jnp.tile(d[None, :], (2 * r + 1, 1))],     # y offset, inner axis
        axis=-1,
    ).reshape(1, (2 * r + 1) ** 2, 2)               # (1, K, 2) [x, y]

    out = []
    for fm, scale in zip(pyramid, scales):
        h, w = fm.shape[2], fm.shape[3]
        flat = fm.reshape(B, S, h * w, C)
        corr = jnp.einsum("bsnc,bskc->bsnk", targets, flat) / jnp.sqrt(
            jnp.asarray(C, jnp.float32)
        )
        corr = corr.reshape(B * S * N, h, w, 1)

        centroid = coords.reshape(B * S * N, 1, 2) / scale
        pts = centroid + dgrid
        sampled = bilinear_sample_nhwc(corr, pts, padding_mode="zeros")
        out.append(sampled.reshape(B, S, N, (2 * r + 1) ** 2))
    return jnp.concatenate(out, axis=-1)
