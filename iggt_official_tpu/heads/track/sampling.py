"""Bilinear point sampling + tracker positional embeddings.

Behavioural parity: `iggt/heads/track_modules/utils.py`:
- `bilinear_sampler` (`utils.py:127-196`): grid_sample with align_corners
  and "border" or "zeros" padding, pixel coordinates in [0, size-1].
- `sample_features4d` (`utils.py:199-226`): per-point feature lookup.
- `get_2d_embedding` (`utils.py:95-125`): interleaved sin/cos embedding of
  xy coordinates (channel layout sin,cos,sin,cos..., x then y).
- `get_2d_sincos_pos_embed` (`utils.py:19-92`): concatenated sincos grid
  embedding (first half encodes x, second half y, matching the reference's
  use of grid[0]=x-coords for "emb_h").

All NHWC / channels-last.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def bilinear_sample_nhwc(
    fmap: jax.Array, coords: jax.Array, padding_mode: str = "border"
) -> jax.Array:
    """Sample (B, H, W, C) at pixel coords (B, ..., 2) [x, y] ->
    (B, ..., C), align_corners=True convention."""
    B, H, W, C = fmap.shape
    lead = coords.shape[1:-1]
    xy = coords.reshape(B, -1, 2).astype(jnp.float32)
    x, y = xy[..., 0], xy[..., 1]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def gather(yi, xi):
        yc = jnp.clip(yi.astype(jnp.int32), 0, H - 1)
        xc = jnp.clip(xi.astype(jnp.int32), 0, W - 1)
        vals = jax.vmap(lambda fm, yy, xx: fm[yy, xx])(fmap, yc, xc)
        if padding_mode == "zeros":
            inside = (
                (yi >= 0) & (yi <= H - 1) & (xi >= 0) & (xi <= W - 1)
            ).astype(vals.dtype)
            vals = vals * inside[..., None]
        return vals

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)

    wx = fx[..., None]
    wy = fy[..., None]
    out = (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )
    return out.reshape((B,) + lead + (C,))


def get_2d_embedding(xy: jax.Array, C: int) -> jax.Array:
    """(B, N, 2) -> (B, N, 2C) interleaved sin/cos (`utils.py:95-125`,
    cat_coords=False path)."""
    x = xy[..., 0:1].astype(jnp.float32)
    y = xy[..., 1:2].astype(jnp.float32)
    div = (jnp.arange(0, C, 2, dtype=jnp.float32) * (1000.0 / C))[None, None]

    def interleave(sin, cos):
        out = jnp.stack([sin, cos], axis=-1)  # (..., C/2, 2)
        return out.reshape(out.shape[:-2] + (C,))

    pe_x = interleave(jnp.sin(x * div), jnp.cos(x * div))
    pe_y = interleave(jnp.sin(y * div), jnp.cos(y * div))
    return jnp.concatenate([pe_x, pe_y], axis=-1)


def get_2d_sincos_pos_embed(embed_dim: int, grid_hw: Tuple[int, int]) -> jax.Array:
    """(1, H, W, D) grid embedding (`utils.py:19-92`): first D/2 channels
    encode the x coordinate, second D/2 the y coordinate, each as
    [sin(D/4) ++ cos(D/4)]."""
    H, W = grid_hw
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    gx = jnp.broadcast_to(xs[None, :], (H, W))
    gy = jnp.broadcast_to(ys[:, None], (H, W))

    def embed_1d(pos, dim):
        omega = jnp.arange(dim // 2, dtype=jnp.float32) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = pos.reshape(-1)[:, None] * omega[None]
        return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=1)

    emb_x = embed_1d(gx, embed_dim // 2)
    emb_y = embed_1d(gy, embed_dim // 2)
    emb = jnp.concatenate([emb_x, emb_y], axis=1)
    return emb.reshape(1, H, W, embed_dim)
