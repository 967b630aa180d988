"""UV grids and sincos positional embeddings for the dense heads.

Behavioural parity: `iggt/heads/utils.py:11-108`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_sincos_pos_embed(
    embed_dim: int, pos: jax.Array, omega_0: float = 100.0
) -> jax.Array:
    """1-D sincos embedding: (M,) positions -> (M, embed_dim).

    `heads/utils.py:44-67`.  The reference computes omega in float64 then
    casts; we stay in float32 (TPU-native) — the difference is < 1e-5 and
    covered by test tolerances.
    """
    assert embed_dim % 2 == 0
    omega = jnp.arange(embed_dim // 2, dtype=jnp.float32) / (embed_dim / 2.0)
    omega = 1.0 / omega_0**omega

    pos = pos.reshape(-1).astype(jnp.float32)
    out = jnp.einsum("m,d->md", pos, omega)
    return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=1)


def position_grid_to_embed(
    pos_grid: jax.Array, embed_dim: int, omega_0: float = 100.0
) -> jax.Array:
    """(H, W, 2) uv grid -> (H, W, embed_dim) embedding (`heads/utils.py:11-41`).

    Channel 0 of the grid (u/x) fills the first half of the embedding,
    channel 1 (v/y) the second half.
    """
    H, W, grid_dim = pos_grid.shape
    assert grid_dim == 2
    pos_flat = pos_grid.reshape(-1, grid_dim)

    emb_x = make_sincos_pos_embed(embed_dim // 2, pos_flat[:, 0], omega_0)
    emb_y = make_sincos_pos_embed(embed_dim // 2, pos_flat[:, 1], omega_0)
    emb = jnp.concatenate([emb_x, emb_y], axis=-1)
    return emb.reshape(H, W, embed_dim)


def create_uv_grid(
    width: int, height: int, aspect_ratio: float | None = None,
    dtype=jnp.float32,
) -> jax.Array:
    """Normalized UV grid of shape (height, width, 2).

    `heads/utils.py:70-128`: spans +-aspect/diag horizontally, +-1/diag
    vertically, with half-pixel insets.  (The reference docstring claims
    (width, height, 2) but torch.meshgrid(..., indexing="xy") actually
    yields (H, W); we match the actual behaviour.)
    """
    if aspect_ratio is None:
        aspect_ratio = float(width) / float(height)

    diag_factor = (aspect_ratio**2 + 1.0) ** 0.5
    span_x = aspect_ratio / diag_factor
    span_y = 1.0 / diag_factor

    left_x = -span_x * (width - 1) / width
    right_x = span_x * (width - 1) / width
    top_y = -span_y * (height - 1) / height
    bottom_y = span_y * (height - 1) / height

    x_coords = jnp.linspace(left_x, right_x, num=width, dtype=dtype)
    y_coords = jnp.linspace(top_y, bottom_y, num=height, dtype=dtype)

    uu = jnp.broadcast_to(x_coords[None, :], (height, width))
    vv = jnp.broadcast_to(y_coords[:, None], (height, width))
    return jnp.stack([uu, vv], axis=-1)
