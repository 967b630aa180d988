"""2D rotary position embeddings, functional TPU-first design.

Behavioural parity: `iggt/layers/rope.py:63-188` and the position scheme of
`iggt/models/aggregator.py:237-248` (patch positions are 1-based; the 5
special tokens sit at position (0, 0)).

Design notes (vs the reference):
- The reference caches (cos, sin) tables per (dim, seq_len) and gathers them
  with F.embedding per block call.  Here the per-token cos/sin are computed
  once per forward from the integer position grid and *reused by all 48
  blocks* — they are loopingredients, so XLA keeps them resident in HBM and
  the per-block cost is just the fused multiply-adds.
- RoPE is evaluated in float32 regardless of the activation dtype, mirroring
  the fp32 island in the reference (`iggt/heads/block.py:165-170`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Rope2DTables(NamedTuple):
    """Per-token rotation tables, each of shape (..., N, head_dim // 2)."""

    cos_y: jax.Array
    sin_y: jax.Array
    cos_x: jax.Array
    sin_x: jax.Array


def make_patch_positions(
    height: int, width: int, batch: int, patch_start_idx: int
) -> jax.Array:
    """Integer (y, x) positions for [special tokens + patch grid], 1-based.

    Returns (batch, patch_start_idx + H*W, 2) int32.  Matches
    `aggregator.py:237-248`: patches get grid coords + 1, special tokens 0.
    """
    y = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0) + 1
    x = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1) + 1
    grid = jnp.stack([y, x], axis=-1).reshape(height * width, 2)
    special = jnp.zeros((patch_start_idx, 2), dtype=jnp.int32)
    pos = jnp.concatenate([special, grid], axis=0)
    return jnp.broadcast_to(pos[None], (batch, pos.shape[0], 2))


def compute_rope_2d(
    positions: jax.Array, head_dim: int, base_frequency: float = 100.0
) -> Rope2DTables:
    """Build cos/sin tables from integer positions (..., N, 2).

    Each spatial direction rotates half the head dim (D/2), using D/4
    frequencies duplicated over the two rotation lanes
    (`rope.py:86-120,154-188`).
    """
    assert head_dim % 4 == 0, "head_dim must be divisible by 4 for 2D RoPE"
    dim = head_dim // 2  # per-direction feature dim

    exponents = jnp.arange(0, dim, 2, dtype=jnp.float32) / dim
    inv_freq = 1.0 / (base_frequency**exponents)  # (dim//2,)

    pos_f = positions.astype(jnp.float32)
    ang_y = pos_f[..., 0:1] * inv_freq  # (..., N, dim//2)
    ang_x = pos_f[..., 1:2] * inv_freq

    return Rope2DTables(
        cos_y=jnp.cos(ang_y),
        sin_y=jnp.sin(ang_y),
        cos_x=jnp.cos(ang_x),
        sin_x=jnp.sin(ang_x),
    )


def pack_rope_tables(tables: Rope2DTables) -> tuple[jax.Array, jax.Array]:
    """Pack the 4 per-direction tables into full-head-dim (..., N, D) cos/sin.

    Layout matches `apply_rope_2d`: features [0:D/2) rotate by y with the
    rotate-half duplication [cos_y, cos_y], features [D/2:D) by x.  Used by
    the fused attention kernel (`ops/flash_attention.py:attention_fused`),
    which applies `x * cos + (x @ R) * sin` with the rotate-half +/-1
    matrix R — all blocks share one packed table per forward (XLA CSE).
    """
    cos = jnp.concatenate(
        [tables.cos_y, tables.cos_y, tables.cos_x, tables.cos_x], axis=-1
    )
    sin = jnp.concatenate(
        [tables.sin_y, tables.sin_y, tables.sin_x, tables.sin_x], axis=-1
    )
    return cos, sin


def _rotate_half(x: jax.Array) -> jax.Array:
    """(-x2, x1) pairing over the last dim halves (`rope.py:122-135`)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def _apply_1d(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (..., N, H, D2); cos/sin: (..., N, D2//2) broadcast over heads."""
    cs = jnp.concatenate([cos, cos], axis=-1)[..., None, :]
    sn = jnp.concatenate([sin, sin], axis=-1)[..., None, :]
    return x * cs + _rotate_half(x) * sn


def apply_rope_2d(x: jax.Array, tables: Rope2DTables) -> jax.Array:
    """Apply 2D RoPE to (..., N, num_heads, head_dim) tokens in fp32.

    The first D/2 features rotate by the y tables, the rest by x
    (`rope.py:154-188`).  Output has the input dtype.
    """
    in_dtype = x.dtype
    x = x.astype(jnp.float32)
    half = x.shape[-1] // 2
    vert = _apply_1d(x[..., :half], tables.cos_y, tables.sin_y)
    horz = _apply_1d(x[..., half:], tables.cos_x, tables.sin_x)
    return jnp.concatenate([vert, horz], axis=-1).astype(in_dtype)
