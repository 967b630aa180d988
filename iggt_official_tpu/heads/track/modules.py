"""Tracker transformer blocks.

Behavioural parity: `iggt/heads/track_modules/modules.py` +
`blocks.py:19-146` (EfficientUpdateFormer).

Reference quirks replicated:
- `AttnBlock`/`CrossAttnBlock` rebind x to its pre-norm BEFORE the residual
  (`modules.py:170-180,210-218`), so the residual stream carries the
  *normalized* activations — not standard pre-norm.
- torch `nn.MultiheadAttention` packs q/k/v into one in-projection; the
  `TorchMHA` module mirrors that parameter layout for checkpoint
  conversion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from iggt_official_tpu.layers.blocks import Mlp, sdpa_xla


class TorchMHA(nn.Module):
    """torch nn.MultiheadAttention equivalent (batch_first, no dropout)."""

    embed_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
        E = self.embed_dim
        hd = E // self.num_heads
        in_proj_w = self.param(
            "in_proj_weight", nn.initializers.xavier_uniform(), (3 * E, E)
        )
        in_proj_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * E,))
        qp = q @ in_proj_w[:E].T + in_proj_b[:E]
        kp = k @ in_proj_w[E : 2 * E].T + in_proj_b[E : 2 * E]
        vp = v @ in_proj_w[2 * E :].T + in_proj_b[2 * E :]

        B, Nq, _ = qp.shape
        qh = qp.reshape(B, Nq, self.num_heads, hd)
        kh = kp.reshape(B, -1, self.num_heads, hd)
        vh = vp.reshape(B, -1, self.num_heads, hd)
        out = sdpa_xla(qh, kh, vh).reshape(B, Nq, E)
        return nn.Dense(E, name="out_proj")(out)


class AttnBlock(nn.Module):
    """Self-attention block (`modules.py:146-182`)."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)  # residual from normed!
        attn = TorchMHA(self.hidden_size, self.num_heads, name="attn")(x, x, x)
        x = x + attn
        x = x + Mlp(int(self.hidden_size * self.mlp_ratio), name="mlp")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        )
        return x


class CrossAttnBlock(nn.Module):
    """Cross-attention block (`modules.py:185-218`)."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array) -> jax.Array:
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        context = nn.LayerNorm(epsilon=1e-5, name="norm_context")(context)
        attn = TorchMHA(self.hidden_size, self.num_heads, name="cross_attn")(
            x, context, context
        )
        x = x + attn
        x = x + Mlp(int(self.hidden_size * self.mlp_ratio), name="mlp")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        )
        return x


class EfficientUpdateFormer(nn.Module):
    """Alternating time-attention / virtual-track space attention
    (`blocks.py:19-146`)."""

    space_depth: int = 6
    time_depth: int = 6
    hidden_size: int = 384
    num_heads: int = 8
    output_dim: int = 130
    mlp_ratio: float = 4.0
    add_space_attn: bool = True
    num_virtual_tracks: int = 64

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, N, T, D_in) -> (B, N, T, output_dim)."""
        B, N0, T, _ = x.shape
        x = nn.LayerNorm(epsilon=1e-5, name="input_norm")(x)
        tokens = nn.Dense(self.hidden_size, name="input_transform")(x)
        init_tokens = tokens

        if self.add_space_attn:
            virtual = self.param(
                "virual_tracks",
                nn.initializers.normal(1.0),
                (1, self.num_virtual_tracks, 1, self.hidden_size),
            )
            vt = jnp.broadcast_to(
                virtual, (B, self.num_virtual_tracks, T, self.hidden_size)
            )
            tokens = jnp.concatenate([tokens, vt], axis=1)

        N = tokens.shape[1]
        time_blocks = [
            AttnBlock(self.hidden_size, self.num_heads, self.mlp_ratio,
                      name=f"time_blocks_{i}")
            for i in range(self.time_depth)
        ]
        if self.add_space_attn:
            sv = [AttnBlock(self.hidden_size, self.num_heads, self.mlp_ratio,
                            name=f"space_virtual_blocks_{i}")
                  for i in range(self.space_depth)]
            p2v = [CrossAttnBlock(self.hidden_size, self.num_heads,
                                  self.mlp_ratio,
                                  name=f"space_point2virtual_blocks_{i}")
                   for i in range(self.space_depth)]
            v2p = [CrossAttnBlock(self.hidden_size, self.num_heads,
                                  self.mlp_ratio,
                                  name=f"space_virtual2point_blocks_{i}")
                   for i in range(self.space_depth)]

        j = 0
        for i in range(self.time_depth):
            tt = tokens.reshape(B * N, T, self.hidden_size)
            tt = time_blocks[i](tt)
            tokens = tt.reshape(B, N, T, self.hidden_size)
            if self.add_space_attn and (
                i % (self.time_depth // self.space_depth) == 0
            ):
                st = jnp.swapaxes(tokens, 1, 2).reshape(B * T, N, self.hidden_size)
                pts = st[:, : N - self.num_virtual_tracks]
                virt = st[:, N - self.num_virtual_tracks :]
                virt = v2p[j](virt, pts)
                virt = sv[j](virt)
                pts = p2v[j](pts, virt)
                st = jnp.concatenate([pts, virt], axis=1)
                tokens = jnp.swapaxes(
                    st.reshape(B, T, N, self.hidden_size), 1, 2
                )
                j += 1

        if self.add_space_attn:
            tokens = tokens[:, : N - self.num_virtual_tracks]
        tokens = tokens + init_tokens
        tokens = nn.LayerNorm(epsilon=1e-5, name="output_norm")(tokens)
        return nn.Dense(self.output_dim, name="flow_head")(tokens)
