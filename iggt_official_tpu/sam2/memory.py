"""Streaming memory: RoPE attention, memory attention stack, memory encoder.

Behavioural parity:
- `RoPEAttention` (`sam2/modeling/sam/transformer.py:247-305`) with the
  axial complex rotary tables (`position_encoding.py:179-233`): half the
  head-dim pairs rotate by x position, half by y, over the flattened
  feature grid; ``rope_k_repeat`` tiles the tables across the memory
  frames; the trailing ``num_k_exclude_rope`` keys (object pointers) are
  not rotated.
- `MemoryAttention(Layer)` (`memory_attention.py:11-163`): pre-norm
  self-attn on the current frame, cross-attn into the memory bank, MLP;
  positional encodings added per the config flags; input pos scaled 0.1.
- `MaskDownSampler` / `CXBlock` / `Fuser` / `MemoryEncoder`
  (`memory_encoder.py:11-175`): sigmoid mask downsampling stack fused into
  projected pixel features through ConvNeXt blocks.

All NHWC / (B, N, C) token layouts.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from iggt_official_tpu.ops.conv import Conv2d
from iggt_official_tpu.sam2.common import LayerNorm2d, PositionEmbeddingSine


def axial_rope_tables(
    dim: int, end_x: int, end_y: int, theta: float = 10000.0
) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables (N, dim//2) for the flattened (end_y, end_x) grid
    (`position_encoding.py:179-195`): first dim//4 pairs rotate by x, the
    rest by y."""
    freqs = 1.0 / (
        theta ** (jnp.arange(0, dim, 4, dtype=jnp.float32)[: dim // 4] / dim)
    )
    t = jnp.arange(end_x * end_y, dtype=jnp.float32)
    t_x = t % end_x
    t_y = jnp.floor(t / end_x)
    ang_x = jnp.outer(t_x, freqs)
    ang_y = jnp.outer(t_y, freqs)
    ang = jnp.concatenate([ang_x, ang_y], axis=-1)  # (N, dim//2)
    return jnp.cos(ang), jnp.sin(ang)


def apply_rotary(
    x: jax.Array, cos: jax.Array, sin: jax.Array
) -> jax.Array:
    """Rotate feature pairs of (..., N, D) by per-position tables (N, D//2)."""
    x2 = x.reshape(x.shape[:-1] + (-1, 2))
    re, im = x2[..., 0], x2[..., 1]
    out_re = re * cos - im * sin
    out_im = re * sin + im * cos
    return jnp.stack([out_re, out_im], axis=-1).reshape(x.shape)


class RoPEAttention(nn.Module):
    """`sam/transformer.py:247-305`."""

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    kv_in_dim: Optional[int] = None
    rope_theta: float = 10000.0
    rope_k_repeat: bool = False
    feat_sizes: Tuple[int, int] = (64, 64)

    @nn.compact
    def __call__(self, q, k, v, num_k_exclude_rope: int = 0,
                 key_mask=None):
        """key_mask: optional (B, Nk) bool — False keys are excluded
        (enables fixed-shape padded memory banks)."""
        internal = self.embedding_dim // self.downsample_rate
        hd = internal // self.num_heads
        qp = nn.Dense(internal, name="q_proj")(q)
        kp = nn.Dense(internal, name="k_proj")(k)
        vp = nn.Dense(internal, name="v_proj")(v)
        B, Nq = qp.shape[:2]
        Nk = kp.shape[1]
        qh = qp.reshape(B, Nq, self.num_heads, hd)
        kh = kp.reshape(B, Nk, self.num_heads, hd)
        vh = vp.reshape(B, Nk, self.num_heads, hd)

        # rotary tables sized to the (square) current-frame token grid
        side = int(math.sqrt(Nq))
        cos, sin = axial_rope_tables(hd, side, side, self.rope_theta)
        qh = apply_rotary(qh.swapaxes(1, 2), cos[None, None], sin[None, None]).swapaxes(1, 2)

        num_k_rope = Nk - num_k_exclude_rope
        k_rope = kh[:, :num_k_rope]
        if num_k_rope != Nq:
            assert self.rope_k_repeat and num_k_rope % Nq == 0
            r = num_k_rope // Nq
            cos_k = jnp.tile(cos, (r, 1))
            sin_k = jnp.tile(sin, (r, 1))
        else:
            cos_k, sin_k = cos, sin
        k_rope = apply_rotary(
            k_rope.swapaxes(1, 2), cos_k[None, None], sin_k[None, None]
        ).swapaxes(1, 2)
        kh = jnp.concatenate([k_rope, kh[:, num_k_rope:]], axis=1)

        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * hd**-0.5
        if key_mask is not None:
            logits = jnp.where(
                key_mask[:, None, None, :], logits, -1e30
            )
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(B, Nq, internal)
        return nn.Dense(self.embedding_dim, name="out_proj")(out)


class MemoryAttentionLayer(nn.Module):
    """`memory_attention.py:11-94` with the hiera-l config flags
    (pos_enc_at_attn=False, cross-attn keys carry pos)."""

    d_model: int
    dim_feedforward: int
    rope_theta: float = 10000.0
    feat_sizes: Tuple[int, int] = (64, 64)
    kv_in_dim: int = 64
    pos_enc_at_attn: bool = False
    pos_enc_at_cross_attn_keys: bool = True
    pos_enc_at_cross_attn_queries: bool = False

    @nn.compact
    def __call__(self, tgt, memory, pos=None, query_pos=None,
                 num_k_exclude_rope: int = 0, key_mask=None):
        # self attention
        tgt2 = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt)
        qk = tgt2 + query_pos if self.pos_enc_at_attn else tgt2
        tgt = tgt + RoPEAttention(
            self.d_model, num_heads=1, rope_theta=self.rope_theta,
            feat_sizes=self.feat_sizes, name="self_attn",
        )(qk, qk, tgt2)

        # cross attention into memory
        tgt2 = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt)
        q = tgt2 + query_pos if self.pos_enc_at_cross_attn_queries else tgt2
        k = memory + pos if self.pos_enc_at_cross_attn_keys else memory
        tgt = tgt + RoPEAttention(
            self.d_model, num_heads=1, rope_theta=self.rope_theta,
            rope_k_repeat=True, kv_in_dim=self.kv_in_dim,
            feat_sizes=self.feat_sizes, name="cross_attn_image",
        )(q, k, memory, num_k_exclude_rope=num_k_exclude_rope,
          key_mask=key_mask)

        # MLP
        tgt2 = nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt)
        tgt2 = nn.Dense(self.dim_feedforward, name="linear1")(tgt2)
        tgt2 = nn.Dense(self.d_model, name="linear2")(nn.relu(tgt2))
        return tgt + tgt2


class MemoryAttention(nn.Module):
    """`memory_attention.py:97-163` (pos_enc_at_input=True, batch-first)."""

    d_model: int
    num_layers: int
    dim_feedforward: int = 2048
    rope_theta: float = 10000.0
    feat_sizes: Tuple[int, int] = (64, 64)
    kv_in_dim: int = 64

    @nn.compact
    def __call__(self, curr, memory, curr_pos=None, memory_pos=None,
                 num_obj_ptr_tokens: int = 0, key_mask=None):
        """curr (B, N, C); memory (B, M, kv_in_dim); key_mask (B, M) bool."""
        output = curr
        if curr_pos is not None:
            output = output + 0.1 * curr_pos
        for i in range(self.num_layers):
            output = MemoryAttentionLayer(
                self.d_model, self.dim_feedforward, self.rope_theta,
                self.feat_sizes, self.kv_in_dim, name=f"layers_{i}",
            )(output, memory, pos=memory_pos, query_pos=curr_pos,
              num_k_exclude_rope=num_obj_ptr_tokens, key_mask=key_mask)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(output)


class MaskDownSampler(nn.Module):
    """`memory_encoder.py:11-53` (hiera-l: k3 s2 p1, total stride 16)."""

    embed_dim: int = 256
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    total_stride: int = 16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        num_layers = int(math.log2(self.total_stride) // math.log2(self.stride))
        chans = 1
        for i in range(num_layers):
            out_chans = chans * self.stride**2
            x = Conv2d(out_chans, self.kernel_size, stride=self.stride,
                       padding=self.padding, name=f"encoder_{3 * i}")(x)
            x = LayerNorm2d(out_chans, name=f"encoder_{3 * i + 1}")(x)
            x = nn.gelu(x)
            chans = out_chans
        return Conv2d(self.embed_dim, 1, name=f"encoder_{3 * num_layers}")(x)


class CXBlock(nn.Module):
    """ConvNeXt block (`memory_encoder.py:57-113`), NHWC."""

    dim: int
    kernel_size: int = 7
    padding: int = 3
    layer_scale_init_value: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inp = x
        x = nn.Conv(
            self.dim, (self.kernel_size, self.kernel_size),
            padding=self.padding, feature_group_count=self.dim, name="dwconv",
        )(x)
        x = LayerNorm2d(self.dim, name="norm")(x)
        x = nn.Dense(4 * self.dim, name="pwconv1")(x)
        x = nn.gelu(x)
        x = nn.Dense(self.dim, name="pwconv2")(x)
        gamma = self.param(
            "gamma",
            nn.initializers.constant(self.layer_scale_init_value),
            (self.dim,),
        )
        return inp + gamma * x


class MemoryEncoder(nn.Module):
    """`memory_encoder.py:131-175`."""

    out_dim: int
    in_dim: int = 256
    num_fuser_layers: int = 2

    @nn.compact
    def __call__(self, pix_feat: jax.Array, masks: jax.Array,
                 skip_mask_sigmoid: bool = False):
        """pix_feat (B, h, w, in_dim); masks (B, 16h, 16w, 1)."""
        if not skip_mask_sigmoid:
            masks = jax.nn.sigmoid(masks)
        masks = MaskDownSampler(self.in_dim, name="mask_downsampler")(masks)

        x = Conv2d(self.in_dim, 1, name="pix_feat_proj")(pix_feat)
        x = x + masks
        for i in range(self.num_fuser_layers):
            x = CXBlock(self.in_dim, name=f"fuser_layers_{i}")(x)
        if self.out_dim != self.in_dim:
            x = Conv2d(self.out_dim, 1, name="out_proj")(x)
        pos = PositionEmbeddingSine(self.out_dim)(x.shape[1], x.shape[2])
        pos = jnp.broadcast_to(pos[None], x.shape).astype(x.dtype)
        return {"vision_features": x, "vision_pos_enc": [pos]}
