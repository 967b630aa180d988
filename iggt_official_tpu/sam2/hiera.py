"""Hiera hierarchical windowed ViT trunk + FPN image encoder.

Behavioural parity:
- `Hiera` (`sam2/modeling/backbones/hieradet.py:163-293`): 7x7/s4 conv
  patch embed, windowed-background + window-tile positional embedding,
  4 stages of MultiScaleBlocks with q-pooling at stage boundaries and
  global attention at selected blocks; returns per-stage feature maps.
- `FpnNeck` + `ImageEncoder` (`backbones/image_encoder.py:8-128`):
  1x1 lateral convs to d_model, top-down nearest-neighbour fusion on the
  configured levels, sine position embeddings, `scalp` dropping the
  coarsest level.

All NHWC.  Config tables live in `iggt_official_tpu/sam2/config.py`.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from iggt_official_tpu.sam2.common import (
    MLP,
    PositionEmbeddingSine,
    window_partition,
    window_unpartition,
)
from iggt_official_tpu.sam2.config import HieraConfig, SAM2Config
from iggt_official_tpu.ops.conv import Conv2d
from iggt_official_tpu.ops.flash_attention import attention
from iggt_official_tpu.ops.interpolate import bilinear_resize_align_corners


def _max_pool_2x2(x: jax.Array) -> jax.Array:
    """NHWC maxpool k2 s2 (stage-boundary q-pooling)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


class MultiScaleAttention(nn.Module):
    """`hieradet.py:33-75`: plain MHA over window tokens with optional
    q-pooling at stage changes."""

    dim_out: int
    num_heads: int
    q_pool: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, _ = x.shape
        hd = self.dim_out // self.num_heads
        qkv = nn.Dense(3 * self.dim_out, name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        if self.q_pool:
            q = q.reshape(B, H, W, self.dim_out)
            q = _max_pool_2x2(q)
            H, W = q.shape[1], q.shape[2]
            q = q.reshape(B, H * W, self.num_heads, hd)

        # dispatcher: XLA softmax for the small windowed blocks, Pallas
        # flash for the >=4k-token global-attention blocks
        out = attention(q, k, v)
        out = out.reshape(B, H, W, self.dim_out)
        return nn.Dense(self.dim_out, name="proj")(out)


class MultiScaleBlock(nn.Module):
    """`hieradet.py:78-160`."""

    dim: int
    dim_out: int
    num_heads: int
    mlp_ratio: float = 4.0
    q_stride: Optional[Tuple[int, int]] = None
    window_size: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)

        if self.dim != self.dim_out:
            shortcut = nn.Dense(self.dim_out, name="proj")(x)
            if self.q_stride:
                shortcut = _max_pool_2x2(shortcut)

        ws = self.window_size
        if ws > 0:
            H, W = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, ws)

        x = MultiScaleAttention(
            self.dim_out, self.num_heads, q_pool=self.q_stride is not None,
            name="attn",
        )(x)
        if self.q_stride and self.window_size > 0:
            ws = self.window_size // self.q_stride[0]
            H, W = shortcut.shape[1:3]
            pad_h = (ws - H % ws) % ws
            pad_w = (ws - W % ws) % ws
            pad_hw = (H + pad_h, W + pad_w)
        if self.window_size > 0:
            x = window_unpartition(x, ws, pad_hw, (H, W))

        x = shortcut + x
        x = x + MLP(
            int(self.dim_out * self.mlp_ratio), self.dim_out, num_layers=2,
            activation=nn.gelu, name="mlp",
        )(nn.LayerNorm(epsilon=1e-6, name="norm2")(x))
        return x


class Hiera(nn.Module):
    cfg: HieraConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        """images (B, H, W, 3) -> per-stage NHWC features, fine to coarse."""
        cfg = self.cfg
        x = Conv2d(cfg.embed_dim, 7, stride=4, padding=3,
                   name="patch_embed_proj")(x)
        B, H, W, _ = x.shape

        bg_h, bg_w = cfg.window_pos_embed_bkg_spatial_size
        pos_embed_bkg = self.param(
            "pos_embed", nn.initializers.zeros, (bg_h, bg_w, cfg.embed_dim)
        )
        pos_window = self.param(
            "pos_embed_window", nn.initializers.zeros,
            (cfg.window_spec[0], cfg.window_spec[0], cfg.embed_dim),
        )
        # bicubic-resize background embed + tile window embed
        # (`hieradet.py:267-275`; torch uses align_corners=False bicubic —
        # we use our align-corners bilinear: both are smooth upsamplings of
        # a learned background field, trained end-to-end here)
        pe = bilinear_resize_align_corners(
            pos_embed_bkg[None].astype(jnp.float32), (H, W)
        )[0]
        reps_h = -(-H // cfg.window_spec[0])
        reps_w = -(-W // cfg.window_spec[0])
        tiled = jnp.tile(pos_window, (reps_h, reps_w, 1))[:H, :W]
        x = x + (pe + tiled).astype(x.dtype)

        depth = sum(cfg.stages)
        stage_ends = [sum(cfg.stages[: i + 1]) - 1 for i in range(len(cfg.stages))]
        q_pool_blocks = [e + 1 for e in stage_ends[:-1]][: cfg.q_pool]

        dim = cfg.embed_dim
        heads = cfg.num_heads
        cur_stage = 1
        outputs: List[jax.Array] = []
        for i in range(depth):
            dim_out = dim
            window_size = cfg.window_spec[cur_stage - 1]
            if cfg.global_att_blocks and i in cfg.global_att_blocks:
                window_size = 0
            if i - 1 in stage_ends:
                dim_out = int(dim * cfg.dim_mul)
                heads = int(heads * cfg.head_mul)
                cur_stage += 1
            x = MultiScaleBlock(
                dim=dim,
                dim_out=dim_out,
                num_heads=heads,
                q_stride=cfg.q_stride if i in q_pool_blocks else None,
                window_size=window_size,
                name=f"blocks_{i}",
            )(x)
            dim = dim_out
            if i in stage_ends:
                outputs.append(x)
        return outputs


class ImageEncoder(nn.Module):
    """Hiera + FPN neck (`image_encoder.py:8-128`)."""

    cfg: SAM2Config

    @nn.compact
    def __call__(self, images: jax.Array):
        cfg = self.cfg
        feats = Hiera(cfg.hiera, name="trunk")(images)  # fine -> coarse
        # neck consumes coarse -> fine channel list; xs[i] fine->coarse
        n = len(feats) - 1
        pos_enc = PositionEmbeddingSine(cfg.d_model)

        out: List[Optional[jax.Array]] = [None] * len(feats)
        pos: List[Optional[jax.Array]] = [None] * len(feats)
        prev = None
        for i in range(n, -1, -1):
            lateral = Conv2d(cfg.d_model, 1, name=f"neck_convs_{n - i}")(
                feats[i].astype(jnp.float32)
            )
            if i in cfg.fpn_top_down_levels and prev is not None:
                h, w = lateral.shape[1], lateral.shape[2]
                # nearest 2x upsample (`fpn_interp_model: nearest`)
                td = jnp.repeat(jnp.repeat(prev, 2, axis=1), 2, axis=2)
                prev = lateral + td[:, :h, :w]
            else:
                prev = lateral
            out[i] = prev
            pe = pos_enc(prev.shape[1], prev.shape[2])
            pos[i] = jnp.broadcast_to(
                pe[None], (prev.shape[0],) + pe.shape
            ).astype(prev.dtype)

        if cfg.scalp > 0:
            out = out[: -cfg.scalp]
            pos = pos[: -cfg.scalp]
        return {
            "vision_features": out[-1],
            "vision_pos_enc": pos,
            "backbone_fpn": out,
        }
