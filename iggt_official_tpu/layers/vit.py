"""DINOv2-style vision transformer used as the IGGT patch embedder.

Behavioural parity: `iggt/layers/vision_transformer.py:42-282` with the
aggregator's construction overrides (`iggt/models/aggregator.py:148-184`):
register tokens, layerscale init 1.0, interpolate_antialias=True,
interpolate_offset=0.0, LayerNorm eps 1e-6, Mlp FFN (ViT-L).

Layout: images arrive as (B, H, W, 3) NHWC (TPU-native); the conv patch
embed produces row-major (B, H/p * W/p, C) tokens, identical ordering to the
reference's NCHW flatten.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from iggt_official_tpu.config import ViTConfig
from iggt_official_tpu.layers.blocks import Block, sdpa_xla
from iggt_official_tpu.ops.interpolate import resize_antialias_bicubic


class ConvPatchEmbed(nn.Module):
    """(B, H, W, 3) -> (B, H/p * W/p, D) via a p x p stride-p conv.

    Parity: `iggt/layers/patch_embed.py:25-88` (norm_layer=None path).
    """

    patch_size: int
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, _ = x.shape
        p = self.patch_size
        assert H % p == 0 and W % p == 0, (H, W, p)
        x = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), padding="VALID",
            dtype=self.dtype, name="proj",
        )(x)
        return x.reshape(B, (H // p) * (W // p), self.embed_dim)


class DinoViT(nn.Module):
    """DINOv2 ViT returning normalized patch tokens.

    Matches `DinoVisionTransformer.forward_features` (`vision_transformer.py:262-281`)
    for the inference path: cls + register tokens, interpolated absolute
    pos-embed (patches + cls only), pre-norm blocks with layerscale, final
    LayerNorm; returns `x_norm_patchtokens` (B, N, D).
    """

    cfg: ViTConfig
    dtype: jnp.dtype = jnp.float32
    fused_ln: bool = False
    attn_fn: Callable = sdpa_xla

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        cfg = self.cfg
        B, H, W, _ = images.shape
        p = cfg.patch_size
        h0, w0 = H // p, W // p

        x = ConvPatchEmbed(p, cfg.embed_dim, dtype=self.dtype,
                           name="patch_embed")(images)

        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, cfg.embed_dim)
        )
        grid = cfg.img_size // p
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, grid * grid + 1, cfg.embed_dim),
        )
        register_tokens = self.param(
            "register_tokens",
            nn.initializers.zeros,
            (1, cfg.num_register_tokens, cfg.embed_dim),
        )

        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (B, 1, cfg.embed_dim)).astype(x.dtype), x],
            axis=1,
        )
        x = x + self._interpolate_pos_encoding(pos_embed, h0, w0, grid).astype(x.dtype)

        if cfg.num_register_tokens:
            regs = jnp.broadcast_to(
                register_tokens, (B, cfg.num_register_tokens, cfg.embed_dim)
            ).astype(x.dtype)
            x = jnp.concatenate([x[:, :1], regs, x[:, 1:]], axis=1)

        for i in range(cfg.depth):
            x = Block(
                dim=cfg.embed_dim,
                num_heads=cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio,
                init_values=cfg.init_values,
                qk_norm=False,
                ln_eps=cfg.ln_eps,
                dtype=self.dtype,
                attn_fn=self.attn_fn,
                fused_ln=self.fused_ln,
                name=f"blocks_{i}",
            )(x)

        x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32, name="norm")(x)
        return x[:, 1 + cfg.num_register_tokens :].astype(self.dtype)

    def _interpolate_pos_encoding(
        self, pos_embed: jax.Array, h0: int, w0: int, grid: int
    ) -> jax.Array:
        """Bicubic-resize the (grid x grid) patch pos-embed to (h0 x w0).

        Parity: `vision_transformer.py:183-215` with interpolate_offset=0
        (explicit output size) and antialias=True.
        """
        if h0 == grid and w0 == grid:
            return pos_embed
        cls_pe = pos_embed[:, :1].astype(jnp.float32)
        patch_pe = pos_embed[:, 1:].astype(jnp.float32)
        dim = pos_embed.shape[-1]
        patch_pe = patch_pe.reshape(grid, grid, dim)
        patch_pe = resize_antialias_bicubic(patch_pe, (h0, w0))
        patch_pe = patch_pe.reshape(1, h0 * w0, dim)
        return jnp.concatenate([cls_pe, patch_pe], axis=1)
