"""Alternating-attention Aggregator trunk (VGGT-style).

Behavioural parity: `iggt/models/aggregator.py:19-361`.
One forward:  images (B, S, H, W, 3) in [0,1]  ->  24 aggregated token maps
(B, S, P, 2*embed_dim) (frame-attention output ++ global-attention output),
plus patch_start_idx = 5 (1 camera + 4 register tokens).

TPU-first design decisions
- NHWC images; tokens stay (.., P, C) with row-major patch order identical
  to the reference flatten.
- RoPE cos/sin tables are computed once per forward and reshaped between
  the frame view (B*S, P) and global view (B, S*P) — the reference rebuilds
  position embeddings per block call.
- The frame/global alternation is a Python loop over 24 pairs, unrolled
  under jit; every block is the same shape so XLA reuses the compiled body.
- Sequence parallelism: frame attention is embarrassingly parallel over S;
  global attention is the O((S*P)^2) hot spot.  `attn_fn` is injected so the
  caller can swap the XLA softmax path for the Pallas flash kernel or a
  ring-sharded variant (see iggt_official_tpu/parallel/).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from iggt_official_tpu.config import AggregatorConfig
from iggt_official_tpu.layers.blocks import Block, sdpa_xla
from iggt_official_tpu.layers.rope import (
    Rope2DTables,
    compute_rope_2d,
    make_patch_positions,
)
from iggt_official_tpu.layers.vit import ConvPatchEmbed, DinoViT

_RESNET_MEAN = (0.485, 0.456, 0.406)
_RESNET_STD = (0.229, 0.224, 0.225)


def slice_expand_and_flatten(token: jax.Array, B: int, S: int) -> jax.Array:
    """(1, 2, X, C) special tokens -> (B*S, X, C).

    Index 0 serves the first frame, index 1 all other frames
    (`aggregator.py:338-361`).
    """
    query = jnp.broadcast_to(token[:, 0:1], (B, 1) + token.shape[2:])
    others = jnp.broadcast_to(token[:, 1:2], (B, S - 1) + token.shape[2:])
    combined = jnp.concatenate([query, others], axis=1)
    return combined.reshape((B * S,) + token.shape[2:])


class Aggregator(nn.Module):
    """Alternating frame/global attention over multi-view patch tokens."""

    cfg: AggregatorConfig
    dtype: jnp.dtype = jnp.float32
    attn_fn: Callable = sdpa_xla
    # optional distinct implementation for the global blocks (e.g. the
    # shard_map sequence-parallel attention from parallel/attention.py)
    global_attn_fn: Optional[Callable] = None
    # rematerialize each AA block under grad (parity with the reference's
    # per-block gradient checkpointing, `aggregator.py:293-299,323-329`)
    remat: bool = False
    # optional sharding-constraint hook (tokens, "frame"|"global") -> tokens,
    # see iggt_official_tpu.parallel.make_token_sharder
    shard_fn: Optional[Callable] = None
    # merge this many KV tokens out of the global-attention blocks
    # (FastVGGT-style training-free acceleration, ops/token_merge.py);
    # 0 disables.  Clamped to the unprotected-candidate count.
    global_merge_r: int = 0
    # single-pass Pallas LayerNorm in the trunk blocks (inference paths)
    fused_ln: bool = False

    @nn.compact
    def __call__(
        self,
        images: jax.Array,
    ) -> Tuple[List[jax.Array], int]:
        cfg = self.cfg
        B, S, H, W, C_in = images.shape
        if C_in != 3:
            raise ValueError(f"Expected 3 input channels, got {C_in}")
        p = cfg.patch_size
        patch_start_idx = cfg.patch_start_idx

        mean = jnp.asarray(_RESNET_MEAN, dtype=jnp.float32)
        std = jnp.asarray(_RESNET_STD, dtype=jnp.float32)
        x = (images.astype(jnp.float32) - mean) / std
        x = x.reshape(B * S, H, W, 3).astype(self.dtype)

        if "conv" in cfg.patch_embed:
            patch_tokens = ConvPatchEmbed(
                p, cfg.embed_dim, dtype=self.dtype, name="patch_embed"
            )(x)
        else:
            patch_tokens = DinoViT(cfg.vit, dtype=self.dtype,
                                   attn_fn=self.attn_fn,
                                   fused_ln=self.fused_ln,
                                   name="patch_embed")(x)

        camera_token = self.param(
            "camera_token", nn.initializers.normal(1e-6), (1, 2, 1, cfg.embed_dim)
        )
        register_token = self.param(
            "register_token",
            nn.initializers.normal(1e-6),
            (1, 2, cfg.num_register_tokens, cfg.embed_dim),
        )

        cam = slice_expand_and_flatten(camera_token, B, S).astype(patch_tokens.dtype)
        reg = slice_expand_and_flatten(register_token, B, S).astype(patch_tokens.dtype)
        tokens = jnp.concatenate([cam, reg, patch_tokens], axis=1)
        P = tokens.shape[1]
        C = cfg.embed_dim

        rope_frame: Optional[Rope2DTables] = None
        rope_global: Optional[Rope2DTables] = None
        if cfg.rope_freq > 0:
            positions = make_patch_positions(H // p, W // p, B * S, patch_start_idx)
            head_dim = C // cfg.num_heads
            rope_frame = compute_rope_2d(positions, head_dim, cfg.rope_freq)
            rope_global = jax.tree.map(
                lambda t: t.reshape(B, S * P, t.shape[-1]), rope_frame
            )

        block_cls = nn.remat(Block) if self.remat else Block

        merged_attn: Optional[Callable] = None
        if self.global_merge_r > 0:
            import numpy as np

            from iggt_official_tpu.ops.token_merge import (
                compute_merge_plan,
                make_merged_attention,
            )

            # protect camera/register tokens and the whole reference frame 0
            frame_id = np.repeat(np.arange(S), P)
            pos_in_frame = np.tile(np.arange(P), S)
            protect_np = (frame_id == 0) | (pos_in_frame < patch_start_idx)
            n_candidates = int((~protect_np)[1::2].sum())
            r = min(self.global_merge_r, n_candidates)
            if r > 0:  # S=1 protects every token -> merging is a no-op
                protect = jnp.broadcast_to(
                    jnp.asarray(protect_np)[None], (B, S * P)
                )
                plan = compute_merge_plan(
                    tokens.reshape(B, S * P, C).astype(jnp.float32), r,
                    protect,
                )
                merged_attn = make_merged_attention(plan)

        def make_block(kind: str, i: int) -> Block:
            attn = self.attn_fn
            if kind == "global":
                if merged_attn is not None:
                    attn = merged_attn
                elif self.global_attn_fn is not None:
                    attn = self.global_attn_fn
            return block_cls(
                dim=C,
                num_heads=cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio,
                qkv_bias=cfg.qkv_bias,
                proj_bias=cfg.proj_bias,
                ffn_bias=cfg.ffn_bias,
                init_values=cfg.init_values,
                qk_norm=cfg.qk_norm,
                dtype=self.dtype,
                attn_fn=attn,
                fused_ln=self.fused_ln,
                name=f"{kind}_blocks_{i}",
            )

        outputs: List[jax.Array] = []
        for i in range(cfg.depth):
            for attn_type in cfg.aa_order:
                if attn_type == "frame":
                    tokens = tokens.reshape(B * S, P, C)
                    if self.shard_fn is not None:
                        tokens = self.shard_fn(tokens, "frame")
                    tokens = make_block("frame", i)(tokens, rope_frame)
                    frame_inter = tokens.reshape(B, S, P, C)
                elif attn_type == "global":
                    tokens = tokens.reshape(B, S * P, C)
                    if self.shard_fn is not None:
                        tokens = self.shard_fn(tokens, "global")
                    tokens = make_block("global", i)(tokens, rope_global)
                    global_inter = tokens.reshape(B, S, P, C)
                else:
                    raise ValueError(f"Unknown attention type: {attn_type}")
            outputs.append(jnp.concatenate([frame_inter, global_inter], axis=-1))

        return outputs, patch_start_idx
