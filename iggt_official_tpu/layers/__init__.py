"""ViT primitives: 2D RoPE, qk-norm attention, pre-norm blocks, DINOv2 ViT."""

from iggt_official_tpu.layers.rope import (
    Rope2DTables,
    compute_rope_2d,
    apply_rope_2d,
    make_patch_positions,
)
from iggt_official_tpu.layers.blocks import Mlp, LayerScale, Block, Attention
