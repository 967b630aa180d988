"""Track head: DPT feature extraction + iterative tracking.

Behavioural parity: `iggt/heads/track_head.py:12-109`: a DPTHead feature
extractor at half resolution (for_tracker, down_ratio=2, pos_embed off)
feeding BaseTrackerPredictor.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
from flax import linen as nn

from iggt_official_tpu.config import DPTConfig, TrackHeadConfig
from iggt_official_tpu.heads.dpt_head import DPTHead
from iggt_official_tpu.heads.track.predictor import BaseTrackerPredictor


class TrackHead(nn.Module):
    cfg: TrackHeadConfig

    @nn.compact
    def __call__(
        self,
        aggregated_tokens_list: Sequence[jax.Array],
        images_hw: Tuple[int, int],
        patch_start_idx: int,
        query_points: jax.Array,
        iters: Optional[int] = None,
    ):
        cfg = self.cfg
        dpt_cfg = DPTConfig(
            dim_in=cfg.dim_in,
            patch_size=cfg.patch_size,
            features=cfg.features,
            intermediate_layer_idx=cfg.intermediate_layer_idx,
            for_tracker=True,
            down_ratio=2,
            pos_embed=False,
            frames_chunk_size=0,
        )
        fmaps = DPTHead(dpt_cfg, name="feature_extractor")(
            aggregated_tokens_list, images_hw, patch_start_idx
        )  # (B, S, H/2, W/2, features)
        return BaseTrackerPredictor(cfg, name="tracker")(
            query_points, fmaps, iters=iters
        )
