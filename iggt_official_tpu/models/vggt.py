"""VGGT / IGGT model assembly.

Behavioural parity: `iggt/models/vggt.py:14-230`.
- ``VGGT``: aggregator + camera/depth/point(/track) heads.
- ``IGGT``: VGGT + instance path — point head also emits its fusion pyramid,
  a SamProjector maps tokens to a 4-level pyramid, and the PartHead fuses
  both into 8-channel instance features.

TPU design notes:
- The trunk (patch embed + 48 alternating blocks) runs in ``trunk_dtype``
  (bf16 by default); every head runs fp32, mirroring the reference's
  autocast-disabled head region (`vggt.py:189`, `demo.py:191-195`).
- Outputs are NHWC / channels-last: depth (B,S,H,W,1), world points
  (B,S,H,W,3), part features (B,S,H,W,8), pose encodings (B,S,9).
- ``attn_fn`` is forwarded to the aggregator so callers can swap the XLA
  attention for the Pallas flash kernel or a sharded variant.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from iggt_official_tpu.config import ModelConfig
from iggt_official_tpu.heads.adaptor import SamProjector
from iggt_official_tpu.heads.camera_head import CameraHead
from iggt_official_tpu.heads.dpt_head import DPTHead
from iggt_official_tpu.heads.part_head import PartHead
from iggt_official_tpu.layers.blocks import sdpa_xla
from iggt_official_tpu.models.aggregator import Aggregator


def _dtype(name: str) -> jnp.dtype:
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


class VGGT(nn.Module):
    """Pose + depth + point (+track) model (`vggt.py:14-130`)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        images: jax.Array,
        query_points: Optional[jax.Array] = None,
        attn_fn: Callable = sdpa_xla,
    ) -> Dict[str, jax.Array]:
        cfg = self.cfg
        B, S, H, W, _ = images.shape
        tokens_list, patch_start_idx = Aggregator(
            cfg.aggregator.with_vit(), dtype=_dtype(cfg.trunk_dtype),
            name="aggregator",
        )(images, attn_fn=attn_fn)
        # heads run fp32 (`vggt.py:189`)
        tokens_list = [t.astype(jnp.float32) for t in tokens_list]

        preds: Dict[str, jax.Array] = {}
        if cfg.enable_camera:
            pose_list = CameraHead(cfg.camera, name="camera_head")(tokens_list[-1])
            preds["pose_enc"] = pose_list[-1]
            preds["pose_enc_list"] = pose_list
        if cfg.enable_depth:
            depth, depth_conf = DPTHead(cfg.depth_head, name="depth_head")(
                tokens_list, (H, W), patch_start_idx
            )
            preds["depth"] = depth
            preds["depth_conf"] = depth_conf
        if cfg.enable_point:
            pts3d, pts3d_conf = DPTHead(
                cfg.point_head, name="point_head"
            )(tokens_list, (H, W), patch_start_idx)
            preds["world_points"] = pts3d
            preds["world_points_conf"] = pts3d_conf
        return preds


class IGGT(nn.Module):
    """VGGT + instance grounding (`vggt.py:132-230`)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        images: jax.Array,
        query_points: Optional[jax.Array] = None,
        attn_fn: Callable = sdpa_xla,
    ) -> Dict[str, jax.Array]:
        cfg = self.cfg
        B, S, H, W, _ = images.shape
        tokens_list, patch_start_idx = Aggregator(
            cfg.aggregator.with_vit(), dtype=_dtype(cfg.trunk_dtype),
            name="aggregator",
        )(images, attn_fn=attn_fn)
        tokens_list = [t.astype(jnp.float32) for t in tokens_list]

        preds: Dict[str, jax.Array] = {}
        if cfg.enable_camera:
            pose_list = CameraHead(cfg.camera, name="camera_head")(tokens_list[-1])
            preds["pose_enc"] = pose_list[-1]
            preds["pose_enc_list"] = pose_list

        if cfg.enable_depth:
            depth, depth_conf = DPTHead(cfg.depth_head, name="depth_head")(
                tokens_list, (H, W), patch_start_idx
            )
            preds["depth"] = depth
            preds["depth_conf"] = depth_conf

        point_pyramid = None
        if cfg.enable_point:
            pts3d, pts3d_conf, point_pyramid = DPTHead(
                cfg.point_head, name="point_head"
            )(tokens_list, (H, W), patch_start_idx)
            preds["world_points"] = pts3d
            preds["world_points_conf"] = pts3d_conf

        if cfg.enable_part:
            assert point_pyramid is not None, "part head needs the point pyramid"
            projector = SamProjector(
                dim_in=cfg.part.dim_in,
                patch_size=cfg.part.patch_size,
                intermediate_layer_idx=cfg.part.intermediate_layer_idx,
                out_channels=cfg.part.out_channels,
                name="part_adaptor",
            )(tokens_list, (H, W), patch_start_idx)
            part_feat = PartHead(cfg.part, name="part_head")(
                projector, point_pyramid, (H, W), (B, S)
            )
            preds["part_feat"] = part_feat

        return preds


def build_model(cfg: ModelConfig) -> nn.Module:
    """Factory mirroring the reference's two model classes."""
    return IGGT(cfg) if cfg.name == "iggt" else VGGT(cfg)
