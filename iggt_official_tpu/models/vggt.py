"""VGGT / IGGT model assembly.

Behavioural parity: `iggt/models/vggt.py:14-230`.
- ``VGGT``: aggregator + camera/depth/point(/track) heads.
- ``IGGT``: VGGT + instance path — point head also emits its fusion pyramid,
  a SamProjector maps tokens to a 4-level pyramid, and the PartHead fuses
  both into 8-channel instance features.

TPU design notes:
- The trunk (patch embed + 48 alternating blocks) runs in ``trunk_dtype``
  (bf16 by default); heads run in ``head_dtype`` — float32 by default,
  mirroring the reference's autocast-disabled head region (`vggt.py:189`,
  `demo.py:191-195`) and enforced regardless of parameter storage dtype;
  ``head_dtype="bfloat16"`` is the documented fast mode (activations and
  LayerNorms stay fp32).
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
from iggt_official_tpu.heads.track import TrackHead
from iggt_official_tpu.layers.blocks import sdpa_xla
from iggt_official_tpu.models.aggregator import Aggregator


def _dtype(name: str) -> jnp.dtype:
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


def _chunk_views(x, B, nc, cs):
    """Add a leading chunk axis over the view dim.

    (B, S, ...) -> (nc, B, cs, ...);  flat (B*S, ...) -> (nc, B*cs, ...).
    """
    if x.shape[0] == B:
        return x.reshape(B, nc, cs, *x.shape[2:]).swapaxes(0, 1)
    return (
        x.reshape(B, nc, cs, *x.shape[1:])
        .swapaxes(0, 1)
        .reshape(nc, B * cs, *x.shape[1:])
    )


def _unchunk_views(x, B, nc, cs, flat: bool):
    """Inverse of `_chunk_views` on scan outputs.

    ``flat`` must be passed explicitly: when cs == 1 (prime view counts
    above the chunk bound) the batched (nc, B, cs, ...) and flat
    (nc, B*cs, ...) layouts are indistinguishable by shape sniffing."""
    if not flat:                   # (nc, B, cs, ...)
        return x.swapaxes(0, 1).reshape(B, nc * cs, *x.shape[3:])
    # (nc, B*cs, ...)
    rest = x.shape[2:]
    return (
        x.reshape(nc, B, cs, *rest).swapaxes(0, 1).reshape(B * nc * cs, *rest)
    )


def _scan_chunks(head, args, nc):
    """Apply `head(*args)` serially over a leading chunk axis via nn.scan.

    TPU equivalent of the reference's ``frames_chunk_size`` memory bound
    (`dpt_head.py:154-190`): the fp32 full-resolution decode of each view
    chunk is serialized, so peak HBM is O(chunk) instead of O(S).  Params
    are broadcast, so parameter names are identical to the unscanned path.
    """

    def _body(mdl, carry, xs):
        return carry, mdl(*xs)

    scanned = nn.scan(
        _body,
        variable_broadcast="params",
        split_rngs={"params": False},
        in_axes=0,
        out_axes=0,
        length=nc,
    )
    _, out = scanned(head, None, args)
    return out


def _view_chunking(S, chunk_size):
    """(nc, cs) if chunking applies, else None.

    ``chunk_size`` is an upper bound: the largest divisor of S within it is
    used, so non-divisible view counts still get a bounded-memory decode
    (e.g. S=6 with bound 4 scans chunks of 3 rather than decoding all 6
    frames at once).
    """
    if not chunk_size or S <= chunk_size:
        return None
    cs = max(d for d in range(1, chunk_size + 1) if S % d == 0)
    if cs == 1:
        # prime S above the bound: scan one view at a time
        return S, 1
    return S // cs, cs


def _apply_dpt_chunked(cfg_head, name, tokens_list, images_hw, patch_start_idx,
                       dtype=jnp.float32):
    """DPTHead over view chunks (falls back to one call when not needed)."""
    B, S = tokens_list[0].shape[0], tokens_list[0].shape[1]
    plan = _view_chunking(S, cfg_head.frames_chunk_size)
    head = DPTHead(
        cfg_head, images_hw=images_hw, patch_start_idx=patch_start_idx,
        dtype=dtype, name=name
    )
    if plan is None:
        return head(tokens_list)
    nc, cs = plan
    out = _scan_chunks(
        head, ([_chunk_views(t, B, nc, cs) for t in tokens_list],), nc
    )
    # DPTHead emits (B, cs, H, W, c) preds/conf; the use_point_feat fusion
    # pyramid stays flat (B*cs, h, w, c) (`dpt_head.py:216-221`)
    if isinstance(out, tuple) and len(out) == 3:
        preds, conf, pyramid = out
        return (
            _unchunk_views(preds, B, nc, cs, flat=False),
            _unchunk_views(conf, B, nc, cs, flat=False),
            tuple(_unchunk_views(p, B, nc, cs, flat=True) for p in pyramid),
        )
    return jax.tree.map(
        lambda x: _unchunk_views(x, B, nc, cs, flat=False), out
    )


class VGGT(nn.Module):
    """Pose + depth + point (+track) model (`vggt.py:14-130`)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        images: jax.Array,
        query_points: Optional[jax.Array] = None,
        attn_fn: Callable = sdpa_xla,
        global_attn_fn: Optional[Callable] = None,
        remat: bool = False,
        shard_fn: Optional[Callable] = None,
        global_merge_r: int = 0,
        fused_ln: bool = False,
        feat_only: bool = False,
    ) -> Dict[str, jax.Array]:
        cfg = self.cfg
        B, S, H, W, _ = images.shape
        tokens_list, patch_start_idx = Aggregator(
            cfg.aggregator.with_vit(), dtype=_dtype(cfg.trunk_dtype),
            attn_fn=attn_fn, global_attn_fn=global_attn_fn, remat=remat,
            shard_fn=shard_fn, global_merge_r=global_merge_r,
            fused_ln=fused_ln,
            name="aggregator",
        )(images)
        # tokens stay in trunk dtype (bf16) in HBM; heads upcast to fp32 at
        # their entry (`vggt.py:189` equivalent)

        if feat_only:
            # feature-only pass (`vggt.py:97-130` `forward_feat`): the last
            # aggregated token map plus the raw depth/point head outputs —
            # no camera refinement, no tracking
            preds: Dict[str, jax.Array] = {"cam_token": tokens_list[-1]}
            preds["depth"] = _apply_dpt_chunked(
                cfg.depth_head, "depth_head", tokens_list, (H, W),
                patch_start_idx, dtype=_dtype(cfg.head_dtype)
            )
            preds["point"] = _apply_dpt_chunked(
                cfg.point_head, "point_head", tokens_list, (H, W),
                patch_start_idx, dtype=_dtype(cfg.head_dtype)
            )
            preds["images"] = images
            return preds

        preds = {}
        if cfg.enable_camera:
            pose_list = CameraHead(cfg.camera, name="camera_head")(tokens_list[-1])
            preds["pose_enc"] = pose_list[-1]
            preds["pose_enc_list"] = pose_list
        if cfg.enable_depth:
            depth, depth_conf = _apply_dpt_chunked(
                cfg.depth_head, "depth_head", tokens_list, (H, W),
                patch_start_idx, dtype=_dtype(cfg.head_dtype)
            )
            preds["depth"] = depth
            preds["depth_conf"] = depth_conf
        if cfg.enable_point:
            pts3d, pts3d_conf = _apply_dpt_chunked(
                cfg.point_head, "point_head", tokens_list, (H, W),
                patch_start_idx, dtype=_dtype(cfg.head_dtype)
            )
            preds["world_points"] = pts3d
            preds["world_points_conf"] = pts3d_conf
        if cfg.enable_track and query_points is not None:
            coord_preds, vis, conf = TrackHead(cfg.track, name="track_head")(
                tokens_list, (H, W), patch_start_idx, query_points
            )
            preds["track"] = coord_preds[-1]
            preds["vis"] = vis
            if conf is not None:
                preds["conf"] = conf

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
        global_attn_fn: Optional[Callable] = None,
        remat: bool = False,
        shard_fn: Optional[Callable] = None,
        global_merge_r: int = 0,
        fused_ln: bool = False,
    ) -> Dict[str, jax.Array]:
        cfg = self.cfg
        B, S, H, W, _ = images.shape
        tokens_list, patch_start_idx = Aggregator(
            cfg.aggregator.with_vit(), dtype=_dtype(cfg.trunk_dtype),
            attn_fn=attn_fn, global_attn_fn=global_attn_fn, remat=remat,
            shard_fn=shard_fn, global_merge_r=global_merge_r,
            fused_ln=fused_ln,
            name="aggregator",
        )(images)
        # tokens stay in trunk dtype (bf16) in HBM — 24 x (B,S,P,2048) maps;
        # every head upcasts to fp32 at its entry (`vggt.py:189` equivalent)

        preds: Dict[str, jax.Array] = {}
        if cfg.enable_camera:
            pose_list = CameraHead(cfg.camera, name="camera_head")(tokens_list[-1])
            preds["pose_enc"] = pose_list[-1]
            preds["pose_enc_list"] = pose_list

        if cfg.enable_depth:
            depth, depth_conf = _apply_dpt_chunked(
                cfg.depth_head, "depth_head", tokens_list, (H, W),
                patch_start_idx, dtype=_dtype(cfg.head_dtype)
            )
            preds["depth"] = depth
            preds["depth_conf"] = depth_conf

        point_pyramid = None          # flat (B*S, h, w, c) levels
        point_pyramid_chunked = None  # still-chunked (nc, B*cs, h, w, c)
        plan_pt = None
        if cfg.enable_point:
            plan_pt = _view_chunking(S, cfg.point_head.frames_chunk_size)
            point_head = DPTHead(
                cfg.point_head, images_hw=(H, W),
                patch_start_idx=patch_start_idx,
                dtype=_dtype(cfg.head_dtype), name="point_head",
            )
            if plan_pt is None:
                pts3d, pts3d_conf, point_pyramid = point_head(tokens_list)
            else:
                nc, cs = plan_pt
                pts3d, pts3d_conf, point_pyramid_chunked = _scan_chunks(
                    point_head,
                    ([_chunk_views(t, B, nc, cs) for t in tokens_list],), nc,
                )
                pts3d = _unchunk_views(pts3d, B, nc, cs, flat=False)
                pts3d_conf = _unchunk_views(pts3d_conf, B, nc, cs, flat=False)
                # the full-resolution fusion pyramid stays in its scan
                # layout: when the part head scans with the same plan (the
                # default — both bounds are cfg.frames_chunk_size) it
                # consumes it directly, skipping an HBM round trip of the
                # three largest intermediates
            preds["world_points"] = pts3d
            preds["world_points_conf"] = pts3d_conf

        if cfg.enable_part:
            assert cfg.enable_point, "part head needs the point pyramid"
            plan = _view_chunking(S, cfg.part.frames_chunk_size)
            cs = plan[1] if plan else S
            if point_pyramid is None and plan != plan_pt:
                # differing chunk plans: materialize the flat layout once
                point_pyramid = [
                    _unchunk_views(p, B, *plan_pt, flat=True)
                    for p in point_pyramid_chunked
                ]
            projector_head = SamProjector(
                dim_in=cfg.part.dim_in,
                patch_size=cfg.part.patch_size,
                intermediate_layer_idx=cfg.part.intermediate_layer_idx,
                out_channels=cfg.part.out_channels,
                images_hw=(H, W),
                patch_start_idx=patch_start_idx,
                dtype=_dtype(cfg.head_dtype),
                name="part_adaptor",
            )
            part_head = PartHead(
                cfg.part, images_hw=(H, W), batch_dims=(B, cs),
                dtype=_dtype(cfg.head_dtype), name="part_head"
            )
            if plan is None:
                projector = projector_head(tokens_list)
                part_feat = part_head(projector, point_pyramid)
            else:
                nc, cs = plan
                ctoks = [_chunk_views(t, B, nc, cs) for t in tokens_list]
                cpyr = (
                    list(point_pyramid_chunked)
                    if plan == plan_pt and point_pyramid_chunked is not None
                    else [_chunk_views(t, B, nc, cs) for t in point_pyramid]
                )
                projector = _scan_chunks(projector_head, (ctoks,), nc)
                part_feat = _scan_chunks(part_head, (projector, cpyr), nc)
                part_feat = _unchunk_views(part_feat, B, nc, cs, flat=False)
            preds["part_feat"] = part_feat
        if cfg.enable_track and query_points is not None:
            coord_preds, vis, conf = TrackHead(cfg.track, name="track_head")(
                tokens_list, (H, W), patch_start_idx, query_points
            )
            preds["track"] = coord_preds[-1]
            preds["vis"] = vis
            if conf is not None:
                preds["conf"] = conf

        return preds


def build_model(cfg: ModelConfig) -> nn.Module:
    """Factory mirroring the reference's two model classes."""
    return IGGT(cfg) if cfg.name == "iggt" else VGGT(cfg)
