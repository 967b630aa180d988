"""Multi-task training losses for VGGT/IGGT.

The reference does not release its training loop (`README.md:37-42`), so
these implement the standard VGGT-family objectives the shipped machinery
implies:

- camera: per-iteration smooth-L1 on the 9-D ``absT_quaR_FoV`` encoding with
  exponentially increasing iteration weights (the CameraHead emits one
  prediction per refinement step, `iggt/heads/camera_head.py:120-153`).
- depth / world points: confidence-weighted regression — the heads emit
  ``expp1`` confidences (>1, `iggt/heads/head_act.py:99-104`), trained with
  the usual aleatoric form  conf * |err| - alpha * log(conf)  over valid
  pixels (the data layer provides ``valid_mask`` per view,
  `iggt/datasets/base/base_stereo_view_dataset.py:106-109`).
- part embeddings: pull/push contrastive loss on L2-normalized 8-D
  embeddings against instance-id maps (the SAM2 masklet pseudo-GT the
  datasets load, `iggt/datasets/dl3dv.py:380-451`).

All losses are pure jnp with static shapes (pixel subsampling is strided,
not random-gather) so they jit/shard cleanly.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp


def smooth_l1(x: jax.Array, beta: float = 1.0) -> jax.Array:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def camera_loss(
    pose_enc_list: Sequence[jax.Array],
    gt_pose_enc: jax.Array,
    gamma: float = 0.8,
) -> jax.Array:
    """Iteration-weighted smooth-L1 over the pose encodings (B, S, 9)."""
    n = len(pose_enc_list)
    total = 0.0
    wsum = 0.0
    for i, pred in enumerate(pose_enc_list):
        w = gamma ** (n - 1 - i)
        total = total + w * jnp.mean(smooth_l1(pred - gt_pose_enc))
        wsum += w
    return total / wsum


def conf_regression_loss(
    pred: jax.Array,
    conf: jax.Array,
    gt: jax.Array,
    valid: jax.Array,
    alpha: float = 0.2,
) -> jax.Array:
    """Confidence-weighted L1:  conf*|e| - alpha*log(conf)  over valid pixels.

    pred/gt: (..., C); conf: (...) > 0; valid: (...) bool/0-1.
    """
    err = jnp.abs(pred - gt).mean(axis=-1)
    per_pixel = conf * err - alpha * jnp.log(jnp.maximum(conf, 1e-6))
    valid = valid.astype(per_pixel.dtype)
    return jnp.sum(per_pixel * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def part_embedding_loss(
    feat: jax.Array,
    instance_ids: jax.Array,
    stride: int = 4,
    margin: float = 0.5,
) -> jax.Array:
    """Pairwise pull/push loss on normalized embeddings.

    feat: (B, S, H, W, C); instance_ids: (B, S, H, W) int (-1 = ignore).
    Pixels are strided-subsampled (static shapes); same-id pairs are pulled
    to cosine similarity 1, different-id pairs pushed below ``margin``.
    """
    f = feat[:, :, ::stride, ::stride]
    ids = instance_ids[:, :, ::stride, ::stride]
    B = f.shape[0]
    f = f.reshape(B, -1, f.shape[-1])
    f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-6)
    ids = ids.reshape(B, -1)

    sim = jnp.einsum("bnc,bmc->bnm", f, f)
    same = (ids[:, :, None] == ids[:, None, :]).astype(f.dtype)
    valid = (
        (ids[:, :, None] >= 0).astype(f.dtype) * (ids[:, None, :] >= 0).astype(f.dtype)
    )
    pull = (1.0 - sim) * same
    push = jnp.maximum(sim - margin, 0.0) * (1.0 - same)
    per_pair = (pull + push) * valid
    return jnp.sum(per_pair) / jnp.maximum(jnp.sum(valid), 1.0)


def total_loss(
    preds: Dict[str, jax.Array],
    batch: Dict[str, jax.Array],
    weights: Dict[str, float] | None = None,
) -> tuple[jax.Array, Dict[str, jax.Array]]:
    """Combine the task losses present in both preds and batch."""
    w = {"camera": 5.0, "depth": 1.0, "point": 1.0, "part": 1.0}
    if weights:
        w.update(weights)
    metrics: Dict[str, jax.Array] = {}
    loss = jnp.asarray(0.0, jnp.float32)

    if "pose_enc_list" in preds and "pose_enc" in batch:
        lc = camera_loss(preds["pose_enc_list"], batch["pose_enc"])
        metrics["loss/camera"] = lc
        loss = loss + w["camera"] * lc
    if "depth" in preds and "depth" in batch:
        ld = conf_regression_loss(
            preds["depth"], preds["depth_conf"], batch["depth"], batch["valid_mask"]
        )
        metrics["loss/depth"] = ld
        loss = loss + w["depth"] * ld
    if "world_points" in preds and "world_points" in batch:
        lp = conf_regression_loss(
            preds["world_points"],
            preds["world_points_conf"],
            batch["world_points"],
            batch["valid_mask"],
        )
        metrics["loss/point"] = lp
        loss = loss + w["point"] * lp
    if "part_feat" in preds and "instance_ids" in batch:
        lpart = part_embedding_loss(preds["part_feat"], batch["instance_ids"])
        metrics["loss/part"] = lpart
        loss = loss + w["part"] * lpart

    metrics["loss/total"] = loss
    return loss, metrics
