"""SAM2 image/coordinate transforms + mask post-processing.

Behavioural parity: `sam2/utils/transforms.py:9-120` (`SAM2Transforms`):
square resize to the model resolution with ImageNet normalization,
coordinate/box rescaling, and mask post-processing (hole filling and
sprinkle removal through connected components — here the TPU CCL op — then
resize back to the original extent).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

import functools

from iggt_official_tpu.ops.connected_components import connected_components
from iggt_official_tpu.ops.interpolate import bilinear_resize_align_corners


@functools.partial(jax.jit, static_argnames=("mask_threshold", "max_hole",
                                             "max_sprinkle", "orig_hw"))
def _postprocess_jit(masks, mask_threshold, max_hole, max_sprinkle, orig_hw):
    flat = masks
    if max_hole > 0:
        labels, areas = connected_components(flat <= mask_threshold)
        is_hole = (labels > 0) & (areas <= max_hole)
        flat = jnp.where(is_hole, mask_threshold + 10.0, flat)
    if max_sprinkle > 0:
        labels, areas = connected_components(flat > mask_threshold)
        is_spark = (labels > 0) & (areas <= max_sprinkle)
        flat = jnp.where(is_spark, mask_threshold - 10.0, flat)
    return bilinear_resize_align_corners(flat[..., None], orig_hw)[..., 0]

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


class SAM2Transforms:
    def __init__(
        self,
        resolution: int,
        mask_threshold: float,
        max_hole_area: float = 0.0,
        max_sprinkle_area: float = 0.0,
    ):
        self.resolution = resolution
        self.mask_threshold = mask_threshold
        self.max_hole_area = max_hole_area
        self.max_sprinkle_area = max_sprinkle_area

    def __call__(self, image: np.ndarray) -> np.ndarray:
        """HWC uint8/float image -> (res, res, 3) normalized float32."""
        from PIL import Image

        if image.dtype != np.uint8:
            image = (np.clip(image, 0, 1) * 255).astype(np.uint8)
        img = Image.fromarray(image).resize(
            (self.resolution, self.resolution), Image.Resampling.BILINEAR
        )
        arr = np.asarray(img, np.float32) / 255.0
        return (arr - _MEAN) / _STD

    def forward_batch(self, images: Sequence[np.ndarray]) -> np.ndarray:
        return np.stack([self(im) for im in images])

    def transform_coords(
        self, coords: np.ndarray, normalize: bool = False,
        orig_hw: Optional[Tuple[int, int]] = None,
    ) -> np.ndarray:
        coords = np.asarray(coords, np.float32).copy()
        if normalize:
            h, w = orig_hw
            coords[..., 0] = coords[..., 0] / w
            coords[..., 1] = coords[..., 1] / h
        return coords * self.resolution

    def transform_boxes(
        self, boxes: np.ndarray, normalize: bool = False,
        orig_hw: Optional[Tuple[int, int]] = None,
    ) -> np.ndarray:
        return self.transform_coords(
            np.asarray(boxes).reshape(-1, 2, 2), normalize, orig_hw
        )

    def postprocess_masks(
        self, masks: jax.Array, orig_hw: Tuple[int, int]
    ) -> np.ndarray:
        """masks (B, M, H, W) logits -> (B, M, oh, ow) after CCL cleanup."""
        masks = jnp.asarray(masks, jnp.float32)
        B, M = masks.shape[:2]
        flat = masks.reshape((B * M,) + masks.shape[2:])
        out = _postprocess_jit(
            flat, self.mask_threshold, self.max_hole_area,
            self.max_sprinkle_area, tuple(orig_hw),
        )
        return np.asarray(out.reshape((B, M) + tuple(orig_hw)))


class ResizeLongestSide:
    """SAM-v1 style aspect-preserving resize (`utils/sam_utils/transforms.py:16-99`).

    Resizes so the longest side equals ``target_length`` and rescales
    point/box prompts to match; numpy-only (the torch variants in the
    reference duplicate the same arithmetic).
    """

    def __init__(self, target_length: int):
        self.target_length = int(target_length)

    @staticmethod
    def get_preprocess_shape(
        oldh: int, oldw: int, long_side_length: int
    ) -> Tuple[int, int]:
        scale = long_side_length / max(oldh, oldw)
        newh, neww = oldh * scale, oldw * scale
        return int(newh + 0.5), int(neww + 0.5)

    def apply_image(self, image: np.ndarray) -> np.ndarray:
        from PIL import Image

        h, w = image.shape[:2]
        nh, nw = self.get_preprocess_shape(h, w, self.target_length)
        return np.asarray(
            Image.fromarray(image).resize((nw, nh), Image.BILINEAR)
        )

    def apply_coords(
        self, coords: np.ndarray, original_size: Tuple[int, int]
    ) -> np.ndarray:
        oldh, oldw = original_size
        nh, nw = self.get_preprocess_shape(oldh, oldw, self.target_length)
        coords = np.asarray(coords, np.float64).copy()
        coords[..., 0] *= nw / oldw
        coords[..., 1] *= nh / oldh
        return coords

    def apply_boxes(
        self, boxes: np.ndarray, original_size: Tuple[int, int]
    ) -> np.ndarray:
        boxes = self.apply_coords(
            np.asarray(boxes).reshape(-1, 2, 2), original_size
        )
        return boxes.reshape(-1, 4)
