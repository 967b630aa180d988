"""SAM2 image predictor.

Behavioural parity: `sam2/sam2_image_predictor.py:14-460`
(`SAM2ImagePredictor`): `set_image` computes and caches the backbone
embeddings (+ projected high-res features), `predict` maps point/box/mask
prompts through the prompt encoder + mask decoder and post-processes masks
back to the original image frame.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from iggt_official_tpu.sam2.base import SAM2Base
from iggt_official_tpu.sam2.config import SAM2Config
from iggt_official_tpu.sam2.transforms import SAM2Transforms


class SAM2ImagePredictor:
    def __init__(
        self,
        model: SAM2Base,
        variables,
        mask_threshold: float = 0.0,
        max_hole_area: float = 0.0,
        max_sprinkle_area: float = 0.0,
    ):
        self.model = model
        self.variables = variables
        self.cfg: SAM2Config = model.cfg
        self.mask_threshold = mask_threshold
        self._transforms = SAM2Transforms(
            self.cfg.image_size, mask_threshold, max_hole_area,
            max_sprinkle_area,
        )
        self._features = None
        self._orig_hw: Optional[Tuple[int, int]] = None
        self._forward_image = jax.jit(
            lambda v, x: model.apply(v, x, method=SAM2Base.forward_image)
        )
        self._sam_heads = jax.jit(
            lambda v, feats, pts, mask_in, hi, multi: model.apply(
                v, feats, pts, mask_in, hi, multi,
                method=SAM2Base.forward_sam_heads,
            ),
            static_argnames=("multi",),
        )

    # ------------------------------------------------------------------
    def set_image(self, image: np.ndarray) -> None:
        """image: HWC RGB uint8 (or float [0,1])."""
        self._orig_hw = image.shape[:2]
        batch = self._transforms.forward_batch([image])
        out = self._forward_image(self.variables, jnp.asarray(batch))
        self._features = out

    def predict(
        self,
        point_coords: Optional[np.ndarray] = None,
        point_labels: Optional[np.ndarray] = None,
        box: Optional[np.ndarray] = None,
        mask_input: Optional[np.ndarray] = None,
        multimask_output: bool = True,
        return_logits: bool = False,
    ):
        """Returns (masks (M, H, W), iou_predictions (M,), low_res (M, h, w))."""
        assert self._features is not None, "call set_image first"
        coords, labels = self._prep_prompts(point_coords, point_labels, box)

        mask_in = None
        if mask_input is not None:
            m = np.asarray(mask_input, np.float32)
            if m.ndim == 3:
                m = m[0]
            mask_in = jnp.asarray(m[None, :, :, None])

        feats = self._features["backbone_fpn"][-1]
        hi = (
            list(self._features["backbone_fpn"][:2])
            if self.cfg.use_high_res_features_in_sam
            else None
        )
        point_inputs = None
        if coords is not None:
            point_inputs = {
                "point_coords": jnp.asarray(coords),
                "point_labels": jnp.asarray(labels),
            }
        res = self._sam_heads(
            self.variables, feats, point_inputs, mask_in, hi, multimask_output
        )
        low_multi, _hi_multi, ious = res[0], res[1], res[2]
        masks = self._transforms.postprocess_masks(low_multi, self._orig_hw)
        if not return_logits:
            masks = masks > self.mask_threshold
        return masks[0], np.asarray(ious)[0], np.asarray(low_multi)[0]

    def predict_point_batch(self, point_coords: np.ndarray):
        """Batched single-point prompts (for the mask generator's grid
        sweep): (N, 2) absolute pixel coords -> multimask logits
        (N, 3, h, w) + ious (N, 3)."""
        assert self._features is not None, "call set_image first"
        coords = self._transforms.transform_coords(
            np.asarray(point_coords, np.float32), normalize=True,
            orig_hw=self._orig_hw,
        )[:, None, :]  # (N, 1, 2)
        labels = np.ones((coords.shape[0], 1), np.int32)

        N = coords.shape[0]
        feats = jnp.broadcast_to(
            self._features["backbone_fpn"][-1],
            (N,) + self._features["backbone_fpn"][-1].shape[1:],
        )
        hi = None
        if self.cfg.use_high_res_features_in_sam:
            hi = [
                jnp.broadcast_to(f, (N,) + f.shape[1:])
                for f in self._features["backbone_fpn"][:2]
            ]
        res = self._sam_heads(
            self.variables, feats,
            {"point_coords": jnp.asarray(coords),
             "point_labels": jnp.asarray(labels)},
            None, hi, True,
        )
        return np.asarray(res[0]), np.asarray(res[2])

    # ------------------------------------------------------------------
    def _prep_prompts(self, point_coords, point_labels, box):
        coords = labels = None
        if point_coords is not None:
            assert point_labels is not None
            coords = self._transforms.transform_coords(
                np.asarray(point_coords, np.float32), normalize=True,
                orig_hw=self._orig_hw,
            )[None]
            labels = np.asarray(point_labels, np.int32)[None]
        if box is not None:
            b = self._transforms.transform_boxes(
                np.asarray(box, np.float32), normalize=True,
                orig_hw=self._orig_hw,
            )  # (1, 2, 2)
            box_coords = b.reshape(1, 2, 2)
            box_labels = np.asarray([[2, 3]], np.int32)
            if coords is not None:
                coords = np.concatenate([box_coords, coords], axis=1)
                labels = np.concatenate([box_labels, labels], axis=1)
            else:
                coords, labels = box_coords, box_labels
        return coords, labels
