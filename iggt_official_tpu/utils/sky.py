"""Sky segmentation for GLB export filtering.

Behavioural parity: `visual_util.py:112-159` — when ``mask_sky`` is on, the
GLB exporter multiplies the per-pixel world-point confidence by a binary
keep-mask (non-sky = 1) per view, loading cached masks from
``{target_dir}/sky_masks/{image}`` when present and computing + caching
them otherwise.

The reference runs an ONNX skyseg model (downloaded from HF,
`visual_util.py:127-132`); this build has no onnxruntime, so the default
segmenter is a first-party heuristic: sky pixels are bright, low-texture,
blue-tinted regions connected to the top image border (connectivity via
the framework's own connected-components kernel).  A callable with the
same (H, W, 3) uint8 -> (H, W) keep-mask contract can be passed in to use
a learned model instead.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import numpy as np
import PIL.Image


def segment_sky_heuristic(image: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 RGB -> (H, W) uint8 keep-mask (255 = keep, 0 = sky).

    Sky = bright, smooth regions that are at least as blue as they are red
    (daylight sky is never warmer than neutral, indoor lighting almost
    always is), connected to the top quarter of the image.  Thresholds
    were set against the hand-annotated goldens in
    ``benchmarks/measure_sky.py`` (mean sky recall / indoor false-positive
    rate are recorded in ``benchmarks/sky_deltas.json``).

    Known failure modes vs the reference's trained skyseg model
    (`visual_util.py:112-159`, unavailable here): warm sunset/sunrise
    skies are missed (cool-tint requirement), night skies are missed
    (brightness floor), and cool-tinted bright walls seen through the top
    border can still false-positive.  `load_or_compute_sky_masks` accepts
    any callable with the same contract for a learned replacement.
    """
    img = np.asarray(image, np.float32) / 255.0
    h, w = img.shape[:2]
    r, g, b = img[..., 0], img[..., 1], img[..., 2]

    brightness = img.mean(-1)
    gy = np.abs(np.diff(brightness, axis=0, prepend=brightness[:1]))
    gx = np.abs(np.diff(brightness, axis=1, prepend=brightness[:, :1]))
    smooth = (gx + gy) < 0.03

    cool = b - r  # daylight sky: >= ~0 (blue/grey/blown-white), walls: < 0
    candidate = (brightness > 0.60) & (cool > 0.015) & smooth
    # blown-out / white-overcast sky: all channels near saturation and
    # not warm-tinted
    candidate |= (
        (brightness > 0.85)
        & (np.minimum(np.minimum(r, g), b) > 0.80)
        & (cool > -0.005)
        & smooth
    )

    # close 1-2 px gaps (wires, antennas) so sky stays one component and
    # the thin-structure shadows don't punch holes in the mask
    closed = candidate
    for _ in range(2):  # dilate
        e = closed.copy()
        e[1:] |= closed[:-1]
        e[:-1] |= closed[1:]
        e[:, 1:] |= closed[:, :-1]
        e[:, :-1] |= closed[:, 1:]
        closed = e
    for _ in range(2):  # erode
        e = closed.copy()
        e[1:] &= closed[:-1]
        e[:-1] &= closed[1:]
        e[:, 1:] &= closed[:, :-1]
        e[:, :-1] &= closed[:, 1:]
        closed = e
    candidate = closed

    from iggt_official_tpu.ops.connected_components import (
        connected_components_host,
    )

    labels, _ = connected_components_host(candidate[None])
    labels = labels[0]
    top_labels = np.unique(labels[: max(1, h // 4)])
    top_labels = top_labels[top_labels > 0]
    sky = np.isin(labels, top_labels)
    return np.where(sky, 0, 255).astype(np.uint8)


def load_or_compute_sky_masks(
    target_dir: str,
    out_hw: Sequence[int],
    segmenter: Optional[Callable[[np.ndarray], np.ndarray]] = None,
) -> np.ndarray:
    """Per-view binary keep-masks (S, H, W) float32 for the scene at
    ``target_dir`` (reads `images/`, caches to `sky_masks/`,
    `visual_util.py:133-158` semantics: cached mask > 0.1 -> keep)."""
    H, W = out_hw
    segmenter = segmenter or segment_sky_heuristic
    image_dir = os.path.join(target_dir, "images")
    mask_dir = os.path.join(target_dir, "sky_masks")
    names = sorted(os.listdir(image_dir))
    masks = []
    for name in names:
        mask_path = os.path.join(mask_dir, name)
        if os.path.exists(mask_path):
            mask = np.asarray(PIL.Image.open(mask_path).convert("L"))
        else:
            img = np.asarray(
                PIL.Image.open(os.path.join(image_dir, name)).convert("RGB")
            )
            mask = segmenter(img)
            os.makedirs(mask_dir, exist_ok=True)
            PIL.Image.fromarray(mask).save(mask_path)
        if mask.shape != (H, W):
            mask = np.asarray(
                PIL.Image.fromarray(mask).resize(
                    (W, H), PIL.Image.Resampling.BILINEAR
                )
            )
        masks.append(mask)
    return (np.stack(masks).astype(np.float32) / 255.0 > 0.1).astype(
        np.float32
    )
