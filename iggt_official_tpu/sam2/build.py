"""SAM2 model factories (replacing `sam2/build_sam.py`'s hydra path)."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from iggt_official_tpu.sam2.base import SAM2Base
from iggt_official_tpu.sam2.config import SAM2Config
from iggt_official_tpu.sam2.image_predictor import SAM2ImagePredictor
from iggt_official_tpu.sam2.video_predictor import SAM2VideoPredictor


def build_sam2(
    cfg: Optional[SAM2Config] = None,
    checkpoint: Optional[str] = None,
    seed: int = 0,
) -> Tuple[SAM2Base, dict]:
    """Build the model + variables (orbax checkpoint optional)."""
    cfg = cfg or SAM2Config()
    model = SAM2Base(cfg)
    init_img = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(seed), init_img,
                           method=SAM2Base.init_all)
    )()
    if checkpoint is not None:
        from iggt_official_tpu.utils.checkpoint import load_checkpoint

        variables = {"params": load_checkpoint(checkpoint,
                                               target=variables["params"])}
    return model, variables


def build_sam2_image_predictor(cfg=None, checkpoint=None, **kw):
    model, variables = build_sam2(cfg, checkpoint)
    return SAM2ImagePredictor(model, variables, **kw)


def build_sam2_video_predictor(cfg=None, checkpoint=None, **kw):
    model, variables = build_sam2(cfg, checkpoint)
    return SAM2VideoPredictor(model, variables, **kw)
