"""SAM2 subsystem, TPU-native.

Re-design of the vendored Meta SAM2 stack (`/root/reference/sam2/`,
~7.5k LoC): Hiera hierarchical windowed trunk + FPN neck, SAM prompt
encoder / mask decoder / two-way transformer, streaming memory attention +
encoder, image/video predictors and the automatic mask generator — with the
CUDA connected-components kernel replaced by
`iggt_official_tpu.ops.connected_components`.

Role inside IGGT (SURVEY §2.5): offline teacher producing masklet pseudo-GT
for training, SAM2-Hiera-L mask grounding for the benchmark configs, and
`PositionEmbeddingSine` shared with the SamProjector.
"""

from iggt_official_tpu.sam2.config import (
    SAM2_PRESETS,
    SAM2Config,
    sam2_hiera_b_plus,
    sam2_hiera_l,
    sam2_hiera_s,
    sam2_hiera_t,
)
from iggt_official_tpu.sam2.common import PositionEmbeddingSine

__all__ = [
    "PositionEmbeddingSine",
    "SAM2_PRESETS",
    "SAM2Config",
    "sam2_hiera_b_plus",
    "sam2_hiera_l",
    "sam2_hiera_s",
    "sam2_hiera_t",
]
