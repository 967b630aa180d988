"""Training stack: losses, optimizer groups, the sharded train step.

The reference ships training *utilities* but no training loop
(`README.md:37-42` TODO; LR/param-group/checkpoint helpers at
`iggt/datasets/utils/misc.py:249-476`).  This package supplies the full
TPU-native loop: multi-task losses, AdamW with ViT layer decay, cosine
schedule with warmup, and a pjit train step over a ("data", "seq") mesh.
"""

from iggt_official_tpu.train.losses import (
    camera_loss,
    conf_regression_loss,
    part_embedding_loss,
    total_loss,
)
from iggt_official_tpu.train.step import TrainState, make_optimizer, make_train_step

__all__ = [
    "TrainState",
    "camera_loss",
    "conf_regression_loss",
    "make_optimizer",
    "make_train_step",
    "part_embedding_loss",
    "total_loss",
]
