"""Host data layer: dataset algebra, samplers, loaders, collation.

Behavioural parity: `iggt/datasets/` — the EasyDataset algebra
(`base/easy_dataset.py`), anchor-frame covisibility sampling
(`base/batched_sampler.py`), the multi-view dataset contract
(`base/base_stereo_view_dataset.py` + the per-dataset `_get_views`
pattern, e.g. `scannet.py:188-246`), crop/rescale with intrinsics updates
(`utils/cropping.py`) and covisibility ranking (`utils/image_ranking.py`).

TPU-first deviations:
- images are HWC float32 in [0, 1] (channels-last, the model's native
  layout) instead of torch CHW tensors;
- `get_data_loader` returns a thread-prefetching iterator yielding
  fixed-shape numpy batches ready for `jax.device_put` — no torch
  DataLoader / DDP rank plumbing (rank slicing lives in the samplers).
"""

from iggt_official_tpu.data.base import BaseViewDataset
from iggt_official_tpu.data.easy_dataset import EasyDataset
from iggt_official_tpu.data.loader import collate_views, get_data_loader
from iggt_official_tpu.data.ranking import compute_ranking
from iggt_official_tpu.data.samplers import (
    AnchorFrameSampler,
    BatchedRandomSampler,
    TestSampler,
)
from iggt_official_tpu.data.scene_dataset import SceneDirDataset

__all__ = [
    "AnchorFrameSampler",
    "BaseViewDataset",
    "BatchedRandomSampler",
    "EasyDataset",
    "SceneDirDataset",
    "TestSampler",
    "collate_views",
    "compute_ranking",
    "get_data_loader",
]
