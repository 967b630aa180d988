"""CoTracker-style iterative point tracker.

Behavioural parity: `iggt/heads/track_head.py` + `iggt/heads/track_modules/`
(BaseTrackerPredictor, EfficientUpdateFormer, CorrBlock, samplers).
"""

from iggt_official_tpu.heads.track.predictor import BaseTrackerPredictor
from iggt_official_tpu.heads.track.track_head import TrackHead

__all__ = ["BaseTrackerPredictor", "TrackHead"]
