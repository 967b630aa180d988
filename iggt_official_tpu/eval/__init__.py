"""Evaluation layer: depth / pose / instance metrics and the scene evaluator.

Behavioural parity: `iggt/metrics.py` (SceneEvaluator + DepthEvaluator +
PoseEvaluator + Hungarian instance matching).  Host-side numpy, as in the
reference — these run on per-scene tensors after inference.
"""

from iggt_official_tpu.eval.metrics import (
    DepthEvaluator,
    PoseEvaluator,
    SceneEvaluator,
    evaluate_matched_instances,
    m_rel_ae,
    thresh_inliers,
    valid_mean,
)

__all__ = [
    "DepthEvaluator",
    "PoseEvaluator",
    "SceneEvaluator",
    "evaluate_matched_instances",
    "m_rel_ae",
    "thresh_inliers",
    "valid_mean",
]
