"""Prediction heads: camera, DPT (depth/point/track-feature), part, track."""
