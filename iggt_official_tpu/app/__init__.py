"""Application surface: the demo-equivalent scene-processing CLI."""

from iggt_official_tpu.app.demo import IGGTProcessor

__all__ = ["IGGTProcessor"]
