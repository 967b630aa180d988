"""Model assemblies: Aggregator trunk, VGGT and IGGT."""

from iggt_official_tpu.models.aggregator import Aggregator, slice_expand_and_flatten
