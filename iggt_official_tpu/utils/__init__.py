"""Host-side utilities: image IO, checkpoint conversion, GLB export."""
