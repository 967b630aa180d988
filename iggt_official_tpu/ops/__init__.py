"""TPU kernels and compute ops.

- `flash_attention`: streaming Pallas online-softmax attention + dispatch.
- `connected_components`: batched CCL (the CUDA kernel replacement).
- `knn`: Morton-order k-NN feature smoothing.
- `cluster`: density clustering (HDBSCAN-role) with on-device compression.
- `pca`: joint multi-view PCA colormap.
- `conv` / `interpolate`: torch-parity NHWC convs and resizes.
"""

from iggt_official_tpu.ops.flash_attention import (
    attention,
    attention_fused,
    flash_attention,
    flash_attention_fused,
    sdpa_chunked,
)

__all__ = [
    "attention",
    "attention_fused",
    "flash_attention",
    "flash_attention_fused",
    "sdpa_chunked",
]
