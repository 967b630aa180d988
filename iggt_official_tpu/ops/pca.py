"""Joint multi-view PCA colormap, fully on-device.

Behavioural parity: `iggt/utils/misc.py:272-332` (`apply_pca_colormap`):
flatten all views, project onto the top-3 principal components, then
2%-98% percentile contrast-stretch per channel.

TPU design: instead of `torch.pca_lowrank` on the (N*H*W, C) matrix, the
principal directions come from an eigendecomposition of the C x C Gram
matrix (C=8 for part features) — one matmul reduction + an 8x8 eigh,
orders of magnitude cheaper and numerically equivalent up to column sign
(sign does not matter for a colormap; tests fix sign when comparing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pca_components(flat: jax.Array, k: int = 3) -> jax.Array:
    """Top-k principal directions of (M, C) via the C x C covariance.

    torch.pca_lowrank centers its input by default; the reference then
    projects the *uncentered* features onto these directions
    (`misc.py:295-301`) — we match both choices."""
    x = flat.astype(jnp.float32)
    x = x - jnp.mean(x, axis=0, keepdims=True)
    gram = x.T @ x  # (C, C)
    eigval, eigvec = jnp.linalg.eigh(gram)  # ascending
    return eigvec[:, ::-1][:, :k]  # (C, k), descending variance


def apply_pca_colormap(
    image: jax.Array, low_p: float = 0.02, high_p: float = 0.98
) -> jax.Array:
    """(N, H, W, C) features -> (N, H, W, 3) in [0, 1]."""
    n, h, w, c = image.shape
    flat = image.reshape(-1, c).astype(jnp.float32)
    v = pca_components(flat, 3)
    colored = flat @ v  # (M, 3)

    v_low = jnp.quantile(colored, low_p, axis=0)
    v_high = jnp.quantile(colored, high_p, axis=0)
    span = v_high - v_low
    normed = jnp.where(
        span > 0, (colored - v_low) / jnp.maximum(span, 1e-12), 0.5
    )
    return jnp.clip(normed, 0.0, 1.0).reshape(n, h, w, 3)
