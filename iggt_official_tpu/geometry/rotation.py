"""Quaternion <-> rotation matrix, XYZW (scalar-last) convention.

Behavioural parity: `iggt/utils/rotation.py:14-138` (itself derived from
PyTorch3D).  All functions broadcast over arbitrary leading dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_to_mat(quaternions: jax.Array) -> jax.Array:
    """Convert XYZW quaternions (..., 4) to rotation matrices (..., 3, 3).

    Matches `rotation.py:14-44`: the quaternion is *not* assumed normalized;
    a 2/|q|^2 factor normalizes implicitly.
    """
    i, j, k, r = jnp.moveaxis(quaternions, -1, 0)
    two_s = 2.0 / jnp.sum(quaternions * quaternions, axis=-1)

    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(quaternions.shape[:-1] + (3, 3))


def _sqrt_positive_part(x: jax.Array) -> jax.Array:
    """sqrt(max(0, x)) with zero subgradient at 0 (`rotation.py:113-122`)."""
    positive = x > 0
    safe = jnp.where(positive, x, 1.0)
    return jnp.where(positive, jnp.sqrt(safe), jnp.zeros_like(x))


def standardize_quaternion(quaternions: jax.Array) -> jax.Array:
    """Flip sign so the real (last) part is non-negative (`rotation.py:125-138`)."""
    return jnp.where(quaternions[..., 3:4] < 0, -quaternions, quaternions)


def mat_to_quat(matrix: jax.Array) -> jax.Array:
    """Convert rotation matrices (..., 3, 3) to standardized XYZW quaternions.

    Matches `rotation.py:47-110`: computes the quaternion scaled by each of
    r,i,j,k and picks the best-conditioned candidate (largest |component|).
    """
    if matrix.shape[-1] != 3 or matrix.shape[-2] != 3:
        raise ValueError(f"Invalid rotation matrix shape {matrix.shape}.")

    batch_dim = matrix.shape[:-2]
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = jnp.moveaxis(
        matrix.reshape(batch_dim + (9,)), -1, 0
    )

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )

    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )

    # Floor at 0.1: if q_abs is tiny the candidate won't be picked anyway.
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], 0.1))

    best = jnp.argmax(q_abs, axis=-1)
    out = jnp.take_along_axis(
        quat_candidates, best[..., None, None].astype(jnp.int32), axis=-2
    )[..., 0, :]

    # rijk -> ijkr (scalar-last)
    out = out[..., jnp.array([1, 2, 3, 0])]
    return standardize_quaternion(out)
