"""Unprojection and SE3 utilities, vectorized over frames.

Behavioural parity: `iggt/utils/geometry.py:151-346`.  Unlike the reference
(which loops per frame in numpy, `geometry.py:151-180`), every function here
is a single fused jnp computation over (S, H, W) so the whole post-process
stays on device.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def closed_form_inverse_se3(se3: jax.Array) -> jax.Array:
    """Invert (..., 4, 4) or (..., 3, 4) SE3 matrices: [R|t]^-1 = [R^T|-R^T t].

    Matches `geometry.py:271-320`; always returns (..., 4, 4).
    """
    if se3.shape[-2:] not in ((4, 4), (3, 4)):
        raise ValueError(f"se3 must end in (4,4) or (3,4), got {se3.shape}.")
    R = se3[..., :3, :3]
    T = se3[..., :3, 3:]

    Rt = jnp.swapaxes(R, -1, -2)
    top_right = -jnp.matmul(Rt, T)
    top = jnp.concatenate([Rt, top_right], axis=-1)  # (..., 3, 4)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=se3.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def depth_to_cam_coords_points(depth_map: jax.Array, intrinsic: jax.Array) -> jax.Array:
    """Depth (..., H, W) + intrinsics (..., 3, 3) -> camera coords (..., H, W, 3).

    Matches `geometry.py:238-268` (zero-skew pinhole, pixel-corner convention).
    """
    H, W = depth_map.shape[-2:]
    fu = intrinsic[..., 0, 0][..., None, None]
    fv = intrinsic[..., 1, 1][..., None, None]
    cu = intrinsic[..., 0, 2][..., None, None]
    cv = intrinsic[..., 1, 2][..., None, None]

    v = jax.lax.broadcasted_iota(depth_map.dtype, (H, W), 0)
    u = jax.lax.broadcasted_iota(depth_map.dtype, (H, W), 1)

    x_cam = (u - cu) * depth_map / fu
    y_cam = (v - cv) * depth_map / fv
    return jnp.stack([x_cam, y_cam, depth_map], axis=-1)


def depth_to_world_coords_points(
    depth_map: jax.Array,
    extrinsic: jax.Array,
    intrinsic: jax.Array,
    z_far: float = 100.0,
    eps: float = 1e-8,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Depth (..., H, W) -> (world points, cam points, valid mask).

    `extrinsic` (..., 3, 4) is camera-from-world (OpenCV); it is inverted in
    closed form before transforming, matching `geometry.py:183-235`.
    """
    point_mask = depth_map > eps
    if z_far > 0:
        point_mask = point_mask & (depth_map < z_far)

    cam_coords = depth_to_cam_coords_points(depth_map, intrinsic)

    cam_to_world = closed_form_inverse_se3(extrinsic)
    R = cam_to_world[..., :3, :3]
    t = cam_to_world[..., :3, 3]

    world_coords = (
        jnp.einsum("...ij,...hwj->...hwi", R, cam_coords) + t[..., None, None, :]
    )
    return world_coords, cam_coords, point_mask


def unproject_depth_map_to_point_map(
    depth_map: jax.Array, extrinsics_cam: jax.Array, intrinsics_cam: jax.Array
) -> jax.Array:
    """Batch unprojection (S, H, W[, 1]) -> (S, H, W, 3).  `geometry.py:151-180`."""
    if depth_map.ndim == 4 and depth_map.shape[-1] == 1:
        depth_map = depth_map[..., 0]
    world, _, _ = depth_to_world_coords_points(depth_map, extrinsics_cam, intrinsics_cam)
    return world


def project_world_points_to_pixels(
    world_points: jax.Array, extrinsic: jax.Array, intrinsic: jax.Array,
    eps: float = 1e-8,
) -> Tuple[jax.Array, jax.Array]:
    """Inverse of unprojection (used by tests + covisibility ranking).

    world_points (..., N, 3) + cam-from-world extrinsic (..., 3, 4) ->
    ((..., N, 2) pixel uv, (..., N) depth).
    """
    R = extrinsic[..., :3, :3]
    t = extrinsic[..., :3, 3]
    cam = jnp.einsum("...ij,...nj->...ni", R, world_points) + t[..., None, :]
    z = cam[..., 2]
    uvw = jnp.einsum("...ij,...nj->...ni", intrinsic, cam)
    uv = uvw[..., :2] / jnp.maximum(uvw[..., 2:3], eps)
    return uv, z
