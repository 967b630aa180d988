"""Pure-jnp geometry library: quaternions, pose codec, unprojection.

Everything here is shape-polymorphic over leading batch dims, jit-safe and
differentiable.  Behavioural parity targets are cited per function against
the reference implementation.
"""

from iggt_official_tpu.geometry.rotation import (
    quat_to_mat,
    mat_to_quat,
    standardize_quaternion,
)
from iggt_official_tpu.geometry.pose_enc import (
    extri_intri_to_pose_encoding,
    pose_encoding_to_extri_intri,
)
from iggt_official_tpu.geometry.projection import (
    closed_form_inverse_se3,
    depth_to_cam_coords_points,
    depth_to_world_coords_points,
    unproject_depth_map_to_point_map,
    project_world_points_to_pixels,
)

__all__ = [
    "quat_to_mat",
    "mat_to_quat",
    "standardize_quaternion",
    "extri_intri_to_pose_encoding",
    "pose_encoding_to_extri_intri",
    "closed_form_inverse_se3",
    "depth_to_cam_coords_points",
    "depth_to_world_coords_points",
    "unproject_depth_map_to_point_map",
    "project_world_points_to_pixels",
]
