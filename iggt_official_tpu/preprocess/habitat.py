"""Habitat multiview-crop generation: projection math + equirect remapping.

Parity targets: `dataset_preprocess/habitat/habitat_renderer/projections.py`
(equirectangular/perspective/rotated projections, ray grids),
`projections_conversions.py` (jittered remapping) and
`multiview_crop_generator.py` (crop extraction + distance->depth).  The
habitat-sim environment-map renderer itself is an external dependency —
`render_environment_map` raises with guidance when habitat-sim is absent;
everything else operates on any provided equirectangular color/distance
maps.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from iggt_official_tpu.data.cropping import (
    colmap_to_opencv_intrinsics,
    opencv_to_colmap_intrinsics,
)


class EquirectangularProjection:
    """u along longitude (2pi/width), v along latitude (pi/height); +X
    right, +Y down, +Z forward, top-left pixel centre at (0.5, 0.5)."""

    def __init__(self, height: int, width: int):
        self.height, self.width = height, width
        self.u_scaling = (2 * np.pi) / width
        self.v_scaling = np.pi / height

    def unproject(self, u, v):
        longitude = self.u_scaling * u - np.pi
        minus_latitude = self.v_scaling * v - np.pi / 2
        cos_lat = np.cos(minus_latitude)
        return np.stack(
            [
                np.sin(longitude) * cos_lat,
                np.sin(minus_latitude),
                np.cos(longitude) * cos_lat,
            ],
            axis=-1,
        )

    def project(self, rays):
        rays = rays / np.linalg.norm(rays, axis=-1, keepdims=True)
        longitude = np.arctan2(rays[..., 0], rays[..., 2])
        minus_latitude = np.arcsin(np.clip(rays[..., 1], -1, 1))
        u = (longitude + np.pi) / self.u_scaling
        v = (minus_latitude + np.pi / 2) / self.v_scaling
        return u, v


class PerspectiveProjection:
    def __init__(self, K: np.ndarray, height: int, width: int):
        self.K = np.asarray(K, np.float64)
        self.Kinv = np.linalg.inv(self.K)
        self.height, self.width = height, width

    def project(self, rays):
        uvh = np.einsum("ik,...k->...i", self.K, rays)
        uv = uvh[..., :2] / uvh[..., 2, None]
        return uv[..., 0], uv[..., 1]

    def unproject(self, u, v):
        uvh = np.stack([u, v, np.ones_like(u)], axis=-1)
        return np.einsum("ik,...k->...i", self.Kinv, uvh)


class RotatedProjection:
    """Wrap a projection with a rotation into its base frame."""

    def __init__(self, base, R_to_base: Optional[np.ndarray]):
        self.base_projection = base
        self.R_to_base_projection = R_to_base

    height = property(lambda self: self.base_projection.height)
    width = property(lambda self: self.base_projection.width)

    def project(self, rays):
        if self.R_to_base_projection is not None:
            rays = np.einsum(
                "ik,...k->...i", self.R_to_base_projection, rays
            )
        return self.base_projection.project(rays)

    def unproject(self, u, v):
        rays = self.base_projection.unproject(u, v)
        if self.R_to_base_projection is not None:
            rays = np.einsum(
                "ik,...k->...i", self.R_to_base_projection.T, rays
            )
        return rays


def get_projection_rays(projection, noise_level: float = 0.0):
    """(H, W, 3) ray map through every pixel centre, optionally jittered
    to mitigate resampling aliasing."""
    grid_u, grid_v = np.meshgrid(
        0.5 + np.arange(projection.width), 0.5 + np.arange(projection.height)
    )
    if noise_level > 0:
        grid_u = grid_u + noise_level * np.random.uniform(
            -0.5, 0.5, grid_u.shape
        )
        grid_v = grid_v + noise_level * np.random.uniform(
            -0.5, 0.5, grid_v.shape
        )
    return projection.unproject(grid_u, grid_v)


def compute_camera_intrinsics(
    height: int, width: int, hfov_deg: float
) -> Tuple[float, float, float]:
    f = width / 2 / np.tan(np.radians(hfov_deg) / 2)
    return f, width / 2, height / 2


class RemapProjection:
    """Resample an input-projection image onto an output projection,
    optionally averaging several jittered resamplings (anti-aliasing)."""

    def __init__(
        self,
        input_projection,
        output_projection,
        pixel_jittering_iterations: int = 0,
        jittering_noise_level: float = 0.0,
    ):
        self.output_rays = get_projection_rays(output_projection)
        maps = [input_projection.project(self.output_rays)]
        for _ in range(pixel_jittering_iterations):
            rays = get_projection_rays(
                output_projection, jittering_noise_level
            )
            maps.append(input_projection.project(rays))
        self.maps = [
            (np.asarray(u, np.float32), np.asarray(v, np.float32))
            for u, v in maps
        ]

    def convert(
        self, img: np.ndarray, nearest: bool = False, single_map: bool = False
    ) -> np.ndarray:
        import cv2

        interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
        out = []
        for map_u, map_v in self.maps:
            out.append(
                cv2.remap(
                    img, map_u, map_v,
                    interpolation=interp, borderMode=cv2.BORDER_WRAP,
                )
            )
            if single_map:
                break
        if len(out) == 1:
            return out[0]
        return np.asarray(np.mean(out, axis=0), dtype=img.dtype)


def compute_pointmap(
    envmap_rays: np.ndarray, distancemap: np.ndarray, position
) -> np.ndarray:
    """World points from an equirect distance map
    (`multiview_crop_generator.py:44-47`)."""
    return envmap_rays * distancemap[:, :, None] + np.asarray(position)


def extract_cropped_camera(
    envmap_projection,
    crop_projection,
    color_image: np.ndarray,
    distancemap: np.ndarray,
    pointmap: Optional[np.ndarray] = None,
    pixel_jittering_iterations: int = 5,
    jittering_noise_level: float = 1.0,
):
    """Extract a perspective crop from an equirect render; returns
    (color, depthmap, pointmap) with the distance map converted to
    planar depth (`multiview_crop_generator.py:55-72`)."""
    remapper = RemapProjection(
        envmap_projection, crop_projection,
        pixel_jittering_iterations, jittering_noise_level,
    )
    color = remapper.convert(color_image)
    distance = remapper.convert(distancemap, nearest=True, single_map=True)
    depth = (
        distance / np.linalg.norm(remapper.output_rays, axis=-1)
    ).astype(distance.dtype)
    points = (
        None
        if pointmap is None
        else remapper.convert(pointmap, nearest=True, single_map=True)
    )
    return color, depth, points


def perspective_projection_to_dict(persp_projection, position) -> dict:
    return dict(
        camera_intrinsics=colmap_to_opencv_intrinsics(
            persp_projection.base_projection.K
        ).tolist(),
        size=(
            persp_projection.base_projection.width,
            persp_projection.base_projection.height,
        ),
        R_cam2world=persp_projection.R_to_base_projection.T.tolist(),
        t_cam2world=list(position),
    )


def dict_to_perspective_projection(camera_params: dict):
    K = opencv_to_colmap_intrinsics(
        np.asarray(camera_params["camera_intrinsics"])
    )
    w, h = camera_params["size"]
    R = np.asarray(camera_params["R_cam2world"])
    proj = RotatedProjection(PerspectiveProjection(K, h, w), R.T)
    return proj, camera_params["t_cam2world"]


def render_environment_map(*args, **kwargs):  # pragma: no cover
    try:
        import habitat_sim  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "equirectangular rendering needs habitat-sim; the projection/"
            "cropping math in this module works on any pre-rendered "
            "equirect maps"
        ) from e
    raise NotImplementedError(
        "habitat-sim renderer not bundled; see the upstream "
        "habitat_sim_envmaps_renderer for the simulator flow"
    )
