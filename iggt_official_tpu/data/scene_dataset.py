"""Directory-contract scene datasets (ScanNet-style layout and variants).

Behavioural parity: the shipped per-dataset loaders (`iggt/datasets/
scannet.py`, `scannetpp.py`, `re10k.py`, `dl3dv.py`, ...) all follow one
pattern — scan sequence dirs, load per-frame pose npz + 16-bit depth PNG +
RGB, rank frames by extrinsic covisibility, and at `_get_views` time return
the anchor plus sampled top-k covisible frames.  `SceneDirDataset`
implements that pattern once over the documented layout
(`README.md:75-90`):

    root/<split>/<sequence>/
        color/XXXX.jpg   depth/XXXX.png   cam/XXXX.npz (pose 4x4, intrinsics 3x3)

and the named subclasses bind the per-dataset knobs (depth scale, dirs,
default z_far).  Loaders for datasets whose preprocessed layout matches
(ScanNet, ScanNet++, Re10K, DL3DV without masklets) are thin subclasses.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional

import numpy as np
import PIL.Image

from iggt_official_tpu.data.base import BaseViewDataset, threshold_depth_map
from iggt_official_tpu.data.ranking import compute_ranking


class SceneDirDataset(BaseViewDataset):
    dataset_label = "SceneDir"
    color_dir = "color"
    depth_dir = "depth"
    cam_dir = "cam"
    color_ext = "*.jpg"
    depth_ext = "*.png"
    # depth decoding: "png_scale" (uint16 / depth_scale), "png_maxdepth"
    # (uint16 / 65535 * max_depth, hypersim-style), "npy", "pfm", "exr"
    depth_mode = "png_scale"
    depth_scale = 1000.0  # raw / scale = meters
    max_depth = 100.0     # used by png_maxdepth
    depth_percentile = 99
    # camera npz keys: either a single 4x4 "pose" or split R/t
    pose_key = "pose"
    rot_key = "R_cam2world"
    trans_key = "t_cam2world"
    intr_keys = ("intrinsics", "intrinsic")
    min_frames = 24

    def __init__(
        self,
        dataset_location: str,
        dset: str = "scans",
        top_k: int = 256,
        z_far: float = 100,
        quick: bool = False,
        specify: bool = False,
        **kwargs,
    ):
        super().__init__(z_far=z_far, **kwargs)
        self.dataset_location = dataset_location
        self.dset = dset
        self.top_k = top_k
        self.specify = specify

        self.full_idxs: List[int] = []
        self.all_rgb_paths: List[str] = []
        self.all_depth_paths: List[str] = []
        self.all_extrinsic: List[np.ndarray] = []
        self.all_intrinsic: List[np.ndarray] = []
        self.rank: Dict[int, np.ndarray] = {}

        root = os.path.join(dataset_location, dset)
        sequences = sorted(glob.glob(os.path.join(root, "*/")))
        if quick:
            sequences = sequences[:1]

        for seq in sequences:
            rgb_paths = sorted(
                glob.glob(os.path.join(seq, self.color_dir, self.color_ext))
            )
            depth_paths = sorted(
                glob.glob(os.path.join(seq, self.depth_dir, self.depth_ext))
            )
            cam_paths = sorted(glob.glob(os.path.join(seq, self.cam_dir, "*.npz")))
            if len(rgb_paths) < self.min_frames:
                continue
            assert len(rgb_paths) == len(depth_paths) == len(cam_paths), seq

            base = len(self.full_idxs)
            self.full_idxs.extend(range(base, base + len(rgb_paths)))
            self.all_rgb_paths.extend(rgb_paths)
            self.all_depth_paths.extend(depth_paths)

            extrinsics_seq = []
            for cam_path in cam_paths:
                pose, K = self._load_cam(cam_path)
                self.all_extrinsic.append(pose)
                self.all_intrinsic.append(K)
                extrinsics_seq.append(pose)

            ranking, _ = compute_ranking(
                np.stack(extrinsics_seq), lambda_t=1.0, normalize=True
            )
            ranking = ranking.astype(np.int32) + base
            for ind, i in enumerate(range(base, len(self.full_idxs))):
                # drop self (rank position 0 is the frame itself)
                self.rank[i] = ranking[ind][1:]

    def __len__(self):
        return len(self.full_idxs)

    def _load_cam(self, cam_path: str):
        cam = np.load(cam_path)
        if self.pose_key in cam:
            pose = np.asarray(cam[self.pose_key], np.float32)
        else:
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3] = np.asarray(cam[self.rot_key], np.float32)
            pose[:3, 3] = np.asarray(cam[self.trans_key], np.float32).ravel()
        K = None
        for key in self.intr_keys:
            if key in cam:
                K = np.asarray(cam[key], np.float32)
                break
        assert pose.shape == (4, 4) and K is not None and K.shape == (3, 3), cam_path
        return pose, K

    def _read_depth(self, path: str) -> np.ndarray:
        if self.depth_mode == "npy":
            depth = np.load(path).astype(np.float32)
        elif self.depth_mode == "pfm":
            depth = read_pfm(path).astype(np.float32)
        else:
            import cv2

            raw = cv2.imread(path, cv2.IMREAD_UNCHANGED)
            if raw.ndim == 3:
                raw = raw[..., 0]
            if self.depth_mode == "png_maxdepth":
                depth = raw.astype(np.float32) / 65535.0 * self.max_depth
            elif self.depth_mode == "exr":
                depth = raw.astype(np.float32)
            else:
                depth = raw.astype(np.float32) / self.depth_scale
        depth[~np.isfinite(depth)] = 0
        return threshold_depth_map(
            depth, max_percentile=self.depth_percentile, min_percentile=-1
        )

    def _get_views(self, index, num, resolution, rng):
        anchor = self.full_idxs[index]
        if num != 1:
            rest = self.rank[anchor][
                : min(self.top_k, len(self.rank[anchor]))
            ]
            if self.specify:
                step = max(1, len(rest) // (num - 1))
                others = [rest[i] for i in range(0, len(rest), step)][: num - 1]
            else:
                others = list(rng.choice(rest, size=num - 1, replace=False))
            full_idx = [anchor] + [int(i) for i in others]
        else:
            full_idx = [anchor]

        views = []
        for i in full_idx:
            image = PIL.Image.open(self.all_rgb_paths[i]).convert("RGB")
            depth = self._read_depth(self.all_depth_paths[i])
            K = self.all_intrinsic[i]
            image, depth, K = self._crop_resize_if_necessary(
                image, depth, K, resolution, rng=rng,
                info=self.all_rgb_paths[i],
            )
            views.append(
                dict(
                    img=image,
                    depthmap=depth,
                    camera_pose=self.all_extrinsic[i],
                    camera_intrinsics=K,
                    dataset=self.dataset_label,
                    label=self.all_rgb_paths[i].split(os.sep)[-3],
                    instance=os.path.basename(self.all_rgb_paths[i]),
                    frame_index=i,
                )
            )
        return views


def read_pfm(path: str) -> np.ndarray:
    """Minimal PFM reader (BlendedMVS-style depth maps)."""
    with open(path, "rb") as f:
        header = f.readline().decode().rstrip()
        assert header in ("PF", "Pf"), header
        dims = f.readline().decode().split()
        w, h = int(dims[0]), int(dims[1])
        scale = float(f.readline().decode().rstrip())
        data = np.fromfile(f, "<f" if scale < 0 else ">f")
    channels = 3 if header == "PF" else 1
    img = data.reshape(h, w, channels) if channels == 3 else data.reshape(h, w)
    return np.flipud(img).copy()


# Named dataset registry lives in iggt_official_tpu/data/datasets.py; the
# most common ones are re-exported here for convenience.
from iggt_official_tpu.data.datasets import (  # noqa: E402,F401
    DATASETS,
    Dl3dv,
    Re10K,
    Scannet,
    Scannetpp,
)
