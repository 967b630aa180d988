"""Named dataset registry.

The reference ships ~30 per-dataset loader files (`iggt/datasets/*.py`,
~13k LoC) that all follow the SceneDirDataset pattern — scan preprocessed
sequence dirs, covisibility-rank frames, sample anchor + top-k — differing
only in directory names, depth encodings and camera npz keys (see each
class's parity note).  Here each dataset binds those knobs on the shared
implementation; `DATASETS` is the name -> class registry consumed by
`get_data_loader`'s expression strings.

The `dl3dv`-style masklet instance pseudo-GT path attaches per-view
``instance_ids`` decoded with the first-party COCO RLE codec
(`iggt_official_tpu/data/rle.py`).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Type

import numpy as np

from iggt_official_tpu.data import rle as rle_codec
from iggt_official_tpu.data.scene_dataset import SceneDirDataset


class Scannet(SceneDirDataset):
    """`iggt/datasets/scannet.py`: color/ depth/ cam/, mm uint16 depth."""

    dataset_label = "Scannet"


class MaskletMixin:
    """SAM2 masklet pseudo-GT: per-sequence ``auto_masks.json`` with COCO
    RLE masks, attached as per-view ``instance_ids``
    (`dl3dv.py:241-451`, `re10k.py:122-148`, `sav.py:51-190`)."""

    def __init__(self, *args, load_masklets: bool = True, **kwargs):
        self.load_masklets = load_masklets
        self._masklets: Dict[str, list] = {}
        super().__init__(*args, **kwargs)

    def _seq_and_frame(self, global_idx: int):
        """Sequence dir + within-sequence frame number for a global index."""
        rgb_path = self.all_rgb_paths[global_idx]
        seq_dir = rgb_path
        for _ in range(1 + len(self.color_dir.split(os.sep))):
            seq_dir = os.path.dirname(seq_dir)
        # frames of one sequence are contiguous and sorted
        base = global_idx
        while base > 0 and self.all_rgb_paths[base - 1].startswith(seq_dir):
            base -= 1
        return seq_dir, global_idx - base

    def _get_views(self, index, num, resolution, rng):
        views = super()._get_views(index, num, resolution, rng)
        if not self.load_masklets:
            return views
        for view in views:
            seq_dir, frame_no = self._seq_and_frame(view["frame_index"])
            mask_json = os.path.join(seq_dir, "auto_masks.json")
            if not os.path.exists(mask_json):
                continue
            if mask_json not in self._masklets:
                with open(mask_json, encoding="utf-8") as f:
                    self._masklets[mask_json] = json.load(f)["masklet"]
            masklets = self._masklets[mask_json]
            if frame_no < len(masklets):
                m = rle_codec.decode(masklets[frame_no])
                H, W = view["depthmap"].shape
                if m.shape != (H, W):
                    ys = (np.linspace(0, m.shape[0] - 1, H)).astype(int)
                    xs = (np.linspace(0, m.shape[1] - 1, W)).astype(int)
                    m = m[ys][:, xs]
                view["instance_ids"] = m.astype(np.int32)
        return views


class Scannetpp(SceneDirDataset):
    """`iggt/datasets/scannetpp.py:67-250`: per-sequence metadata npz
    (stacked trajectories/intrinsics; DSLR `DSC*` frames skipped so only
    iPhone frames index) + instance-id maps via the images -> obj_ids
    path rewrite."""

    dataset_label = "Scannetpp"
    color_dir = "images"
    color_ext = "frame_*.jpg"
    depth_ext = "frame_*.png"
    metadata_name = "new_scene_metadata.npz"
    load_obj_ids = True

    def _scan_sequence(self, seq):
        import glob as _glob

        rgb_paths = sorted(
            _glob.glob(os.path.join(seq, self.color_dir, self.color_ext))
        )
        depth_paths = sorted(
            _glob.glob(os.path.join(seq, "depth", self.depth_ext))
        )
        meta_path = os.path.join(seq, self.metadata_name)
        if not rgb_paths or not os.path.exists(meta_path):
            return None
        meta = np.load(meta_path, allow_pickle=True)
        image_list = [str(s) for s in meta["images"]]
        dsc_count = len([s for s in image_list if s.startswith("DSC")])
        cams = []
        for pose, K in zip(
            meta["trajectories"][dsc_count:], meta["intrinsics"][dsc_count:]
        ):
            pose = np.asarray(pose, np.float32)
            K = np.asarray(K, np.float32)
            assert pose.shape == (4, 4) and K.shape == (3, 3), meta_path
            cams.append((pose, K))
        return rgb_paths, depth_paths, cams, None

    def _get_views(self, index, num, resolution, rng):
        views = super()._get_views(index, num, resolution, rng)
        if not self.load_obj_ids:
            return views
        for view in views:
            rgb = self.all_rgb_paths[view["frame_index"]]
            obj_path = rgb.replace(
                f"{os.sep}images{os.sep}", f"{os.sep}obj_ids{os.sep}"
            ) + ".pth"
            if not os.path.exists(obj_path):
                continue
            import torch

            ids = torch.load(obj_path, map_location="cpu",
                             weights_only=False)
            ids = np.asarray(ids, np.int32)
            H, W = view["depthmap"].shape
            if ids.shape != (H, W):
                ys = (np.linspace(0, ids.shape[0] - 1, H)).astype(int)
                xs = (np.linspace(0, ids.shape[1] - 1, W)).astype(int)
                ids = ids[ys][:, xs]
            view["instance_ids"] = ids
        return views


class ScannetppV2(Scannetpp):
    """`iggt/datasets/scannetpp.py` scannetppv2 variant: iPhone metadata
    file (`scannetpp.py:137-140`)."""

    dataset_label = "scannetppv2"
    metadata_name = "scene_iphone_metadata.npz"


class Re10K(MaskletMixin, SceneDirDataset):
    """`iggt/datasets/re10k.py` (COLMAP-derived; see data/colmap.py for the
    model readers used during preprocessing).  Binds the masklet pseudo-GT
    path (`re10k.py:122-148`)."""

    dataset_label = "Re10K"
    min_frames = 2


class ARKitScenes(SceneDirDataset):
    """`iggt/datasets/arkitscenes.py`."""

    dataset_label = "ARKitScenes"


class ARKitScenesHigh(SceneDirDataset):
    """`iggt/datasets/arkitscenes_high.py`."""

    dataset_label = "ARKitScenesHigh"


class Bedlam(SceneDirDataset):
    """`iggt/datasets/bedlam.py`."""

    dataset_label = "Bedlam"


class BlendedMVS(SceneDirDataset):
    """`iggt/datasets/blendedmvs.py`: PFM depth, split R/t camera keys."""

    dataset_label = "BlendedMVS"
    depth_mode = "pfm"
    depth_ext = "*.pfm"


class Carla(SceneDirDataset):
    """`iggt/datasets/carla.py`."""

    dataset_label = "Carla"


class Co3d(SceneDirDataset):
    """`iggt/datasets/co3d.py:107-179`: category/sequence nesting,
    `camera_pose` npz key, per-frame `maximum_depth` scaling the uint16
    depth PNGs (raw / 65535 * max_depth)."""

    dataset_label = "Co3d"
    color_dir = "images"
    min_frames = 2
    seq_depth = 2
    pose_key = "camera_pose"
    depth_mode = "png_maxdepth"
    max_depth_key = "maximum_depth"


class Cop3d(Co3d):
    """`iggt/datasets/cop3d.py`."""

    dataset_label = "Cop3d"


class DynamicReplica(SceneDirDataset):
    """`iggt/datasets/dynamic_replica.py`."""

    dataset_label = "Dynamic_Replica"


class Habitat(SceneDirDataset):
    """`iggt/datasets/habitat.py` (renders from
    dataset_preprocess/habitat)."""

    dataset_label = "Habitat"


class Hypersim(SceneDirDataset):
    """`iggt/datasets/hypersim.py`: uint16 / 65535 * max_depth encoding
    (`hypersim.py:187-189`)."""

    dataset_label = "Hypersim"
    depth_mode = "png_maxdepth"


class Infinigen(SceneDirDataset):
    """`iggt/datasets/infinigen.py`: npy depth."""

    dataset_label = "Infinigen"
    depth_mode = "npy"
    depth_ext = "*.npy"


class Kubric(SceneDirDataset):
    """`iggt/datasets/kubric.py`."""

    dataset_label = "Kubric"


class MapFree(SceneDirDataset):
    """`iggt/datasets/mapfree.py`."""

    dataset_label = "MapFree"


class MegaDepth(SceneDirDataset):
    """`iggt/datasets/megadepth.py`."""

    dataset_label = "MegaDepth"
    min_frames = 2


class Mp3d(SceneDirDataset):
    """`iggt/datasets/mp3d.py`."""

    dataset_label = "Mp3d"


class MvsSynth(SceneDirDataset):
    """`iggt/datasets/mvs_synth.py`: exr float depth."""

    dataset_label = "Mvs_Synth"
    depth_mode = "exr"
    depth_ext = "*.exr"


class PointOdyssey(SceneDirDataset):
    """`iggt/datasets/pointodyssey.py`."""

    dataset_label = "PointOdyssey"


class Replica(SceneDirDataset):
    """`iggt/datasets/replica.py`."""

    dataset_label = "Replica"


class Sintel(SceneDirDataset):
    """`iggt/datasets/sintel.py`."""

    dataset_label = "Sintel"
    min_frames = 2


class Spring(SceneDirDataset):
    """`iggt/datasets/spring.py`."""

    dataset_label = "Spring"


class TarTanAir(SceneDirDataset):
    """`iggt/datasets/tartanair.py`: npy depth."""

    dataset_label = "TarTanAir"
    depth_mode = "npy"
    depth_ext = "*.npy"


class Uasol(SceneDirDataset):
    """`iggt/datasets/uasol.py`."""

    dataset_label = "Uasol"


class Unreal4k(SceneDirDataset):
    """`iggt/datasets/unreal4k.py`."""

    dataset_label = "Unreal4k"


class Vkitti(SceneDirDataset):
    """`iggt/datasets/vkitti.py`: cm-scaled uint16 depth."""

    dataset_label = "Vkitti"
    depth_scale = 100.0


class Waymo(SceneDirDataset):
    """`iggt/datasets/waymo.py`."""

    dataset_label = "Waymo"


class Wildrgb(SceneDirDataset):
    """`iggt/datasets/wildrgb.py`."""

    dataset_label = "Wildrgb"


class Dl3dv(MaskletMixin, SceneDirDataset):
    """`iggt/datasets/dl3dv.py`: dense/{rgb,depth,cam} layout with npy
    depth, sky/outlier validity masks and SAM2 masklet pseudo-GT
    (`dl3dv.py:241-451`, via MaskletMixin)."""

    dataset_label = "Dl3dv"
    color_dir = os.path.join("dense", "rgb")
    depth_dir = os.path.join("dense", "depth")
    cam_dir = os.path.join("dense", "cam")
    color_ext = "*.png"
    depth_ext = "*.npy"
    depth_mode = "npy"
    depth_percentile = 98


class Dl3dvNew(Dl3dv):
    """`iggt/datasets/dl3dv_new.py`."""

    dataset_label = "Dl3dv_new"


DATASETS: Dict[str, Type[SceneDirDataset]] = {
    cls.dataset_label: cls
    for cls in [
        ARKitScenes, ARKitScenesHigh, Bedlam, BlendedMVS, Carla, Co3d, Cop3d,
        Dl3dv, Dl3dvNew, DynamicReplica, Habitat, Hypersim, Infinigen, Kubric,
        ScannetppV2,
        MapFree, MegaDepth, Mp3d, MvsSynth, PointOdyssey, Re10K, Replica,
        Scannet, Scannetpp, Sintel, Spring, TarTanAir, Uasol, Unreal4k,
        Vkitti, Waymo, Wildrgb,
    ]
}
