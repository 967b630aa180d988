"""Data layer: cropping parity, ranking, algebra, samplers, scene dataset."""

import os

import numpy as np
import pytest
import PIL.Image

from iggt_official_tpu.data import (
    AnchorFrameSampler,
    BatchedRandomSampler,
    TestSampler,
    collate_views,
    compute_ranking,
    get_data_loader,
)
from iggt_official_tpu.data import cropping
from iggt_official_tpu.data.scene_dataset import Scannet

from . import torch_ref


@pytest.fixture(scope="module")
def ref():
    return torch_ref.iggt_modules()


def test_cropping_parity(ref):
    import iggt.datasets.utils.cropping as ref_crop

    rng = np.random.default_rng(0)
    img = PIL.Image.fromarray(
        rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
    )
    depth = rng.uniform(0.5, 5, (120, 160)).astype(np.float32)
    K = np.array([[100.0, 0, 82], [0, 100.0, 59], [0, 0, 1]], np.float32)

    ri, rd, rk = ref_crop.rescale_image_depthmap(img, depth, K, (96, 72))
    mi, md, mk = cropping.rescale_image_depthmap(img, depth, K, (96, 72))
    np.testing.assert_array_equal(np.asarray(ri), np.asarray(mi))
    np.testing.assert_array_equal(rd, md)
    np.testing.assert_allclose(rk, mk, rtol=1e-6)

    K2r = ref_crop.camera_matrix_of_crop(rk, ri.size, (80, 60))
    K2m = cropping.camera_matrix_of_crop(mk, mi.size, (80, 60))
    np.testing.assert_allclose(K2r, K2m, rtol=1e-6)

    bb_r = ref_crop.bbox_from_intrinsics_in_out(rk, K2r, (80, 60))
    bb_m = cropping.bbox_from_intrinsics_in_out(mk, K2m, (80, 60))
    assert tuple(bb_r) == tuple(bb_m)

    ri2, rd2, rk2, _ = ref_crop.crop_image_depthmap(ri, rd, rk, bb_r)
    mi2, md2, mk2, _ = cropping.crop_image_depthmap(mi, md, mk, bb_m)
    np.testing.assert_array_equal(np.asarray(ri2), np.asarray(mi2))
    np.testing.assert_array_equal(rd2, md2)
    np.testing.assert_allclose(rk2, mk2, rtol=1e-6)


def test_ranking_parity(ref):
    from iggt.datasets.utils.image_ranking import compute_ranking as ref_rank
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(1)
    n = 12
    ext = np.tile(np.eye(4), (n, 1, 1))
    ext[:, :3, :3] = Rotation.random(n, random_state=1).as_matrix()
    ext[:, :3, 3] = rng.normal(0, 2, (n, 3))

    rr, rd = ref_rank(ext.copy(), lambda_t=1.0, normalize=True, batched=True)
    mr, md = compute_ranking(ext.copy(), lambda_t=1.0, normalize=True)
    np.testing.assert_allclose(md, rd, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(mr, np.asarray(rr))


def _make_scene_dir(tmp_path, n_seq=1, n_frames=26, W=96, H=72):
    import cv2
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(0)
    root = tmp_path / "scannet"
    for s in range(n_seq):
        seq = root / "scans" / f"scene{s:04d}"
        for sub in ("color", "depth", "cam"):
            os.makedirs(seq / sub)
        for i in range(n_frames):
            img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
            PIL.Image.fromarray(img).save(seq / "color" / f"{i:04d}.jpg")
            depth_mm = rng.integers(500, 3000, (H, W)).astype(np.uint16)
            cv2.imwrite(str(seq / "depth" / f"{i:04d}.png"), depth_mm)
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3] = Rotation.from_rotvec(
                [0, 0.02 * i, 0]
            ).as_matrix()
            pose[:3, 3] = [0.05 * i, 0, 0]
            K = np.array(
                [[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]], np.float32
            )
            np.savez(seq / "cam" / f"{i:04d}.npz", pose=pose, intrinsics=K)
    return str(root)


def test_scene_dataset_and_views(tmp_path):
    root = _make_scene_dir(tmp_path)
    ds = Scannet(root, dset="scans", resolution=(64, 48), seed=7)
    assert len(ds) == 26

    views = ds[(0, 0, 4)]  # anchor + 3 covisible
    assert len(views) == 4
    v = views[0]
    assert v["img"].shape == (48, 64, 3)
    assert v["depthmap"].shape == (48, 64)
    assert v["pts3d"].shape == (48, 64, 3)
    assert v["valid_mask"].dtype == bool
    assert v["camera_pose"].shape == (4, 4)
    # pts3d consistent with manual unprojection at a valid pixel
    K = v["camera_intrinsics"]
    d = v["depthmap"]
    ys, xs = np.nonzero(v["valid_mask"])
    y, x = ys[0], xs[0]
    cam = np.array(
        [(x - K[0, 2]) * d[y, x] / K[0, 0],
         (y - K[1, 2]) * d[y, x] / K[1, 1],
         d[y, x]]
    )
    world = v["camera_pose"][:3, :3] @ cam + v["camera_pose"][:3, 3]
    np.testing.assert_allclose(v["pts3d"][y, x], world, rtol=1e-5)


def test_dataset_algebra(tmp_path):
    root = _make_scene_dir(tmp_path)
    ds = Scannet(root, dset="scans", resolution=(64, 48), seed=7)
    big = 10 @ (2 * ds + ds)
    assert len(big) == 10
    big.set_epoch(0)
    views = big[(0, 1, 0, 8)]  # SeqDataset/Resized contract: 2 anchors, bs 8
    assert len(views) == 8


def test_samplers():
    class Dummy:
        def __len__(self):
            return 30

    s = BatchedRandomSampler(Dummy(), batch_size=4, pool_size=3)
    s.set_epoch(0)
    idxs = list(s)
    assert len(idxs) == 28  # 30 rounded down to batch multiple
    feats = [f for _, f in idxs]
    for b in range(len(idxs) // 4):
        assert len(set(feats[4 * b : 4 * b + 4])) == 1

    # rank slicing covers disjoint halves
    a = BatchedRandomSampler(Dummy(), 4, 3, world_size=2, rank=0)
    b = BatchedRandomSampler(Dummy(), 4, 3, world_size=2, rank=1)
    a.set_epoch(1)
    b.set_epoch(1)
    ia, ib = {i for i, _ in a}, {i for i, _ in b}
    assert not (ia & ib)

    afs = AnchorFrameSampler(Dummy(), batch_size=8, seq_min_len=2,
                             seq_max_len=8, pool_size=2)
    afs.set_epoch(0)
    groups = list(afs)
    assert len(groups) == 30
    for g in groups:
        *anchors, ar, bs = g
        assert bs == 8 and bs % len(anchors) == 0
        assert len(anchors) in (2, 4, 8)

    ts = TestSampler(Dummy(), batch_size=1, test_batch_size=6, pool_size=2)
    assert list(ts)[0] == (0, 0, 6)


def test_data_loader_to_train_batch(tmp_path):
    root = _make_scene_dir(tmp_path)
    ds = Scannet(root, dset="scans", resolution=(56, 42), seed=7)
    loader = get_data_loader(
        ds, seq_min_len=2, seq_max_len=4, batch_size=4, shuffle=True,
        num_prefetch=1,
    )
    batch = next(loader)
    B, S = batch["images"].shape[:2]
    assert B * S == 4
    assert batch["images"].shape[2:] == (42, 56, 3)
    assert batch["depth"].shape == (B, S, 42, 56, 1)
    assert batch["world_points"].shape == (B, S, 42, 56, 3)
    assert batch["valid_mask"].shape == (B, S, 42, 56)
    assert batch["pose_enc"].shape == (B, S, 9)
    assert np.isfinite(batch["pose_enc"]).all()


def test_rle_codec_roundtrip():
    from iggt_official_tpu.data import rle

    rng = np.random.default_rng(0)
    for shape in [(7, 11), (32, 32), (1, 5)]:
        mask = rng.random(shape) < 0.4
        enc = rle.encode(mask, compress=True)
        assert isinstance(enc["counts"], str)
        np.testing.assert_array_equal(rle.decode(enc), mask)
        assert rle.area(enc) == mask.sum()
        # uncompressed round-trip too
        enc2 = rle.encode(mask, compress=False)
        np.testing.assert_array_equal(rle.decode(enc2), mask)


def test_color_jitter_and_imgnorm():
    from iggt_official_tpu.data.transforms import ColorJitter, ImgNorm

    rng = np.random.default_rng(1)
    img = PIL.Image.fromarray(
        rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    )
    out = ColorJitter(seed=0)(img)
    assert out.size == img.size
    assert (np.asarray(out) != np.asarray(img)).any()
    arr = ImgNorm(img)
    assert arr.dtype == np.float32 and arr.max() <= 1.0


def test_pfm_roundtrip(tmp_path):
    from iggt_official_tpu.data.scene_dataset import read_pfm

    rng = np.random.default_rng(2)
    depth = rng.uniform(0.5, 5, (12, 17)).astype(np.float32)
    p = tmp_path / "d.pfm"
    with open(p, "wb") as f:
        f.write(b"Pf\n17 12\n-1.0\n")
        np.flipud(depth).astype("<f").tofile(f)
    np.testing.assert_allclose(read_pfm(str(p)), depth)


def test_dataset_registry():
    from iggt_official_tpu.data.datasets import DATASETS

    assert len(DATASETS) >= 30
    for name in ["Scannet", "Dl3dv", "Re10K", "Hypersim", "BlendedMVS",
                 "Co3d", "Waymo", "TarTanAir", "Vkitti"]:
        assert name in DATASETS


def test_dl3dv_masklets(tmp_path):
    import json

    from iggt_official_tpu.data import rle
    from iggt_official_tpu.data.datasets import Dl3dv

    rng = np.random.default_rng(3)
    W, H = 70, 56
    n_frames = 4
    root = tmp_path / "dl3dv"
    seq = root / "train" / "seq0"
    for sub in ("rgb", "depth", "cam"):
        os.makedirs(seq / "dense" / sub)
    masklets = []
    for i in range(n_frames):
        PIL.Image.fromarray(
            rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        ).save(seq / "dense" / "rgb" / f"frame_{i:04d}.png")
        np.save(seq / "dense" / "depth" / f"frame_{i:04d}.npy",
                rng.uniform(0.5, 3, (H, W)).astype(np.float32))
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [0.1 * i, 0, 0]
        K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]],
                     np.float32)
        np.savez(seq / "dense" / "cam" / f"frame_{i:04d}.npz",
                 pose=pose, intrinsic=K)
        m = np.zeros((H, W), np.uint8)
        m[: H // 2] = i + 1  # distinct per frame
        masklets.append(rle.encode(m > 0))
    with open(seq / "auto_masks.json", "w") as f:
        json.dump({"masklet": masklets}, f)

    Dl3dv.min_frames = 2
    ds = Dl3dv(str(root), dset="train", resolution=(64, 48), seed=3)
    views = ds[(0, 0, 2)]
    assert len(views) == 2
    for v in views:
        assert "instance_ids" in v
        assert v["instance_ids"].shape == v["depthmap"].shape
        assert v["instance_ids"].max() == 1


def test_entity_image_dataset(tmp_path):
    import json

    from iggt_official_tpu.data import rle
    from iggt_official_tpu.data.seg2d import EntityImage

    rng = np.random.default_rng(4)
    os.makedirs(tmp_path / "imgs")
    H, W = 64, 80
    PIL.Image.fromarray(
        rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    ).save(tmp_path / "imgs" / "a.jpg")
    m = np.zeros((H, W), np.uint8)
    m[10:30, 10:40] = 1
    coco = {
        "images": [{"id": 1, "file_name": "a.jpg", "height": H, "width": W}],
        "annotations": [
            {"id": 1, "image_id": 1, "segmentation": rle.encode(m > 0)},
            {"id": 2, "image_id": 1,
             "segmentation": [[50.0, 40.0, 70.0, 40.0, 70.0, 60.0, 50.0, 60.0]]},
        ],
    }
    with open(tmp_path / "ann.json", "w") as f:
        json.dump(coco, f)

    ds = EntityImage(str(tmp_path / "imgs"), str(tmp_path / "ann.json"),
                     resolution=48, seed=0)
    assert len(ds) == 1
    item = ds[0]
    assert item["img"].shape == (48, 48, 3)
    assert item["instance_ids"].shape == (48, 48)
    assert set(np.unique(item["instance_ids"])) <= {0, 1, 2}
    assert (item["instance_ids"] > 0).any()


def test_sav_dataset(tmp_path):
    import json

    from iggt_official_tpu.data import rle
    from iggt_official_tpu.data.seg2d import SAVDataset

    H, W = 32, 40
    masklet = []
    for f in range(3):
        frame_masks = []
        for k in range(4):
            m = np.zeros((H, W), np.uint8)
            m[k * 6 : k * 6 + 6] = 1
            frame_masks.append(rle.encode(m > 0))
        masklet.append(frame_masks)
    p = tmp_path / "auto_masks.json"
    with open(p, "w") as f:
        json.dump({"masklet": masklet}, f)

    sav = SAVDataset()
    out = sav.sample_masks_from_frames(str(p), [0, 2], mask_sample_num=2,
                                       random_seed=0)
    assert set(out) == {0, 2}
    for masks in out.values():
        assert len(masks) == 2
        for m in masks:
            assert m.shape == (H, W) and m.dtype == bool and m.sum() == 6 * W


def _write_sa1b_shard(path, n_rows, H=48, W=64, seed=0):
    import base64
    import io
    import json

    from iggt_official_tpu.data import rle

    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        for i in range(n_rows):
            img = PIL.Image.fromarray(
                rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
            )
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            b64 = base64.b64encode(buf.getvalue()).decode("ascii")
            annos = []
            for k in range(2):
                m = np.zeros((H, W), np.uint8)
                m[8 * k + 4 : 8 * k + 20, 10 : 40] = 1
                ys, xs = np.nonzero(m)
                annos.append({
                    "segmentation": rle.encode(m > 0),
                    "bbox": [int(xs.min()), int(ys.min()),
                             int(xs.max() - xs.min() + 1),
                             int(ys.max() - ys.min() + 1)],
                    "point_coords": [[float(xs.mean()), float(ys.mean())]],
                    "iscrowd": 0,
                })
            record = {"image": {"height": H, "width": W},
                      "annotations": annos}
            f.write(f"img_{i}\t{json.dumps(record)}\t{b64}\n")


def test_tsv_file_roundtrip(tmp_path):
    from iggt_official_tpu.data.tsv import TSVFile, img_from_base64

    shard = tmp_path / "sa1b_0.tsv"
    _write_sa1b_shard(shard, 5)
    tsv = TSVFile(str(shard))
    assert tsv.num_rows() == 5
    assert (tmp_path / "sa1b_0.lineidx").exists()
    # random access out of order
    for i in [3, 0, 4, 1]:
        row = tsv.seek(i)
        assert row[0] == f"img_{i}"
        assert len(row) == 3
        img = img_from_base64(row[-1])
        assert img.size == (64, 48)
    # lineidx is reused on reopen
    tsv2 = TSVFile(str(shard))
    assert tsv2.seek(2)[0] == "img_2"


def test_tsv_split_label(tmp_path):
    from iggt_official_tpu.data.tsv import TSVFile, generate_lineidx

    shard = tmp_path / "d_0.tsv"
    with open(shard, "w") as f:
        for i in range(3):
            f.write(f"k{i}\tpayload{i}\n")
    with open(tmp_path / "d_0.label", "w") as f:
        for i in range(3):
            f.write(f"k{i}\tlabel{i}\n")
    generate_lineidx(str(tmp_path / "d_0.label"),
                     str(tmp_path / "d_0.label.lineidx"))
    tsv = TSVFile(str(shard))
    assert tsv.seek(1) == ["k1", "label1", "payload1"]


def test_sa1b_dataset(tmp_path):
    from iggt_official_tpu.data.tsv import SA1BDataset, list_tsv_shards

    _write_sa1b_shard(tmp_path / "sa1b_0.tsv", 3)
    _write_sa1b_shard(tmp_path / "sa1b_1.tsv", 2, seed=1)
    _write_sa1b_shard(tmp_path / "sa1b_7.tsv", 2, seed=2)

    assert len(list_tsv_shards(str(tmp_path), 0, 2)) == 2

    ds = SA1BDataset(str(tmp_path), image_size=64, subset=(0, 2), seed=0)
    assert len(ds) == 5
    item = ds[0]
    assert item["image"].shape == (64, 64, 3)
    assert item["sam_image"].shape == (64, 64, 3)
    assert item["padding_mask"].shape == (64, 64)
    n = len(item["gt_masks"])
    assert item["gt_boxes"].shape == (n, 4)
    assert item["point_coords"].shape == (n, 4)
    if n:
        # boxes tightly bound the masks
        m0 = item["gt_masks"][0]
        ys, xs = np.nonzero(m0)
        assert item["gt_boxes"][0].tolist() == [
            xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
        # padded pixels are zero
        assert item["image"][item["padding_mask"]].sum() == 0
    # eval mode caps rows per shard at 20
    ds_eval = SA1BDataset(str(tmp_path), image_size=64, subset=(0, 8),
                          is_train=False, seed=0)
    assert len(ds_eval) == 7


def test_scene_dataset_index_cache(tmp_path, monkeypatch):
    """use_cache round-trip (ref `scannet.py:86-101,155-159`): second
    construction loads the saved index and yields identical views."""
    root = _make_scene_dir(tmp_path)
    monkeypatch.chdir(tmp_path)  # annotations/ written under cwd like ref
    ds1 = Scannet(root, dset="scans", resolution=(64, 48), seed=7,
                  use_cache=True)
    assert os.path.exists(
        tmp_path / "annotations" / "scannet_annotations" / "scans"
        / "index.npz"
    )
    ds2 = Scannet(root, dset="scans", resolution=(64, 48), seed=7,
                  use_cache=True)
    assert len(ds2) == len(ds1) == 26
    assert ds2.all_rgb_paths == ds1.all_rgb_paths
    np.testing.assert_array_equal(ds2.rank[3], ds1.rank[3])
    v1 = ds1[(2, 0, 2)]
    v2 = ds2[(2, 0, 2)]
    np.testing.assert_allclose(v2[0]["img"], v1[0]["img"])
    np.testing.assert_allclose(v2[1]["depthmap"], v1[1]["depthmap"])


def test_co3d_nested_layout_and_max_depth(tmp_path):
    """Co3d: category/sequence nesting, camera_pose key, per-frame
    maximum_depth scaling (ref `co3d.py:107-179`)."""
    import cv2
    from scipy.spatial.transform import Rotation

    from iggt_official_tpu.data.datasets import Co3d

    rng = np.random.default_rng(1)
    W, H = 96, 72
    seq = tmp_path / "co3d" / "train" / "apple" / "seq001"
    for sub in ("images", "depth", "cam"):
        os.makedirs(seq / sub)
    max_depths = []
    for i in range(4):
        PIL.Image.fromarray(
            rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        ).save(seq / "images" / f"{i:04d}.jpg")
        raw = rng.integers(1000, 60000, (H, W)).astype(np.uint16)
        cv2.imwrite(str(seq / "depth" / f"{i:04d}.png"), raw)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = Rotation.from_rotvec([0, 0.1 * i, 0]).as_matrix()
        pose[:3, 3] = [0.1 * i, 0, 0]
        K = np.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]],
                     np.float32)
        md = 5.0 + i
        max_depths.append(md)
        np.savez(seq / "cam" / f"{i:04d}.npz", camera_pose=pose,
                 intrinsics=K, maximum_depth=np.float32(md))

    ds = Co3d(str(tmp_path / "co3d"), dset="train", resolution=(64, 48),
              seed=3)
    assert len(ds) == 4
    assert ds.max_depths == max_depths
    # depth decoded with the per-frame scale: frame 3 uses max_depth 8
    d3_raw = cv2.imread(str(seq / "depth" / "0003.png"),
                        cv2.IMREAD_UNCHANGED).astype(np.float32)
    want = d3_raw / 65535.0 * 8.0
    got = ds._read_depth(str(seq / "depth" / "0003.png"),
                         max_depth=ds.max_depths[3])
    valid = got > 0  # percentile threshold zeroes the top tail
    np.testing.assert_allclose(got[valid], want[valid], rtol=1e-6)


def test_scannetpp_metadata_and_obj_ids(tmp_path):
    """ScanNet++: metadata npz with DSC-prefix skipping + obj_ids
    instance maps (ref `scannetpp.py:67-250`)."""
    import cv2
    import torch
    from scipy.spatial.transform import Rotation

    from iggt_official_tpu.data.datasets import Scannetpp

    rng = np.random.default_rng(2)
    W, H = 96, 72
    seq = tmp_path / "spp" / "scans" / "scene0"
    for sub in ("images", "depth", "obj_ids"):
        os.makedirs(seq / sub)
    n_iphone, n_dsc = 4, 2
    poses, intrs, names = [], [], []
    for i in range(n_dsc):
        names.append(f"DSC{i:05d}.jpg")
        poses.append(np.full((4, 4), np.nan, np.float32))  # DSLR skipped
        intrs.append(np.eye(3, dtype=np.float32))
    for i in range(n_iphone):
        names.append(f"frame_{i:06d}.jpg")
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = Rotation.from_rotvec([0, 0.05 * i, 0]).as_matrix()
        pose[:3, 3] = [0.1 * i, 0, 0]
        poses.append(pose)
        intrs.append(np.array(
            [[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]], np.float32
        ))
        PIL.Image.fromarray(
            rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        ).save(seq / "images" / f"frame_{i:06d}.jpg")
        cv2.imwrite(
            str(seq / "depth" / f"frame_{i:06d}.png"),
            rng.integers(500, 3000, (H, W)).astype(np.uint16),
        )
        torch.save(
            torch.from_numpy(rng.integers(0, 5, (H, W)).astype(np.int32)),
            str(seq / "obj_ids" / f"frame_{i:06d}.jpg.pth"),
        )
    np.savez(
        seq / "new_scene_metadata.npz",
        images=np.array(names),
        trajectories=np.stack(poses),
        intrinsics=np.stack(intrs),
    )

    class TinyScannetpp(Scannetpp):
        min_frames = 2  # fixture is tiny; the real floor is 24

    ds = TinyScannetpp(str(tmp_path / "spp"), dset="scans",
                       resolution=(64, 48), seed=5)
    assert len(ds) == n_iphone  # DSC frames skipped
    views = ds[(0, 0, 2)]
    for v in views:
        assert "instance_ids" in v
        assert v["instance_ids"].shape == v["depthmap"].shape
        assert v["instance_ids"].max() < 5
