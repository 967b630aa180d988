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


def test_masklet_sibling_dir_prefix(tmp_path):
    """`scene_1-old` sorts before `scene_1/` yet shares its string prefix;
    within-sequence frame numbers must not absorb the sibling's frames
    (masklet contract: `iggt/datasets/dl3dv.py:241-274`)."""
    import json

    from iggt_official_tpu.data import rle
    from iggt_official_tpu.data.datasets import Dl3dv

    rng = np.random.default_rng(5)
    W, H = 70, 56
    root = tmp_path / "dl3dv"

    def make_seq(name, n_frames, mask_rows):
        seq = root / "train" / name
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
            m[: mask_rows(i)] = 1  # per-frame-distinct mask extent
            masklets.append(rle.encode(m > 0))
        with open(seq / "auto_masks.json", "w") as f:
            json.dump({"masklet": masklets}, f)

    make_seq("scene_1-old", 3, lambda i: 2 * (i + 1))
    make_seq("scene_1", 4, lambda i: 5 * (i + 1))

    Dl3dv.min_frames = 2
    ds = Dl3dv(str(root), dset="train", resolution=(W, H), seed=5)
    assert len(ds) == 7
    # global frames 3..6 belong to scene_1 (scene_1-old sorts first)
    for g in range(3, 7):
        seq_dir, frame_no = ds._seq_and_frame(g)
        assert os.path.basename(seq_dir) == "scene_1"
        assert frame_no == g - 3
    views = ds[(3, 0, 2)]  # anchor = scene_1 frame 0
    anchor = next(v for v in views if v["frame_index"] == 3)
    # frame 0 of scene_1's masklet covers exactly 5 rows
    assert anchor["instance_ids"][:5].min() == 1
    assert anchor["instance_ids"][5:].max() == 0


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


# -- per-dataset loader idiosyncrasies (round 2) -----------------------

_K = np.array([[100.0, 0, 32], [0, 100, 24], [0, 0, 1]], np.float32)


def _pose(i):
    p = np.eye(4, dtype=np.float32)
    p[:3, 3] = [i * 0.1, 0.0, 0.0]
    return p


def test_z_far_defaults_match_reference():
    """Each reference loader hard-codes its own z_far (`arkitscenes.py:35`,
    `hypersim.py:53`, `vkitti.py:32`, `waymo.py:31`, `kubric.py:32`,
    `uasol.py:33`, `spring.py:30`, `bedlam.py:37`, `unreal4k.py:36`,
    `wildrgb.py:35`, `megadepth.py:37`, `replica.py:388`,
    `pointodyssey.py:341`)."""
    from iggt_official_tpu.data.datasets import DATASETS

    expected = {
        "ARKitScenes": 20, "ARKitScenesHigh": 20, "Hypersim": 200,
        "Vkitti": 655, "Waymo": 655, "Kubric": 1000, "Uasol": 20,
        "Spring": 200, "Bedlam": 200, "Unreal4k": 1000, "Wildrgb": 50,
        "MegaDepth": 1000, "Replica": 80, "PointOdyssey": 80,
        "Dynamic_Replica": 100, "Scannet": 100,
    }
    for name, zf in expected.items():
        assert DATASETS[name].z_far_default == zf, name


def test_hypersim_flat_layout_and_broken_scenes(tmp_path):
    """`hypersim.py:25-45,128-176`: flat <scene>/<sub>/ dirs (png rgb +
    npy depth + npz cams) and the broken_scenes skip list."""
    from iggt_official_tpu.data.datasets import Hypersim

    for scene in ["ai_001_001", "ai_003_001"]:  # second one is broken
        d = tmp_path / "hs" / "scans" / scene / "cam_00"
        os.makedirs(d)
        for i in range(24):
            PIL.Image.new("RGB", (64, 48)).save(d / f"f{i:04d}.png")
            np.save(d / f"f{i:04d}.npy", np.full((48, 64), 2.0, np.float32))
            np.savez(d / f"f{i:04d}.npz", pose=_pose(i), intrinsics=_K)
    ds = Hypersim(str(tmp_path / "hs"), resolution=(64, 48))
    assert len(ds) == 24  # ai_003_001 skipped
    assert ds.z_far == 200
    views = ds._get_views(0, 2, (64, 48), np.random.default_rng(0))
    assert views[0]["depthmap"].shape == (48, 64)


def test_pointodyssey_anno_npz_and_depth_encoding(tmp_path):
    """`pointodyssey.py:95-110,160-174`: one anno.npz per sequence with
    world->cam extrinsics (inverted at load) and uint16/65535*1000 depth."""
    import cv2

    from iggt_official_tpu.data.datasets import PointOdyssey

    d = tmp_path / "po" / "scans" / "seq0"
    os.makedirs(d / "rgbs")
    os.makedirs(d / "depths")
    w2cs = []
    for i in range(24):
        PIL.Image.new("RGB", (64, 48)).save(d / "rgbs" / f"f{i:04d}.jpg")
        cv2.imwrite(str(d / "depths" / f"f{i:04d}.png"),
                    np.full((48, 64), 655, np.uint16))
        w2cs.append(np.linalg.inv(_pose(i)))
    np.savez(d / "anno.npz",
             extrinsics=np.stack(w2cs).astype(np.float32),
             pix_T_cams=np.stack([_K] * 24))
    ds = PointOdyssey(str(tmp_path / "po"), resolution=(64, 48))
    assert len(ds) == 24
    np.testing.assert_allclose(ds.all_extrinsic[3], _pose(3), atol=1e-6)
    v = ds._get_views(0, 1, (64, 48), np.random.default_rng(0))
    np.testing.assert_allclose(
        v[0]["depthmap"][0, 0], 655 / 65535 * 1000, rtol=1e-5
    )


def test_kubric_dense_npy_blender_poses_and_depth_range(tmp_path):
    """`kubric.py:110-152,176-179`: per-scene <scene>_dense.npy with
    Blender matrix_world (Y/Z column flip to OpenCV) and depth decoded as
    min + raw*(max-min)/65535."""
    import cv2

    from iggt_official_tpu.data.datasets import Kubric

    d = tmp_path / "ku" / "scans" / "sc0"
    os.makedirs(d / "frames")
    os.makedirs(d / "depths")
    flip = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
    blender = []
    for i in range(24):
        PIL.Image.new("RGB", (64, 48)).save(d / "frames" / f"f{i:04d}.png")
        cv2.imwrite(str(d / "depths" / f"f{i:04d}.png"),
                    np.full((48, 64), 32767, np.uint16))
        blender.append(_pose(i) @ np.linalg.inv(flip))
    np.save(d / "sc0_dense.npy",
            dict(intrinsics=np.stack([_K] * 24),
                 matrix_world=np.stack(blender).astype(np.float32),
                 depth_range=(1.0, 3.0)))
    ds = Kubric(str(tmp_path / "ku"), resolution=(64, 48))
    assert len(ds) == 24
    np.testing.assert_allclose(ds.all_extrinsic[5], _pose(5), atol=1e-5)
    v = ds._get_views(0, 1, (64, 48), np.random.default_rng(0))
    np.testing.assert_allclose(
        v[0]["depthmap"][0, 0], 1.0 + 32767 * 2 / 65535, rtol=1e-4
    )


def test_sintel_dpt_cam_and_dynamic_masks(tmp_path):
    """`sintel.py:20-47,93-133,185-214`: TAG_FLOAT .dpt depth, .cam
    cameras (w2c inverted to c2w) from parallel trees, dynamic masks."""
    from iggt_official_tpu.data.datasets import Sintel, sintel_depth_write

    for sub in ["clean", "depth", "camdata_left", "dynamic_label_perfect"]:
        os.makedirs(tmp_path / "si" / sub / "alley_1")
    for i in range(4):
        PIL.Image.new("RGB", (64, 48)).save(
            tmp_path / "si" / "clean" / "alley_1" / f"frame_{i:04d}.png")
        sintel_depth_write(
            str(tmp_path / "si" / "depth" / "alley_1" / f"frame_{i:04d}.dpt"),
            np.full((48, 64), 3.0, np.float32))
        with open(tmp_path / "si" / "camdata_left" / "alley_1"
                  / f"frame_{i:04d}.cam", "wb") as f:
            np.asarray([202021.25], np.float32).tofile(f)
            _K.astype(np.float64).tofile(f)
            np.linalg.inv(_pose(i))[:3].astype(np.float64).tofile(f)
        PIL.Image.fromarray(np.zeros((48, 64), np.uint8)).save(
            tmp_path / "si" / "dynamic_label_perfect" / "alley_1"
            / f"frame_{i:04d}.png")
    ds = Sintel(str(tmp_path / "si"), resolution=(64, 48))
    assert len(ds) == 4
    np.testing.assert_allclose(ds.all_extrinsic[2], _pose(2), atol=1e-5)
    v = ds._get_views(0, 1, (64, 48), np.random.default_rng(0))
    np.testing.assert_allclose(v[0]["depthmap"][0, 0], 3.0)
    assert not v[0]["dynamic_mask"].any()  # all-zero mask -> all static


def test_replica_json_cams(tmp_path):
    """`replica.py:105-120,169-190`: jpeg rgb + exr depth + per-frame json
    cameras (camera_intrinsics + R/t_cam2world) in one flat dir."""
    import json as _json

    from iggt_official_tpu.data.datasets import Replica

    class ReplicaNpy(Replica):  # avoid exr IO in the fixture
        depth_ext = "*.npy"
        depth_mode = "npy"

    d = tmp_path / "re" / "scans" / "room0"
    os.makedirs(d)
    for i in range(24):
        PIL.Image.new("RGB", (64, 48)).save(d / f"f{i:04d}.jpeg")
        np.save(d / f"f{i:04d}.npy", np.full((48, 64), 2.0, np.float32))
        p = _pose(i)
        with open(d / f"f{i:04d}.json", "w", encoding="utf-8") as f:
            _json.dump(dict(camera_intrinsics=_K.tolist(),
                            R_cam2world=p[:3, :3].tolist(),
                            t_cam2world=p[:3, 3].tolist()), f)
    ds = ReplicaNpy(str(tmp_path / "re"), resolution=(64, 48))
    assert len(ds) == 24 and ds.z_far == 80
    np.testing.assert_allclose(ds.all_extrinsic[7], _pose(7), atol=1e-6)


def test_habitat_basis_subdir(tmp_path):
    """`habitat.py:99-113`: frames live under the `<hash>.basis/` subdir
    derived from the sequence dir name's trailing dash component."""
    import json as _json

    from iggt_official_tpu.data.datasets import Habitat

    class HabitatNpy(Habitat):
        depth_ext = "*.npy"
        depth_mode = "npy"

    d = tmp_path / "hb" / "scans" / "00001-abcdef" / "abcdef.basis"
    os.makedirs(d)
    for i in range(24):
        PIL.Image.new("RGB", (64, 48)).save(d / f"f{i:04d}.jpeg")
        np.save(d / f"f{i:04d}.npy", np.full((48, 64), 2.0, np.float32))
        p = _pose(i)
        with open(d / f"f{i:04d}.json", "w", encoding="utf-8") as f:
            _json.dump(dict(camera_intrinsics=_K.tolist(),
                            R_cam2world=p[:3, :3].tolist(),
                            t_cam2world=p[:3, 3].tolist()), f)
    ds = HabitatNpy(str(tmp_path / "hb"), resolution=(64, 48))
    assert len(ds) == 24


def test_arkitscenes_metadata_npz(tmp_path):
    """`arkitscenes.py:108-135`: frame names from the metadata npz `images`
    list (rgb renamed .png->.jpg under vga_wide/), mm/1000 depth, z_far
    20."""
    import cv2

    from iggt_official_tpu.data.datasets import ARKitScenes

    d = tmp_path / "ak" / "scans" / "sc0"
    os.makedirs(d / "vga_wide")
    os.makedirs(d / "lowres_depth")
    names = [f"f{i:04d}.png" for i in range(24)]
    for n in names:
        PIL.Image.new("RGB", (64, 48)).save(
            d / "vga_wide" / n.replace(".png", ".jpg"))
        cv2.imwrite(str(d / "lowres_depth" / n),
                    np.full((48, 64), 2000, np.uint16))
    np.savez(d / "new_scene_metadata.npz",
             images=np.array(names),
             trajectories=np.stack([_pose(i) for i in range(24)]),
             intrinsics=np.stack([_K] * 24))
    ds = ARKitScenes(str(tmp_path / "ak"), resolution=(64, 48))
    assert len(ds) == 24 and ds.z_far == 20
    v = ds._get_views(0, 1, (64, 48), np.random.default_rng(0))
    np.testing.assert_allclose(v[0]["depthmap"][0, 0], 2.0)


def test_vkitti_nesting_scale_and_sky_sentinel(tmp_path):
    """`vkitti.py:109-145,225-235`: 3-level nesting, flat dirs, cm-scaled
    uint16 `*depth.png`, readings >= 655 m set to the -1 sky sentinel."""
    import cv2

    from iggt_official_tpu.data.datasets import Vkitti

    d = tmp_path / "vk" / "scans" / "Scene01" / "clone" / "frames"
    os.makedirs(d)
    for i in range(24):
        PIL.Image.new("RGB", (64, 48)).save(d / f"rgb_{i:05d}.jpg")
        dep = np.full((48, 64), 500, np.uint16)
        dep[0, 0] = 65535  # 655.35 m -> sky
        cv2.imwrite(str(d / f"{i:05d}depth.png"), dep)
        np.savez(d / f"cam_{i:05d}.npz",
                 camera_pose=_pose(i), camera_intrinsics=_K)
    ds = Vkitti(str(tmp_path / "vk"), resolution=(64, 48))
    assert len(ds) == 24 and ds.z_far == 655
    v = ds._get_views(0, 1, (64, 48), np.random.default_rng(0))
    assert v[0]["depthmap"].min() == -1.0
    assert np.sort(np.unique(v[0]["depthmap"]))[-1] == pytest.approx(5.0)


def test_mapfree_sky_mask_zeroing(tmp_path):
    """`mapfree.py:121-155,230-243`: nested rgb/depth/cam + sky_mask jpgs
    zeroing depth where nonzero, 98th-percentile threshold."""
    import cv2

    from iggt_official_tpu.data.datasets import MapFree

    d = tmp_path / "mf" / "scans" / "s0" / "seq0"
    for sub in ["rgb", "depth", "cam", "sky_mask"]:
        os.makedirs(d / sub)
    for i in range(24):
        PIL.Image.new("RGB", (64, 48)).save(d / "rgb" / f"f{i:04d}.jpg")
        np.save(d / "depth" / f"f{i:04d}.npy",
                np.full((48, 64), 4.0, np.float32))
        np.savez(d / "cam" / f"f{i:04d}.npz", pose=_pose(i), intrinsic=_K)
        sky = np.zeros((48, 64), np.uint8)
        sky[:8] = 255
        cv2.imwrite(str(d / "sky_mask" / f"f{i:04d}.jpg"), sky)
    ds = MapFree(str(tmp_path / "mf"), resolution=(64, 48))
    assert len(ds) == 24
    v = ds._get_views(0, 1, (64, 48), np.random.default_rng(0))
    dep = v[0]["depthmap"]
    assert (dep[:8] == 0).all() and (dep[10:] > 0).all()


def test_infinigen_layout_and_instance_ids(tmp_path):
    """`infinigen.py:127-175,381-414`: frames/{Image,Depth,camview,
    ObjectSegmentation}/camera_0 tree, camview npz `T`/`K` keys, object
    segmentation attached as compacted ``instance_ids``."""
    from iggt_official_tpu.data.datasets import Infinigen

    d = tmp_path / "ig" / "scans" / "scene_a" / "sub0" / "frames"
    for sub in ["Image", "Depth", "camview", "ObjectSegmentation"]:
        os.makedirs(d / sub / "camera_0")
    for i in range(24):
        PIL.Image.new("RGB", (64, 48)).save(
            d / "Image" / "camera_0" / f"Image_{i:04d}.png")
        np.save(d / "Depth" / "camera_0" / f"Depth_{i:04d}.npy",
                np.full((48, 64), 2.0, np.float32))
        np.savez(d / "camview" / "camera_0" / f"camview_{i:04d}.npz",
                 T=_pose(i), K=_K)
        seg = np.zeros((48, 64), np.int64)
        seg[:, 32:] = 987654321  # raw object hash ids
        np.save(d / "ObjectSegmentation" / "camera_0"
                / f"ObjectSegmentation_{i:04d}.npy", seg)
    ds = Infinigen(str(tmp_path / "ig"), resolution=(64, 48))
    assert len(ds) == 24
    v = ds._get_views(0, 1, (64, 48), np.random.default_rng(0))
    assert set(np.unique(v[0]["instance_ids"])) == {0, 1}


def test_unreal4k_axis_swap(tmp_path):
    """`unreal4k.py:25,113-141`: nested flat dirs, npz `cam2world`
    premultiplied by the x<->y swap R_conv."""
    from iggt_official_tpu.data.datasets import Unreal4k

    R_conv = np.array(
        [[0, 1, 0, 0], [1, 0, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]], np.float32
    )
    d = tmp_path / "u4" / "scans" / "s0" / "sub0"
    os.makedirs(d)
    for i in range(24):
        PIL.Image.new("RGB", (64, 48)).save(d / f"f{i:04d}.png")
        np.save(d / f"f{i:04d}.npy", np.full((48, 64), 2.0, np.float32))
        np.savez(d / f"cam_{i:04d}.npz",
                 cam2world=np.linalg.inv(R_conv) @ _pose(i), intrinsics=_K)
    ds = Unreal4k(str(tmp_path / "u4"), resolution=(64, 48))
    assert len(ds) == 24
    np.testing.assert_allclose(ds.all_extrinsic[4], _pose(4), atol=1e-6)


def test_carla_shared_params_and_time_dirs(tmp_path):
    """`carla.py:55-67,160-195`: per-scene params/ json cameras shared
    across <time>/rgb|depth captures, UE->OpenCV diag(1,-1,-1) flip,
    uint16 depth at 65535/1000 m."""
    import cv2
    import json as _json

    from iggt_official_tpu.data.datasets import Carla

    d = tmp_path / "ca" / "scans" / "town0"
    os.makedirs(d / "params")
    rot = np.eye(4, dtype=np.float32)
    rot[1, 1] = rot[2, 2] = -1
    for c in range(3):
        with open(d / "params" / f"camera_{c}.json", "w",
                  encoding="utf-8") as f:
            _json.dump(dict(intrinsic=_K.tolist(),
                            extrinsic=(rot @ _pose(c)).tolist()), f)
    for t in ["000", "001"]:
        os.makedirs(d / t / "rgb")
        os.makedirs(d / t / "depth")
        for c in range(3):
            PIL.Image.new("RGB", (64, 48)).save(
                d / t / "rgb" / f"camera_{c}.png")
            cv2.imwrite(str(d / t / "depth" / f"camera_{c}.png"),
                        np.full((48, 64), 6554, np.uint16))
    ds = Carla(str(tmp_path / "ca"), resolution=(64, 48))
    assert len(ds) == 6
    np.testing.assert_allclose(ds.all_extrinsic[1], _pose(1), atol=1e-6)
    v = ds._get_views(0, 1, (64, 48), np.random.default_rng(0))
    np.testing.assert_allclose(
        v[0]["depthmap"][0, 0], 6554 / 65535 * 1000, rtol=1e-4
    )


def test_wildrgb_scenes_glob_and_mm_depth(tmp_path):
    """`wildrgb.py:116-147,228-231`: */scenes/* nesting, metadata npz
    `camera_pose`/`camera_intrinsics`, mm/1000 png depth, z_far 50."""
    import cv2

    from iggt_official_tpu.data.datasets import Wildrgb

    d = tmp_path / "wr" / "scans" / "cat0" / "scenes" / "sc0"
    for sub in ["rgb", "depth", "metadata"]:
        os.makedirs(d / sub)
    for i in range(24):
        PIL.Image.new("RGB", (64, 48)).save(d / "rgb" / f"f{i:04d}.jpg")
        cv2.imwrite(str(d / "depth" / f"f{i:04d}.png"),
                    np.full((48, 64), 3000, np.uint16))
        np.savez(d / "metadata" / f"f{i:04d}.npz",
                 camera_pose=_pose(i), camera_intrinsics=_K)
    ds = Wildrgb(str(tmp_path / "wr"), resolution=(64, 48))
    assert len(ds) == 24 and ds.z_far == 50
    v = ds._get_views(0, 1, (64, 48), np.random.default_rng(0))
    np.testing.assert_allclose(v[0]["depthmap"][0, 0], 3.0)


def test_tartanair_flat_depth_suffix(tmp_path):
    """`tartanair.py:116-145`: flat sequence dirs, *.png rgb with
    `*depth.npy` depth and per-frame `camera_pose` npz."""
    from iggt_official_tpu.data.datasets import TarTanAir

    d = tmp_path / "ta" / "scans" / "seq0"
    os.makedirs(d)
    for i in range(24):
        PIL.Image.new("RGB", (64, 48)).save(d / f"{i:04d}.png")
        np.save(d / f"{i:04d}depth.npy", np.full((48, 64), 5.0, np.float32))
        np.savez(d / f"{i:04d}.npz",
                 camera_pose=_pose(i), camera_intrinsics=_K)
    ds = TarTanAir(str(tmp_path / "ta"), resolution=(64, 48))
    assert len(ds) == 24
    v = ds._get_views(0, 1, (64, 48), np.random.default_rng(0))
    np.testing.assert_allclose(v[0]["depthmap"][0, 0], 5.0)


def _make_kubric_scene(root):
    import cv2

    d = root / "ku" / "scans" / "sc0"
    os.makedirs(d / "frames")
    os.makedirs(d / "depths")
    flip = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
    blender = []
    for i in range(24):
        PIL.Image.new("RGB", (64, 48)).save(d / "frames" / f"f{i:04d}.png")
        cv2.imwrite(str(d / "depths" / f"f{i:04d}.png"),
                    np.full((48, 64), 32767, np.uint16))
        blender.append(_pose(i) @ np.linalg.inv(flip))
    np.save(d / "sc0_dense.npy",
            dict(intrinsics=np.stack([_K] * 24),
                 matrix_world=np.stack(blender).astype(np.float32),
                 depth_range=(1.0, 3.0)))
    return str(root / "ku")


def test_index_cache_preserves_subclass_aux_lists(tmp_path, monkeypatch):
    """A cache hit must restore the subclass auxiliary per-frame lists
    (Kubric.depth_ranges & co) alongside the index — a cold cache load
    previously left them empty and the first depth fetch crashed."""
    from iggt_official_tpu.data.datasets import Kubric

    root = _make_kubric_scene(tmp_path)
    monkeypatch.chdir(tmp_path)
    ds1 = Kubric(root, resolution=(64, 48), use_cache=True)
    assert len(ds1.depth_ranges) == 24
    ds2 = Kubric(root, resolution=(64, 48), use_cache=True)
    assert list(ds2.depth_ranges) == list(ds1.depth_ranges)
    v1 = ds1._get_views(0, 1, (64, 48), np.random.default_rng(0))
    v2 = ds2._get_views(0, 1, (64, 48), np.random.default_rng(0))
    np.testing.assert_allclose(v2[0]["depthmap"], v1[0]["depthmap"])
    # a cache written without the aux sidecar (pre-fix format) is treated
    # as stale: the directory rescan repopulates instead of desyncing
    aux_f = (tmp_path / "annotations" / "kubric_annotations" / "scans"
             / "aux_lists.json")
    os.remove(aux_f)
    ds3 = Kubric(root, resolution=(64, 48), use_cache=True)
    assert len(ds3.depth_ranges) == 24
    v3 = ds3._get_views(0, 1, (64, 48), np.random.default_rng(0))
    np.testing.assert_allclose(v3[0]["depthmap"], v1[0]["depthmap"])


def test_sintel_positional_dset(tmp_path):
    """`Sintel(root, 'clean')` with dset passed positionally must bind it
    once (the earlier *args signature forwarded it twice -> TypeError)."""
    from iggt_official_tpu.data.datasets import Sintel, sintel_depth_write

    for sub in ["clean", "depth", "camdata_left"]:
        os.makedirs(tmp_path / "si" / sub / "alley_1")
    for i in range(2):
        PIL.Image.new("RGB", (64, 48)).save(
            tmp_path / "si" / "clean" / "alley_1" / f"frame_{i:04d}.png")
        sintel_depth_write(
            str(tmp_path / "si" / "depth" / "alley_1" / f"frame_{i:04d}.dpt"),
            np.full((48, 64), 3.0, np.float32))
        with open(tmp_path / "si" / "camdata_left" / "alley_1"
                  / f"frame_{i:04d}.cam", "wb") as f:
            np.asarray([202021.25], np.float32).tofile(f)
            _K.astype(np.float64).tofile(f)
            np.linalg.inv(_pose(i))[:3].astype(np.float64).tofile(f)
    ds = Sintel(str(tmp_path / "si"), "clean", resolution=(64, 48))
    assert len(ds) == 2 and ds._dset_name == "clean"


def test_list_tsv_shards_unnumbered(tmp_path):
    """Unnumbered tsv files load in a full-range (single-worker) listing
    but stay out of partitioned subsets, so subset workers never all
    duplicate the same shard (`sa1b_image.py:154-157`)."""
    from iggt_official_tpu.data.tsv import list_tsv_shards

    for name in ["data.tsv", "sa1b_0.tsv", "sa1b_1.tsv"]:
        (tmp_path / name).write_text("k\tv\n")
    full = [os.path.basename(p) for p in list_tsv_shards(str(tmp_path))]
    assert full == ["data.tsv", "sa1b_0.tsv", "sa1b_1.tsv"]
    part = [os.path.basename(p)
            for p in list_tsv_shards(str(tmp_path), 0, 1)]
    assert part == ["sa1b_0.tsv"]
