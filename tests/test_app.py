"""App surface: image loading, GLB export, end-to-end scene processing."""

import os
import struct

import numpy as np
import pytest
import PIL.Image
from PIL import Image

from iggt_official_tpu.config import ClusteringConfig, ModelConfig, RuntimeConfig
from iggt_official_tpu.utils.glb import predictions_to_glb
from iggt_official_tpu.utils.images import load_and_preprocess_images


def _write_jpg(path, w, h, seed):
    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(path)


def test_load_and_preprocess_modes(tmp_path):
    p1 = tmp_path / "a.jpg"
    _write_jpg(p1, 640, 480, 0)

    out = load_and_preprocess_images([str(p1)], mode="crop")
    assert out.shape[0] == 1 and out.shape[3] == 3
    assert out.shape[2] == 518  # width fixed
    assert out.shape[1] % 14 == 0
    assert 0.0 <= out.min() and out.max() <= 1.0

    out = load_and_preprocess_images([str(p1)], mode="pad")
    assert out.shape[1:3] == (518, 518)

    out = load_and_preprocess_images(
        [str(p1)], mode="resize", resize_target_size=(504, 336)
    )
    assert out.shape[1:3] == (336, 504)

    with pytest.raises(ValueError):
        load_and_preprocess_images([], mode="crop")
    with pytest.raises(ValueError):
        load_and_preprocess_images([str(p1)], mode="resize")


def test_load_rgba_composites_white(tmp_path):
    p = tmp_path / "t.png"
    arr = np.zeros((28, 28, 4), np.uint8)  # fully transparent
    Image.fromarray(arr, "RGBA").save(p)
    out = load_and_preprocess_images(
        [str(p)], mode="resize", resize_target_size=(28, 28)
    )
    assert out.min() > 0.99  # transparent -> white


def test_glb_export_valid_container(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 1, (2, 8, 8, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32)
    conf = rng.uniform(1, 2, (2, 8, 8)).astype(np.float32)
    ext = np.tile(np.eye(4)[:3], (2, 1, 1)).astype(np.float32)
    path = tmp_path / "scene.glb"
    predictions_to_glb(pts, cols, conf=conf, extrinsics=ext,
                       conf_threshold=0.3, path=str(path))
    data = path.read_bytes()
    magic, version, total = struct.unpack("<III", data[:12])
    assert magic == 0x46546C67 and version == 2 and total == len(data)
    json_len, json_type = struct.unpack("<II", data[12:20])
    assert json_type == 0x4E4F534A
    import json as _json

    gltf = _json.loads(data[20 : 20 + json_len])
    assert gltf["asset"]["version"] == "2.0"
    modes = [m["primitives"][0]["mode"] for m in gltf["meshes"]]
    assert 0 in modes  # the point cloud
    assert modes.count(4) == 2  # two camera frusta


def _make_scene(tmp_path, S=2, W=56, H=42):
    import cv2

    scene = tmp_path / "scene"
    for sub in ("images", "depth", "cam"):
        os.makedirs(scene / sub)
    rng = np.random.default_rng(0)
    for i in range(S):
        _write_jpg(scene / "images" / f"{i:04d}.jpg", W, H, i)
        depth_mm = rng.integers(500, 3000, (H, W)).astype(np.uint16)
        cv2.imwrite(str(scene / "depth" / f"{i:04d}.png"), depth_mm)
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 0.1 * i
        K = np.array(
            [[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]], np.float32
        )
        np.savez(scene / "cam" / f"{i:04d}.npz", pose=pose, intrinsics=K)
    return scene


def test_processor_end_to_end_tiny(tmp_path):
    """Full scene pipeline with a tiny random-weight model + synthetic GT."""
    from iggt_official_tpu.app.demo import IGGTProcessor

    scene = _make_scene(tmp_path)
    save_dir = tmp_path / "out"

    cfg = ModelConfig().scaled(
        embed_dim=32, depth=2, num_heads=2, img_size=56, patch_embed="conv"
    )
    runtime = RuntimeConfig(
        image_size=(56, 42),
        clustering=ClusteringConfig(
            eps=0.2, min_samples=5, min_cluster_size=10, knn_k=4
        ),
        use_flash_attention=False,
    )
    proc = IGGTProcessor(model_path=None, model_cfg=cfg, runtime=runtime)
    results = proc.process_scene(str(scene), str(save_dir))

    preds = results["predictions"]
    assert preds["depth"].shape == (2, 42, 56, 1)
    assert preds["extrinsic"].shape == (2, 3, 4)
    assert preds["instance_masks"].shape == (2, 42, 56)
    assert os.path.exists(save_dir / "predictions.npz")
    assert os.path.exists(save_dir / "scene_rgb.glb")
    assert os.path.exists(save_dir / "scene_mask.glb")
    assert os.path.exists(save_dir / "scene_pca.glb")
    assert os.path.exists(save_dir / "evaluation_report.json")
    assert "evaluation" in results
    assert np.isfinite(
        results["evaluation"]["summary"]["depth"]["absrel"]
    )


def test_sky_mask_heuristic_and_cache(tmp_path):
    from iggt_official_tpu.utils.sky import (
        load_or_compute_sky_masks,
        segment_sky_heuristic,
    )

    H, W = 48, 64
    img = np.zeros((H, W, 3), np.uint8)
    img[: H // 2] = [140, 180, 245]          # smooth bright blue sky on top
    rng = np.random.default_rng(0)
    img[H // 2 :] = rng.integers(20, 120, (H - H // 2, W, 3))  # textured ground

    keep = segment_sky_heuristic(img)
    assert keep.shape == (H, W) and keep.dtype == np.uint8
    assert (keep[: H // 4] == 0).mean() > 0.9        # sky dropped
    assert (keep[3 * H // 4 :] == 255).mean() > 0.9  # ground kept

    scene = tmp_path / "scene"
    os.makedirs(scene / "images")
    for i in range(2):
        PIL.Image.fromarray(img).save(scene / "images" / f"{i:03d}.png")
    masks = load_or_compute_sky_masks(str(scene), (24, 32))
    assert masks.shape == (2, 24, 32)
    assert set(np.unique(masks)) <= {0.0, 1.0}
    assert masks[:, :4].mean() < 0.1 and masks[:, -4:].mean() > 0.9
    # cached files are reused on the second call
    assert sorted(os.listdir(scene / "sky_masks")) == ["000.png", "001.png"]
    masks2 = load_or_compute_sky_masks(str(scene), (24, 32))
    np.testing.assert_array_equal(masks, masks2)


def test_sky_heuristic_golden_floors():
    """Accuracy floors vs the hand-annotated golden masks checked into
    tests/data/sky_golden (built by benchmarks/measure_sky.py from the
    demo scenes; encoding 0=sky, 255=non-sky, 128=don't-care).  Guards
    against heuristic regressions: mean sky recall and the indoor
    false-positive rate are the two numbers that matter for GLB export
    parity (`visual_util.py:112-159` semantics)."""
    from iggt_official_tpu.utils.sky import segment_sky_heuristic

    golden_dir = os.path.join(
        os.path.dirname(__file__), "data", "sky_golden"
    )
    demo = "/root/reference/iggt_demo"
    if not os.path.isdir(demo):
        pytest.skip("demo scenes unavailable")
    rels = {
        "demo1__059ea665922dfdc543d7bdfba8da1a96.png":
            "demo1/images/059ea665922dfdc543d7bdfba8da1a96.jpg",
        "demo1__2096ab3582533634fe162b9a47ae21ab.png":
            "demo1/images/2096ab3582533634fe162b9a47ae21ab.jpg",
        "demo1__c636b1bbcaa1163de0b0ad0e73fa35fa.png":
            "demo1/images/c636b1bbcaa1163de0b0ad0e73fa35fa.jpg",
        "demo5__00011_3.png": "demo5/images/00011_3.jpg",
        "demo9__00000.png": "demo9/images/00000.jpg",
        "demo4__1.png": "demo4/images/1.png",
        "demo7__sample_06_frame_72.png":
            "demo7/images/sample_06_frame_72.jpg",
    }
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "measure_sky",
        os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                     "measure_sky.py"),
    )
    measure_sky = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(measure_sky)

    # floors per photometric variant (benchmarks/sky_deltas.json): the
    # round-4 sunset/night branches must keep working, and the original
    # frames must not regress below the round-3 numbers.  FP floors are
    # looser on the variants — demo5's cool bright walls under night/
    # overcast grading are the documented irreducible bait.
    floors = {
        "orig": (0.90, 0.03),
        "sunset": (0.90, 0.05),
        "night": (0.90, 0.08),
        "overcast": (0.90, 0.06),
        # round-5 branches (benchmarks/sky_deltas.json): moonless
        # light-polluted night (0.9497 / 0.0096 measured) and the
        # sky-dominant reframes (0.777 / <0.01 — the wire-heavy demo1
        # frame's non-top-connected sky bands are the documented
        # conservative miss, so the recall floor sits lower)
        "warm_night": (0.90, 0.03),
        "skyfill": (0.70, 0.03),
        "skyfill_warm_night": (0.70, 0.03),
    }

    def geo_case(gtf, photo_tf, img, golden):
        if photo_tf is not None:
            img = photo_tf(img)
        return gtf(img, golden)

    cases = {variant: (tf, None) for variant, tf in
             measure_sky.VARIANTS.items()}
    cases["skyfill"] = (None, measure_sky._skyfill)
    cases["skyfill_warm_night"] = (
        measure_sky._warm_night, measure_sky._skyfill)
    for variant, (tf, gtf) in cases.items():
        recalls, fp_rates = [], []
        for golden_name, rel in rels.items():
            golden = np.asarray(
                PIL.Image.open(os.path.join(golden_dir, golden_name))
            )
            img = np.asarray(
                PIL.Image.open(os.path.join(demo, rel)).convert("RGB")
            )
            if gtf is not None:
                img, golden = geo_case(gtf, tf, img, golden)
            elif tf is not None:
                img = tf(img)
            pred_sky = segment_sky_heuristic(img) == 0
            gt_sky, gt_non = golden == 0, golden == 255
            if gt_sky.any():
                recalls.append((pred_sky & gt_sky).sum() / gt_sky.sum())
            fp_rates.append((pred_sky & gt_non).sum() / max(gt_non.sum(), 1))
        min_recall, max_fp = floors[variant]
        assert np.mean(recalls) > min_recall, (
            f"{variant} sky recall regressed: {recalls}")
        assert np.mean(fp_rates) < max_fp, (
            f"{variant} sky FP rate regressed: {fp_rates}")


def test_depth_visualizations_full_set(tmp_path):
    from iggt_official_tpu.app.demo import IGGTProcessor

    rng = np.random.default_rng(0)
    depths = rng.uniform(0.5, 4.0, (2, 24, 32)).astype(np.float32)
    IGGTProcessor._save_depth_visualizations(
        IGGTProcessor.__new__(IGGTProcessor), depths, str(tmp_path)
    )
    d = tmp_path / "depth_vis"
    for mode in ["jet", "viridis", "plasma", "turbo"]:
        assert (d / f"depth_0000_{mode}.png").exists()
    assert (d / "depth_0000_with_scale.png").exists()
    assert (d / "colormap_comparison.png").exists()
    assert (d / "depth_statistics.npy").exists()
    assert (d / "depth_animation.gif").exists()
    stats = np.load(d / "depth_statistics.npy", allow_pickle=True).item()
    assert 0 < stats["min"] < stats["max"]
    grid = np.asarray(PIL.Image.open(d / "colormap_comparison.png"))
    assert grid.shape == (24, 32 * 4, 3)


def test_train_cli_smoke(tmp_path, monkeypatch):
    """`python -m iggt_official_tpu.app.train` end to end on a synthetic
    SceneDir dataset: dataset-expression loader -> mesh train loop ->
    checkpoint on disk (the reference never released its train script,
    `README.md:37-42`)."""
    import cv2
    from scipy.spatial.transform import Rotation

    from iggt_official_tpu.app.train import main

    rng = np.random.default_rng(0)
    root = tmp_path / "scannet"
    seq = root / "scans" / "scene0000"
    for sub in ("color", "depth", "cam"):
        os.makedirs(seq / sub)
    W = H = 28
    for i in range(26):
        img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        PIL.Image.fromarray(img).save(seq / "color" / f"{i:04d}.jpg")
        cv2.imwrite(str(seq / "depth" / f"{i:04d}.png"),
                    rng.integers(500, 3000, (H, W)).astype(np.uint16))
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = Rotation.from_rotvec([0, 0.02 * i, 0]).as_matrix()
        pose[:3, 3] = [0.05 * i, 0, 0]
        K = np.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]],
                     np.float32)
        np.savez(seq / "cam" / f"{i:04d}.npz", pose=pose, intrinsics=K)

    ckpt = tmp_path / "ckpt"
    main([
        "--dataset", f"Scannet({str(root)!r}, resolution=(28, 28), seed=7)",
        "--steps", "2", "--batch_size", "2",
        "--seq_min_len", "2", "--seq_max_len", "2",
        "--model", "vggt", "--embed_dim", "32", "--depth", "2",
        "--num_heads", "2", "--img_size", "28", "--patch_embed", "conv",
        "--warmup_steps", "1", "--n_data", "1",
        "--checkpoint_dir", str(ckpt), "--checkpoint_every", "2",
        "--log_every", "1",
    ])
    assert any(c.startswith("step_") for c in os.listdir(ckpt))


def test_batch_eval_pipelined(tmp_path, monkeypatch):
    """app/batch_eval.py over two scenes with the prefetch pipeline: the
    worker thread's forward for scene i+1 overlaps scene i's post-process,
    and the summary aggregates both evaluations."""
    import json
    import sys

    from iggt_official_tpu.app import batch_eval

    root = tmp_path / "scenes"
    os.makedirs(root)
    for name in ("sceneA", "sceneB"):
        _make_scene(root / "x", S=2, W=56, H=42)  # _make_scene appends /scene
        os.rename(root / "x" / "scene", root / name)
        os.rmdir(root / "x")

    cfg = ModelConfig().scaled(
        embed_dim=32, depth=2, num_heads=2, img_size=56, patch_embed="conv"
    )
    monkeypatch.setattr(
        "iggt_official_tpu.app.demo.IGGTProcessor.__init__.__defaults__",
        (None, cfg, None),
        raising=False,
    )
    save = tmp_path / "out"
    argv = [
        "batch_eval", "--scenes_root", str(root), "--save_dir", str(save),
        "--preset", "small", "--image_size", "56", "42",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    batch_eval.main()

    with open(save / "summary.json") as f:
        summary = json.load(f)
    assert summary["num_scenes"] == 2
    assert summary["num_views"] == 4
    assert np.isfinite(summary["metrics"]["depth"]["absrel"])
    for name in ("sceneA", "sceneB"):
        assert os.path.exists(save / name / "predictions.npz")


def test_gate_compare_scene_units():
    """eval/gate.py metric mechanics: exact parity passes, 1%-window
    violations fail, and instance masks are recoverable from the
    reference's colored-mask format (`demo.py:398`)."""
    from iggt_official_tpu.eval.gate import (
        compare_scene, gate_report, masks_from_colored,
    )

    rng = np.random.default_rng(0)
    depth = rng.uniform(0.5, 3.0, (2, 8, 8, 1)).astype(np.float32)
    labels = np.zeros((2, 8, 8), np.int64)
    labels[:, 4:, :] = 1
    labels[:, :2, :2] = -1
    ext = np.tile(np.eye(3, 4, dtype=np.float32), (2, 1, 1))
    ext[:, 0, 3] = [0.0, 0.5]
    preds = {"depth": depth, "instance_masks": labels, "extrinsic": ext}

    # golden in the reference's format: colored masks, noise black
    colors = np.array([[0, 0, 0], [255, 40, 3], [9, 200, 120]], np.uint8)
    colored = colors[labels + 1]
    golden = {"depth": depth.copy(), "features": colored,
              "extrinsic": ext.copy()}
    assert len(masks_from_colored(colored)) == 2

    row = compare_scene(preds, golden)
    assert row["pass"]
    assert row["depth_absrel"] == 0.0
    assert row["mask_matched_miou"] == 1.0
    assert row["pose_rot_deg"] < 1e-5

    # depth off by 2% -> outside the 1% acceptance window
    bad = compare_scene({**preds, "depth": depth * 1.02}, golden)
    assert not bad["pass"] and bad["depth_absrel"] > 0.01

    # a merged instance (two golden clusters -> one of ours) fails mIoU
    merged = compare_scene(
        {**preds, "instance_masks": np.zeros_like(labels)}, golden
    )
    assert not merged["pass"]

    table, ok = gate_report({"good": row, "bad": bad})
    assert not ok and "PASS" in table and "FAIL" in table


def test_checkpoint_gate_harness(tmp_path, monkeypatch):
    """VERDICT r3 task 4: the one-command acceptance harness, end-to-end.

    Proves with a tiny model that (1) `--ckpt` routes a torch .pth through
    the converter into the processor, (2) `--gate` against a golden
    predictions.npz passes inside the 1% window and writes gate.json, and
    (3) a perturbed golden fails with exit code 1 — turnkey for the real
    checkpoint (BASELINE.json acceptance; golden source
    `/root/reference/demo.py:611-615`)."""
    import json
    import sys

    import torch

    from iggt_official_tpu.app import batch_eval
    from iggt_official_tpu.app.demo import IGGTProcessor

    root = tmp_path / "scenes"
    os.makedirs(root)
    _make_scene(root / "x", S=2, W=56, H=42)
    os.rename(root / "x" / "scene", root / "demo1")
    os.rmdir(root / "x")

    cfg = ModelConfig().scaled(
        embed_dim=32, depth=2, num_heads=2, img_size=56, patch_embed="conv"
    )
    monkeypatch.setattr(
        "iggt_official_tpu.app.demo.IGGTProcessor.__init__.__defaults__",
        (None, cfg, None),
        raising=False,
    )

    # torch checkpoint with a reference-named tensor; the converter must
    # land it on the flax slot (partial merge, strict=False — demo.py:113)
    ckpt = tmp_path / "ref.pth"
    cam_tok = np.full((1, 2, 1, 32), 0.123, np.float32)
    torch.save({"model": {"module.aggregator.camera_token":
                          torch.from_numpy(cam_tok)}}, ckpt)
    proc = IGGTProcessor(model_path=str(ckpt), model_cfg=cfg)
    loaded_tok = np.asarray(
        proc.params["params"]["aggregator"]["camera_token"])
    assert np.allclose(loaded_tok, 0.123)
    del proc

    def run(argv):
        monkeypatch.setattr(sys, "argv", ["batch_eval", *argv])
        batch_eval.main()

    # pass 1: produce the goldens (same ckpt => deterministic outputs)
    gold = tmp_path / "golden"
    run(["--scenes_root", str(root), "--save_dir", str(gold),
         "--preset", "small", "--image_size", "56", "42",
         "--ckpt", str(ckpt)])

    # pass 2: gate against them -> must pass and write gate.json
    out = tmp_path / "gated"
    run(["--scenes_root", str(root), "--save_dir", str(out),
         "--preset", "small", "--image_size", "56", "42",
         "--ckpt", str(ckpt), "--gate", "--golden_root", str(gold)])
    with open(out / "gate.json") as f:
        gate = json.load(f)
    assert gate["pass"]
    assert gate["scenes"]["demo1"]["depth_absrel"] <= 0.01

    # pass 3: perturb the golden depth by 5% -> gate exits 1
    gpath = gold / "demo1" / "predictions.npz"
    with np.load(gpath) as g:
        bad = {k: g[k] for k in g.files}
    bad["depth"] = bad["depth"] * 1.05
    np.savez(gpath, **bad)
    with pytest.raises(SystemExit):
        run(["--scenes_root", str(root), "--save_dir", str(tmp_path / "g2"),
             "--preset", "small", "--image_size", "56", "42",
             "--ckpt", str(ckpt), "--gate", "--golden_root", str(gold)])
