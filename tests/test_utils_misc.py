"""Telemetry, config loader, track visualization, COLMAP IO, train loop."""

import os

import numpy as np
import pytest

from iggt_official_tpu.utils.arguments import (
    load_config_dict_to_opt,
    load_opt_from_config_files,
)
from iggt_official_tpu.utils.logging import MetricLogger, SmoothedValue, StageTimer
from iggt_official_tpu.utils.visual_track import (
    get_track_colors_by_position,
    visualize_tracks_on_images,
)


def test_smoothed_value_stats():
    v = SmoothedValue(window_size=3)
    for x in [1.0, 2.0, 3.0, 4.0]:
        v.update(x)
    assert v.value == 4.0
    assert v.median == 3.0
    assert v.avg == 3.0
    assert v.global_avg == 2.5
    assert v.max == 4.0


def test_metric_logger_log_every():
    lines = []
    logger = MetricLogger(print_fn=lines.append)
    for i in logger.log_every(range(5), print_freq=2, header="test"):
        logger.update(loss=float(i))
    assert any("loss" in line for line in lines)
    assert logger.meters["loss"].global_avg == 2.0


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    assert t.counts["a"] == 2
    assert t.summary()["a"] >= 0


def test_config_loader(tmp_path):
    c1 = tmp_path / "a.yaml"
    c1.write_text("model.depth: 4\nmodel.dim: 64\nlr: 0.1\n")
    c2 = tmp_path / "b.yaml"
    c2.write_text("model.depth: 8\n")
    opt = load_opt_from_config_files([str(c1), str(c2)])
    assert opt == {"model": {"depth": 8, "dim": 64}, "lr": 0.1}

    load_config_dict_to_opt(opt, {"model.dim": 128})
    assert opt["model"]["dim"] == 128


def test_track_visualization(tmp_path):
    rng = np.random.default_rng(0)
    S, N, H, W = 3, 5, 32, 48
    images = rng.uniform(0, 1, (S, H, W, 3)).astype(np.float32)
    tracks = rng.uniform(5, 25, (S, N, 2)).astype(np.float32)
    vis = np.ones((S, N), bool)
    vis[0, 0] = False

    colors = get_track_colors_by_position(tracks, vis, W, H)
    assert colors.shape == (N, 3)

    frames = visualize_tracks_on_images(
        images, tracks, vis, out_dir=str(tmp_path), frames_per_row=2
    )
    assert frames.shape == (S, H, W, 3)
    assert os.path.exists(tmp_path / "frame_0000.png")
    assert os.path.exists(tmp_path / "tracks_grid.png")
    assert (frames != (images * 255).astype(np.uint8)).any()


@pytest.mark.parametrize("ext", [".bin", ".txt"])
def test_colmap_roundtrip(tmp_path, ext):
    from iggt_official_tpu.data.colmap import (
        Camera,
        Image,
        Point3D,
        qvec2rotmat,
        read_model,
        rotmat2qvec,
        write_model,
    )
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(0)
    cameras = {
        1: Camera(1, "PINHOLE", 640, 480,
                  np.array([500.0, 500.0, 320.0, 240.0])),
    }
    images = {}
    for i in range(1, 4):
        R = Rotation.random(random_state=i).as_matrix()
        q = rotmat2qvec(R)
        # image 2 has an empty track (the text format writes a blank line)
        xys = np.zeros((0, 2)) if i == 2 else rng.uniform(0, 640, (4, 2))
        p3d = (np.zeros((0,), np.int64) if i == 2
               else np.array([1, -1, 2, -1]))
        images[i] = Image(
            i, q, rng.normal(0, 1, 3), 1, f"img_{i}.jpg", xys, p3d,
        )
    points = {
        1: Point3D(1, rng.normal(0, 1, 3), np.array([255, 0, 0]), 0.5,
                   np.array([1, 2]), np.array([0, 1])),
        2: Point3D(2, rng.normal(0, 1, 3), np.array([0, 255, 0]), 0.7,
                   np.array([3]), np.array([2])),
    }
    write_model(cameras, images, points, str(tmp_path), ext=ext)
    c2, i2, p2 = read_model(str(tmp_path), ext=ext)
    assert c2[1].model == "PINHOLE"
    np.testing.assert_allclose(c2[1].params, cameras[1].params)
    for i in images:
        np.testing.assert_allclose(i2[i].qvec, images[i].qvec)
        np.testing.assert_allclose(i2[i].tvec, images[i].tvec)
        assert i2[i].name == images[i].name
        np.testing.assert_allclose(i2[i].xys, images[i].xys)
        np.testing.assert_array_equal(i2[i].point3D_ids, images[i].point3D_ids)
        # qvec2rotmat inverts rotmat2qvec
        np.testing.assert_allclose(
            qvec2rotmat(i2[i].qvec),
            Rotation.random(random_state=i).as_matrix(), atol=1e-6,
        )
    np.testing.assert_allclose(p2[1].xyz, points[1].xyz)
    np.testing.assert_array_equal(p2[2].image_ids, points[2].image_ids)


def test_train_loop_smoke(tmp_path):
    import dataclasses
    import jax.numpy as jnp

    from iggt_official_tpu.config import ModelConfig
    from iggt_official_tpu.models.vggt import IGGT
    from iggt_official_tpu.train.loop import train

    cfg = ModelConfig().scaled(
        embed_dim=32, depth=2, num_heads=2, img_size=28, patch_embed="conv"
    )
    cfg = dataclasses.replace(cfg, enable_part=False, name="vggt")
    from iggt_official_tpu.models.vggt import VGGT

    model = VGGT(cfg)
    rng = np.random.default_rng(0)
    B, S, H, W = 1, 2, 28, 28

    def batches():
        while True:
            yield {
                "images": rng.uniform(0, 1, (B, S, H, W, 3)).astype(np.float32),
                "pose_enc": rng.normal(0, 1, (B, S, 9)).astype(np.float32),
                "depth": rng.uniform(0.5, 2, (B, S, H, W, 1)).astype(np.float32),
                "world_points": rng.normal(0, 1, (B, S, H, W, 3)).astype(np.float32),
                "valid_mask": np.ones((B, S, H, W), np.float32),
            }

    logs = []
    state = train(
        model, batches(), num_steps=3,
        checkpoint_dir=str(tmp_path / "ckpt"), checkpoint_every=2,
        warmup_steps=1, log_every=1, print_fn=logs.append,
    )
    assert int(state.step) == 3
    assert any("loss/total" in l for l in logs)
    ckpts = os.listdir(tmp_path / "ckpt")
    assert any(c.startswith("step_") for c in ckpts)

    # resume from the saved checkpoint
    state2 = train(
        model, batches(), num_steps=4,
        checkpoint_dir=str(tmp_path / "ckpt"), checkpoint_every=10,
        warmup_steps=1, log_every=10, print_fn=logs.append,
    )
    assert int(state2.step) == 4
    assert any("resumed" in l for l in logs)


def test_colmap_scene_conversion(tmp_path):
    import PIL.Image
    from scipy.spatial.transform import Rotation

    from iggt_official_tpu.data.colmap import Camera, Image, rotmat2qvec, write_model
    from iggt_official_tpu.preprocess import convert_colmap_scene

    rng = np.random.default_rng(0)
    model_dir = tmp_path / "sparse"
    images_dir = tmp_path / "images"
    os.makedirs(images_dir)
    cameras = {1: Camera(1, "PINHOLE", 64, 48,
                         np.array([50.0, 50.0, 32.0, 24.0]))}
    images = {}
    depths = {}
    for i in range(1, 4):
        name = f"frame_{i}.jpg"
        PIL.Image.fromarray(
            rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        ).save(images_dir / name)
        R = Rotation.random(random_state=i).as_matrix()
        images[i] = Image(i, rotmat2qvec(R), rng.normal(0, 1, 3), 1, name,
                          np.zeros((0, 2)), np.zeros(0, np.int64))
        depths[name] = rng.uniform(0.5, 3.0, (48, 64)).astype(np.float32)
    write_model(cameras, images, {}, str(model_dir))

    n = convert_colmap_scene(str(model_dir), str(images_dir),
                             str(tmp_path / "out" / "scans"),
                             seq_name="seq0", depth_maps=depths)
    assert n == 3
    seq = tmp_path / "out" / "scans" / "seq0"
    assert len(os.listdir(seq / "color")) == 3
    assert len(os.listdir(seq / "cam")) == 3
    assert len(os.listdir(seq / "depth")) == 3
    cam = np.load(seq / "cam" / "000000.npz")
    # pose is c2w: w2c->c2w inversion round-trips
    first = sorted(images.values(), key=lambda im: im.name)[0]
    from iggt_official_tpu.data.colmap import qvec2rotmat

    R = qvec2rotmat(first.qvec)
    np.testing.assert_allclose(cam["pose"][:3, :3], R.T, atol=1e-6)
    # the converted scene loads through the standard dataset machinery
    from iggt_official_tpu.data.datasets import Scannet

    Scannet.min_frames = 2
    ds = Scannet(str(tmp_path / "out"), dset="scans", resolution=(56, 42),
                 seed=1)
    views = ds[(0, 0, 2)]
    assert len(views) == 2 and views[0]["img"].shape == (42, 56, 3)


def test_py_config_fromfile_with_base(tmp_path):
    from iggt_official_tpu.utils.config_io import Config

    (tmp_path / "base.py").write_text(
        "lr = 1e-4\nmodel = dict(depth=24, embed_dim=1024)\nepochs = 10\n"
    )
    (tmp_path / "child.py").write_text(
        "_base_ = ['base.py']\nmodel = dict(depth=12)\nwandb = False\n"
    )
    cfg = Config.fromfile(str(tmp_path / "child.py"))
    assert cfg.lr == 1e-4
    assert cfg.model.depth == 12           # child overrides
    assert cfg.model.embed_dim == 1024     # base survives deep-merge
    assert cfg.epochs == 10 and cfg.wandb is False


def test_parse_configs_cli_override(tmp_path):
    from iggt_official_tpu.utils.config_io import parse_configs, str2bool

    (tmp_path / "c.py").write_text("seed = 1\nnum_train_epochs = 5\n")
    cfg = parse_configs(["--config", str(tmp_path / "c.py"), "--seed", "7"])
    assert cfg.seed == 7                   # CLI wins when not None
    assert cfg.num_train_epochs == 5       # None flags don't override
    assert str2bool("yes") and not str2bool("0")
    import pytest as _pytest
    with _pytest.raises(Exception):
        str2bool("maybe")


def test_cfgnode_yaml_base_and_merge(tmp_path):
    from iggt_official_tpu.utils.config_io import CfgNode

    (tmp_path / "base.yaml").write_text(
        "MODEL:\n  DEPTH: 24\n  DIM: 1024\nSOLVER:\n  LR: 0.001\n"
    )
    (tmp_path / "exp.yaml").write_text(
        "_BASE_: base.yaml\nMODEL:\n  DEPTH: 12\n"
    )
    cfg = CfgNode.load_yaml_with_base(str(tmp_path / "exp.yaml"))
    assert cfg.MODEL.DEPTH == 12 and cfg.MODEL.DIM == 1024
    assert cfg.SOLVER.LR == 0.001

    cfg.merge_from_list(["SOLVER.LR", "0.01", "MODEL.HEADS", "16"])
    assert cfg.SOLVER.LR == 0.01 and cfg.MODEL.HEADS == 16

    other = CfgNode({"MODEL": {"DIM": 512}, "NEW": 1})
    cfg.merge_from_other_cfg(other)
    assert cfg.MODEL.DIM == 512 and cfg.MODEL.DEPTH == 12 and cfg.NEW == 1

    c2 = cfg.clone()
    cfg.freeze()
    assert cfg.is_frozen()
    import pytest as _pytest
    with _pytest.raises(AttributeError):
        cfg.MODEL.DEPTH = 1
    cfg.defrost()
    cfg.MODEL.DEPTH = 1
    assert c2.MODEL.DEPTH == 12            # clone is independent
