"""Offline preprocessing converters on synthetic data."""

import os

import numpy as np
import pytest

from iggt_official_tpu.data.colmap import Camera
from iggt_official_tpu.preprocess.arkitscenes import (
    closest,
    find_scene_orientation,
    read_pincam,
    read_traj,
)
from iggt_official_tpu.preprocess.ase import (
    distance_to_depth,
    transform_3d_points,
    unproject,
)
from iggt_official_tpu.preprocess.blendedmvs import convert_scene, load_cam_txt
from iggt_official_tpu.preprocess.dense import (
    read_colmap_array,
    write_colmap_array,
)
from iggt_official_tpu.preprocess.dl3dv import (
    clamp_depth,
    process_scene,
    scale_colmap_cameras,
)
from iggt_official_tpu.preprocess.scannetpp import copy_semantic_annotations


def test_colmap_dense_array_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    for shape in [(7, 5), (6, 4, 3)]:
        arr = rng.normal(0, 1, shape).astype(np.float32)
        p = str(tmp_path / "a.bin")
        write_colmap_array(arr, p)
        np.testing.assert_array_equal(read_colmap_array(p), arr.squeeze())


def test_dl3dv_clamp_depth():
    d = np.array([[0.0, -1.0, 2.0], [600.0, 0.5, 100.0]], np.float32)
    out = clamp_depth(d, min_depth=1.0, max_depth=500.0)
    np.testing.assert_array_equal(
        out, [[0.0, 0.0, 2.0], [500.0, 1.0, 100.0]]
    )
    assert clamp_depth(d, size=(6, 4)).shape == (4, 6)


def test_dl3dv_scene_extraction(tmp_path):
    depth_dir = tmp_path / "colmap" / "dense" / "stereo" / "depth_maps"
    depth_dir.mkdir(parents=True)
    img_dir = tmp_path / "images_8"
    img_dir.mkdir()
    from PIL import Image

    Image.new("RGB", (8, 6)).save(img_dir / "frame_00001.png")
    d = np.random.default_rng(1).uniform(0, 10, (12, 16)).astype(np.float32)
    write_colmap_array(d, str(depth_dir / "frame_00001.png.geometric.bin"))
    (depth_dir / "frame_00002.png.geometric.bin").write_bytes(b"")  # empty

    n = process_scene(str(tmp_path), depth_thre=8.0)
    assert n == 1
    out = np.load(tmp_path / "depths" / "frame_00001.npy")
    assert out.shape == (6, 8) and out.max() <= 8.0


def test_scale_colmap_cameras():
    cams = {
        1: Camera(1, "PINHOLE", 100, 50, np.array([80.0, 40.0, 50.0, 25.0]))
    }
    out = scale_colmap_cameras(cams, 200, 100)
    np.testing.assert_allclose(out[1].params, [160.0, 80.0, 100.0, 50.0])
    assert out[1].width == 200 and out[1].height == 100


def test_blendedmvs_cam_and_scene(tmp_path):
    # synthetic scene: 2 views, 4:3 images, known pose
    root = tmp_path / "seq"
    for sub in ("cams", "blended_images", "rendered_depth_maps"):
        (root / sub).mkdir(parents=True)
    K = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
    w2c = np.eye(4)
    w2c[:3, 3] = [1.0, 2.0, 3.0]
    for name in ("00000000", "00000001"):
        with open(root / "cams" / f"{name}_cam.txt", "w") as f:
            f.write("extrinsic\n")
            for row in w2c:
                f.write(" ".join(str(v) for v in row) + "\n")
            f.write("\nintrinsic\n")
            for row in K:
                f.write(" ".join(str(v) for v in row) + "\n")
        from PIL import Image

        Image.new("RGB", (128, 96), (100, 50, 25)).save(
            root / "blended_images" / f"{name}.jpg"
        )
        depth = np.full((96, 128), 2.5, np.float32)
        with open(root / "rendered_depth_maps" / f"{name}.pfm", "wb") as f:
            f.write(b"Pf\n128 96\n-1.0\n")
            f.write(depth[::-1].tobytes())

    k, r, t = load_cam_txt(str(root / "cams" / "00000000_cam.txt"))
    np.testing.assert_allclose(k, K)
    np.testing.assert_allclose(t, -w2c[:3, 3])  # inverse of pure translation

    out = tmp_path / "out"
    n = convert_scene(str(root), str(out), resolution=(64, 48))
    assert n == 2
    d = np.load(out / "depth" / "00000000.npy")
    assert d.shape == (48, 64)
    np.testing.assert_allclose(d, 2.5)
    cam = np.load(out / "cam" / "00000000.npz")
    # intrinsics halve with the 2x downscale
    assert abs(cam["intrinsics"][0, 0] - 50.0) < 1.0
    np.testing.assert_allclose(cam["pose"][:3, 3], -w2c[:3, 3])


def test_arkitscenes_traj_and_orientation(tmp_path):
    # identity rotation, translation (1,0,0): w2c -> c2w = (-1,0,0)
    traj = tmp_path / "lowres_wide.traj"
    traj.write_text("1000.123 0 0 0 1 0 0\n1000.456 0 0 0 2 0 0\n")
    ts, poses = read_traj(str(traj))
    assert ts == [1000.123, 1000.456]
    np.testing.assert_allclose(poses[0][:3, 3], [-1, 0, 0])

    assert closest(1000.2, ts) == 1000.123
    assert closest(1000.4, ts) == 1000.456

    pincam = tmp_path / "a.pincam"
    pincam.write_text("256 192 100.0 100.0 128.0 96.0\n")
    K = read_pincam(str(pincam))
    np.testing.assert_allclose(K[0], [100.0, 0, 128.0])

    # device held upright (device -y maps to world +z): sky UP
    up_pose = np.eye(4)
    up_pose[:3, :3] = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], float)
    label, rot = find_scene_orientation([up_pose])
    assert label == "UP"
    np.testing.assert_allclose(rot, np.eye(4), atol=1e-12)
    # rotated 90deg about the optical axis -> LEFT/RIGHT with a z-rotation
    roll = np.eye(4)
    roll[:3, :3] = np.array([[0, -1, 0], [0, 0, 1], [-1, 0, 0]], float)
    label2, rot2 = find_scene_orientation([roll @ up_pose])
    assert label2 in ("LEFT", "RIGHT")
    assert not np.allclose(rot2, np.eye(4))


def test_ase_geometry():
    K = np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]])
    dist = np.full((48, 64), 5.0)
    z = distance_to_depth(K, dist)
    assert z.shape == (48, 64)
    # principal point: ray is unit -> z == dist
    np.testing.assert_allclose(z[24, 32], 5.0)
    assert (z <= 5.0 + 1e-9).all() and z.min() < 5.0

    pts = np.array([[1.0, 0, 0], [0, 1.0, 0]])
    T = np.eye(4)
    T[:3, 3] = [0, 0, 2.0]
    np.testing.assert_allclose(
        transform_3d_points(T, pts), [[1, 0, 2], [0, 1, 2]]
    )

    depth = np.zeros((48, 64), np.float32)
    depth[24, 32] = 3.0
    pts = unproject(K, depth)
    np.testing.assert_allclose(pts, [[0, 0, 3.0]], atol=1e-9)


def test_scannetpp_copy(tmp_path):
    scene = "scene0"
    (tmp_path / "processed" / scene / "images").mkdir(parents=True)
    (tmp_path / "obj_ids" / scene).mkdir(parents=True)
    from PIL import Image

    for i in range(3):
        Image.new("RGB", (4, 4)).save(
            tmp_path / "processed" / scene / "images" / f"f{i}.jpg"
        )
    for i in range(2):  # annotation missing for f2
        Image.new("L", (4, 4)).save(
            tmp_path / "obj_ids" / scene / f"f{i}.png"
        )
    ok, failed = copy_semantic_annotations(
        str(tmp_path / "processed"), str(tmp_path / "obj_ids"), scene
    )
    assert ok == 2 and failed == ["f2"]
    assert sorted(
        os.listdir(tmp_path / "processed" / scene / "obj_ids")
    ) == ["f0.png", "f1.png"]


def test_habitat_projections_roundtrip():
    from iggt_official_tpu.preprocess.habitat import (
        EquirectangularProjection,
        PerspectiveProjection,
        RotatedProjection,
        compute_camera_intrinsics,
        get_projection_rays,
    )

    eq = EquirectangularProjection(100, 200)
    u = np.array([10.5, 50.0, 150.0])
    v = np.array([20.5, 50.0, 80.0])
    u2, v2 = eq.project(eq.unproject(u, v))
    np.testing.assert_allclose(u2, u, atol=1e-9)
    np.testing.assert_allclose(v2, v, atol=1e-9)
    # forward ray maps to image centre
    uc, vc = eq.project(np.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose([uc, vc], [100.0, 50.0])

    f, cu, cv = compute_camera_intrinsics(48, 64, 90.0)
    np.testing.assert_allclose(f, 32.0)
    K = np.array([[f, 0, cu], [0, f, cv], [0, 0, 1.0]])
    pp = PerspectiveProjection(K, 48, 64)
    uu, vv = pp.project(pp.unproject(np.array([5.0, 40.0]), np.array([3.0, 20.0])))
    np.testing.assert_allclose(uu, [5.0, 40.0])
    np.testing.assert_allclose(vv, [3.0, 20.0])

    # a 90deg-rotated projection sees the +X ray as forward
    R = np.array([[0, 0, -1], [0, 1, 0], [1, 0, 0]], float)  # base<-cam
    rot = RotatedProjection(eq, R)
    uc, vc = rot.project(np.array([1.0, 0.0, 0.0]))
    rays = rot.unproject(np.array(uc), np.array(vc))
    np.testing.assert_allclose(rays, [1.0, 0.0, 0.0], atol=1e-9)

    rays = get_projection_rays(pp)
    assert rays.shape == (48, 64, 3)
    # centre pixel ray is ~forward
    np.testing.assert_allclose(rays[24, 32], [0.5 / f, 0.5 / f, 1.0], atol=1e-9)


def test_habitat_crop_extraction():
    from iggt_official_tpu.preprocess.habitat import (
        EquirectangularProjection,
        PerspectiveProjection,
        RotatedProjection,
        compute_camera_intrinsics,
        compute_pointmap,
        dict_to_perspective_projection,
        extract_cropped_camera,
        get_projection_rays,
        perspective_projection_to_dict,
    )

    H, W = 100, 200
    eq = EquirectangularProjection(H, W)
    rays = get_projection_rays(eq)
    # paint the envmap with the ray direction so crops are checkable
    color = ((rays + 1) * 127.5).astype(np.uint8)
    distance = np.full((H, W), 2.0, np.float32)

    f, cu, cv = compute_camera_intrinsics(32, 32, 60.0)
    K = np.array([[f, 0, cu], [0, f, cv], [0, 0, 1.0]])
    crop = RotatedProjection(PerspectiveProjection(K, 32, 32), None)

    col, depth, pts = extract_cropped_camera(
        eq, crop, color, distance,
        compute_pointmap(rays, distance, [0.0, 0.0, 0.0]),
        pixel_jittering_iterations=0,
    )
    assert col.shape == (32, 32, 3) and depth.shape == (32, 32)
    # centre of the crop looks at +Z: color ~ (127, 127, 255)
    np.testing.assert_allclose(col[16, 16], [127, 127, 254], atol=6)
    # distance 2.0 along the centre ray -> depth ~2.0 at the centre
    assert abs(depth[16, 16] - 2.0) < 0.01
    # nearest-neighbour pointmap sampling quantizes to the envmap pixel
    # grid (~1.8deg at 200px width -> ~0.1 lateral at distance 2)
    np.testing.assert_allclose(pts[16, 16], [0, 0, 2.0], atol=0.15)

    # camera-params dict roundtrip
    proj = RotatedProjection(PerspectiveProjection(K, 32, 32), np.eye(3))
    d = perspective_projection_to_dict(proj, [1.0, 2.0, 3.0])
    proj2, pos = dict_to_perspective_projection(d)
    np.testing.assert_allclose(proj2.base_projection.K, K)
    assert pos == [1.0, 2.0, 3.0]


def test_edit_resolution_tool(tmp_path):
    """COLMAP intrinsics rescale tool (ref
    `dataset_preprocess/edit_image_resolution.py`): backs up cameras.bin,
    scales focal/principal point to the on-disk image size, idempotent."""
    import PIL.Image

    from iggt_official_tpu.data.colmap import (
        Camera,
        read_cameras_binary,
        write_cameras_binary,
    )
    from iggt_official_tpu.preprocess.edit_resolution import (
        edit_scene_resolution,
    )

    scene = tmp_path / "sceneX"
    sparse = scene / "colmap" / "sparse" / "0"
    os.makedirs(sparse)
    os.makedirs(scene / "images_8")
    PIL.Image.new("RGB", (480, 270)).save(scene / "images_8" / "f0001.png")

    cams = {
        1: Camera(1, "PINHOLE", 1920, 1080,
                  np.array([1000.0, 1000.0, 960.0, 540.0])),
    }
    write_cameras_binary(cams, str(sparse / "cameras.bin"))

    assert edit_scene_resolution(str(scene))
    got = read_cameras_binary(str(sparse / "cameras.bin"))[1]
    assert (got.width, got.height) == (480, 270)
    np.testing.assert_allclose(
        got.params, [250.0, 250.0, 240.0, 135.0]
    )
    assert os.path.exists(str(sparse / "cameras.bin.backup"))
    # second invocation is a no-op
    assert not edit_scene_resolution(str(scene))
