"""Evaluation metrics: depth, pose, instance matching, scene orchestration."""

import json
import os

import numpy as np

from iggt_official_tpu.eval.metrics import (
    DepthEvaluator,
    PoseEvaluator,
    SceneEvaluator,
    evaluate_matched_instances,
    m_rel_ae,
    masks_from_label_map,
    thresh_inliers,
)


def test_m_rel_ae_and_inliers_basic():
    gt = np.full((4, 4), 2.0)
    pred = np.full((4, 4), 2.2)
    np.testing.assert_allclose(m_rel_ae(gt, pred), 0.1, atol=1e-6)
    assert thresh_inliers(gt, pred, 1.03) == 0.0
    assert thresh_inliers(gt, gt * 1.01, 1.03) == 1.0
    # invalid gt pixels ignored
    gt2 = gt.copy()
    gt2[0, 0] = 0.0
    assert np.isfinite(m_rel_ae(gt2, pred))


def test_depth_evaluator_median_alignment_perfect_after_scale():
    rng = np.random.default_rng(0)
    gt = rng.uniform(1, 5, (16, 16)).astype(np.float32)
    pred = gt / 3.0  # perfect up to scale
    m = DepthEvaluator(alignment="median").evaluate_depth(gt, pred)
    assert m["absrel"] < 1e-4
    assert m["inliers103"] > 99.9
    assert abs(m["scaling_factor"] - 3.0) < 1e-4
    assert m["delta_1"] == 100.0


def test_depth_evaluator_least_squares():
    rng = np.random.default_rng(1)
    gt = rng.uniform(1, 5, (16, 16)).astype(np.float32)
    m = DepthEvaluator(alignment="least_squares").evaluate_depth(gt, gt * 0.5)
    assert abs(m["scaling_factor"] - 2.0) < 1e-4
    assert m["absrel"] < 1e-4


def test_depth_evaluator_resizes_pred():
    gt = np.full((16, 16), 2.0, np.float32)
    pred = np.full((8, 8), 2.0, np.float32)
    m = DepthEvaluator().evaluate_depth(gt, pred)
    assert m["absrel"] < 1e-6


def test_pose_evaluator_identity():
    poses = np.tile(np.eye(4)[:3], (5, 1, 1))
    m = PoseEvaluator().evaluate_poses(poses, poses)
    assert m["translation_error_mean"] == 0
    assert m["rotation_error_mean"] < 1e-3


def test_pose_evaluator_known_rotation():
    gt = np.tile(np.eye(4)[:3], (2, 1, 1))
    pred = gt.copy()
    th = np.radians(30)
    pred[:, :3, :3] = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    )
    pred[:, :3, 3] = [1.0, 0, 0]
    m = PoseEvaluator().evaluate_poses(gt, pred)
    assert abs(m["rotation_error_mean"] - 30) < 1e-4
    assert abs(m["translation_error_mean"] - 1.0) < 1e-6


def test_instance_matching_hungarian():
    a = np.zeros((8, 8), bool); a[:4] = True
    b = np.zeros((8, 8), bool); b[4:] = True
    # pred masks slightly perturbed, order swapped
    pa = np.zeros((8, 8), bool); pa[:4] = True; pa[3, :2] = False
    pb = np.zeros((8, 8), bool); pb[4:] = True
    metrics, matches = evaluate_matched_instances([a, b], [pb, pa])
    assert metrics["num_matches"] == 2
    assert sorted(matches) == [(0, 1), (1, 0)]
    assert metrics["matched_miou"] > 0.9
    assert metrics["matched_macc"] > 0.9


def test_masks_from_label_map():
    lm = np.array([[0, 0, 1], [2, -1, 1]])
    masks = masks_from_label_map(lm)
    assert len(masks) == 3
    assert masks[0].sum() == 2


def test_scene_evaluator_report(tmp_path):
    rng = np.random.default_rng(2)
    gt = {
        "gt_depth": rng.uniform(1, 5, (3, 8, 8)).astype(np.float32),
        "gt_extrinsic": np.tile(np.eye(4)[:3], (3, 1, 1)),
    }
    preds = {
        "depth": gt["gt_depth"] * 2.0,
        "extrinsic": gt["gt_extrinsic"],
    }
    ev = SceneEvaluator()
    results = ev.evaluate_scene(gt, preds)
    assert results["summary"]["depth"]["absrel"] < 1e-4
    assert results["summary"]["pose"]["translation_error"] == 0
    out = tmp_path / "report.json"
    ev.save_evaluation_report(results, str(out))
    loaded = json.loads(out.read_text())
    assert "summary" in loaded


def test_plot_trajectory_writes_png(tmp_path):
    from iggt_official_tpu.eval.trajectory import plot_trajectory

    n = 20
    t = np.linspace(0, 2 * np.pi, n)
    gt = np.tile(np.eye(4), (n, 1, 1))
    gt[:, 0, 3] = np.cos(t)
    gt[:, 1, 3] = np.sin(t)
    pred = gt.copy()
    pred[:, :3, 3] *= 1.7  # scale offset -> exercised Sim(3) alignment
    out = plot_trajectory(pred, gt, title="circle",
                          filename=str(tmp_path / "demo"))
    assert out.endswith("_traj_error.png") and os.path.exists(out)
    # pred-only variant
    out2 = plot_trajectory(pred, None, filename=str(tmp_path / "solo"))
    assert os.path.exists(out2)


def test_sparsification_oracle_decreases():
    from iggt_official_tpu.eval.metrics import m_rel_ae, sparsification

    rng = np.random.default_rng(0)
    gt = rng.uniform(1, 5, (40, 50))
    noise = rng.normal(0, 0.3, gt.shape)
    pred = gt + noise
    # oracle uncertainty = true error -> curve must be monotonically
    # non-increasing (removing most-erroneous pixels first)
    x, y = sparsification(gt, pred, np.abs(noise), error_fct=m_rel_ae)
    assert x.shape == y.shape == (100,)
    assert y[0] == 1.0 or np.isclose(y[0], 1.0, atol=1e-6)
    assert (np.diff(y) <= 1e-9).all()
    assert y[-1] < 0.5
    # random uncertainty -> roughly flat curve around 1
    x2, y2 = sparsification(gt, pred, rng.uniform(0, 1, gt.shape))
    assert abs(np.nanmean(y2) - 1.0) < 0.15


def test_pointwise_rel_ae():
    from iggt_official_tpu.eval.metrics import pointwise_rel_ae

    gt = np.array([[2.0, 0.0], [4.0, 1.0]])
    pred = np.array([[1.0, 5.0], [5.0, 1.0]])
    rel = pointwise_rel_ae(gt, pred)
    np.testing.assert_allclose(rel, [[0.5, 0.0], [0.25, 0.0]])


def _random_c2w(rng, n):
    from scipy.spatial.transform import Rotation

    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, :3, :3] = Rotation.random(n, random_state=rng).as_matrix()
    poses[:, :3, 3] = np.asarray(rng.normal(0, 2, (n, 3)))
    return poses


def test_sintel_cam_loader_roundtrip(tmp_path):
    """Write Sintel-format .cam files and recover the c2w trajectory
    (ref `vo_eval.py:22-101`)."""
    from iggt_official_tpu.eval.trajectory import load_sintel_traj, load_traj

    rng = np.random.default_rng(0)
    n = 6
    poses = _random_c2w(rng, n)
    M = np.diag([500.0, 500.0, 1.0])
    for i in range(n):
        w2c = np.linalg.inv(poses[i])[:3]  # (3, 4)
        with open(tmp_path / f"frame_{i:04d}.cam", "wb") as f:
            np.array([202021.25], np.float32).tofile(f)
            M.astype(np.float64).tofile(f)
            w2c.astype(np.float64).tofile(f)
    got, ts = load_sintel_traj(str(tmp_path))
    # reference mean-centres positions
    want = poses.copy()
    want[:, :3, 3] -= want[:, :3, 3].mean(0, keepdims=True)
    np.testing.assert_allclose(got, want, atol=1e-10)
    np.testing.assert_allclose(ts, np.arange(n, dtype=float))

    got2, _ = load_traj(str(tmp_path), "sintel", skip=1, stride=2)
    np.testing.assert_allclose(got2, want[1::2], atol=1e-10)


def test_replica_traj_loader(tmp_path):
    from iggt_official_tpu.eval.trajectory import load_replica_traj

    rng = np.random.default_rng(1)
    poses = _random_c2w(rng, 5)
    # 16-column row-major 4x4 variant
    np.savetxt(tmp_path / "traj.txt", poses.reshape(5, 16))
    got, ts = load_replica_traj(str(tmp_path / "traj.txt"))
    np.testing.assert_allclose(got, poses, atol=1e-10)
    # 12-column variant
    np.savetxt(tmp_path / "traj12.txt", poses[:, :3, :].reshape(5, 12))
    got12, _ = load_replica_traj(str(tmp_path / "traj12.txt"))
    np.testing.assert_allclose(got12, poses, atol=1e-10)


def test_tum_loader_and_timestamps(tmp_path):
    from iggt_official_tpu.eval.trajectory import (
        load_traj,
        save_trajectory_tum_format,
        update_timestamps,
    )

    rng = np.random.default_rng(2)
    poses = _random_c2w(rng, 4)
    ts = np.array([10.0, 10.5, 11.0, 11.5])
    save_trajectory_tum_format(poses, ts, str(tmp_path / "groundtruth.txt"))
    got, got_ts = load_traj(str(tmp_path / "groundtruth.txt"), "tum")
    np.testing.assert_allclose(got, poses, atol=1e-5)
    np.testing.assert_allclose(got_ts, ts)

    with open(tmp_path / "rgb.txt", "w") as f:
        f.write("# comment line\n")
        for t in ts:
            f.write(f"{t} rgb/{t}.png\n")
    up = update_timestamps(str(tmp_path / "groundtruth.txt"), "tum", stride=2)
    np.testing.assert_allclose(up, ts[::2])


def test_ate_rpe_numeric_crosscheck():
    """ATE/RPE cross-check on a synthetic trajectory with a known Sim(3)
    perturbation: an independent direct computation (no shared code) must
    match eval_metrics (replacing the evo cross-check, evo unavailable)."""
    from scipy.spatial.transform import Rotation

    from iggt_official_tpu.eval.trajectory import eval_metrics

    rng = np.random.default_rng(3)
    n = 50
    t = np.linspace(0, 4 * np.pi, n)
    gt = np.tile(np.eye(4), (n, 1, 1))
    gt[:, :3, 3] = np.stack([np.cos(t), np.sin(t), 0.1 * t], 1)
    gt[:, :3, :3] = Rotation.from_euler("z", t[:, None]).as_matrix()

    # known similarity transform + per-frame noise
    s = 2.0
    R = Rotation.from_euler("xyz", [0.3, -0.2, 0.5]).as_matrix()
    trans = np.array([1.0, -2.0, 0.5])
    noise = rng.normal(0, 0.01, (n, 3))
    pred = gt.copy()
    pred[:, :3, 3] = (gt[:, :3, 3] @ R.T) * s + trans + noise
    pred[:, :3, :3] = np.einsum("ij,njk->nik", R, gt[:, :3, :3])

    m = eval_metrics(pred, gt, correct_scale=True)
    # ATE after optimal Sim3 alignment must be on the noise scale
    assert m["ate"] < 0.03, m
    # independent RPE computation
    rel_g = np.linalg.inv(gt[:-1]) @ gt[1:]
    rel_p = np.linalg.inv(pred[:-1]) @ pred[1:]
    err = np.linalg.inv(rel_g) @ rel_p
    t_rmse = float(np.sqrt((np.linalg.norm(err[:, :3, 3], axis=1) ** 2).mean()))
    cos = (np.trace(err[:, :3, :3], axis1=1, axis2=2) - 1) / 2
    r_rmse = float(np.sqrt(
        (np.degrees(np.arccos(np.clip(cos, -1, 1))) ** 2).mean()
    ))
    np.testing.assert_allclose(m["rpe_trans"], t_rmse, rtol=1e-9)
    np.testing.assert_allclose(m["rpe_rot"], r_rmse, rtol=1e-9)
