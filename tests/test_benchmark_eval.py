"""Benchmark-grade eval parity vs `visual_util.py` + trajectory eval."""

import numpy as np
import pytest

from iggt_official_tpu.eval.benchmark import (
    calculate_auc,
    cameras_evaluation,
    depth_evaluation,
)
from iggt_official_tpu.eval.trajectory import (
    ate_rmse,
    eval_metrics,
    load_trajectory_tum_format,
    rpe,
    save_trajectory_tum_format,
    umeyama_alignment,
)

from . import torch_ref


@pytest.fixture(scope="module")
def vis_ref():
    torch_ref.install_stubs()
    import visual_util

    return visual_util


def _rand_depths(seed=0, invalid=True):
    rng = np.random.default_rng(seed)
    gt = rng.uniform(0.5, 10, (3, 16, 16)).astype(np.float32)
    pred = gt * 0.7 + rng.normal(0, 0.1, gt.shape).astype(np.float32)
    if invalid:
        gt[0, :2] = 0.0  # invalid gt
    return pred, gt


@pytest.mark.parametrize(
    "kwargs",
    [
        {},
        {"align_with_lstsq": True},
        {"align_with_scale": True},
    ],
)
def test_depth_evaluation_parity(vis_ref, kwargs):
    pred, gt = _rand_depths()
    ref_metrics, ref_parity, _, _ = vis_ref.depth_evaluation(
        pred.copy(), gt.copy(), max_depth=80, **kwargs
    )
    mine, parity = depth_evaluation(pred, gt, max_depth=80, **kwargs)
    for k in ["Abs Rel", "Sq Rel", "RMSE", "Log RMSE", "δ < 1.25",
              "δ < 1.25^2", "δ < 1.25^3"]:
        np.testing.assert_allclose(mine[k], ref_metrics[k], rtol=1e-4,
                                   atol=1e-5, err_msg=k)
    assert mine["valid_pixels"] == ref_metrics["valid_pixels"]
    np.testing.assert_allclose(
        parity, ref_parity.numpy().reshape(parity.shape), rtol=1e-3, atol=1e-4
    )


def test_depth_evaluation_lad_close(vis_ref):
    # L1 optimizers differ (scipy minimize vs ours) — compare loosely.
    # NB: the reference forgets to import scipy's `minimize`
    # (`visual_util.py:536` raises NameError) — inject it to exercise the
    # intended behaviour.
    from scipy.optimize import minimize

    vis_ref.minimize = minimize
    pred, gt = _rand_depths(1, invalid=False)
    ref_metrics, *_ = vis_ref.depth_evaluation(
        pred.copy(), gt.copy(), max_depth=80, align_with_lad=True
    )
    mine, _ = depth_evaluation(pred, gt, max_depth=80, align_with_lad=True)
    np.testing.assert_allclose(
        mine["Abs Rel"], ref_metrics["Abs Rel"], rtol=0.05, atol=5e-3
    )


def _random_poses(n, seed=0, noise=0.0):
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(seed)
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, :3, :3] = Rotation.random(n, random_state=int(seed)).as_matrix()
    poses[:, :3, 3] = rng.normal(0, 1, (n, 3))
    if noise:
        for i in range(n):
            dr = Rotation.from_rotvec(
                rng.normal(0, np.radians(noise), 3)
            ).as_matrix()
            poses[i, :3, :3] = dr @ poses[i, :3, :3]
            poses[i, :3, 3] += rng.normal(0, noise * 0.01, 3)
    return poses


def test_cameras_evaluation_parity(vis_ref):
    import torch

    gt = _random_poses(6, seed=2)[:, :3].astype(np.float32)
    pred = _random_poses(6, seed=2, noise=3.0)[:, :3].astype(np.float32)
    ref = vis_ref.cameras_evaluation(
        torch.from_numpy(gt), torch.from_numpy(pred), 6
    )
    mine = cameras_evaluation(gt, pred, 6)
    for i in range(4):
        np.testing.assert_allclose(mine[i], ref[i], atol=1e-6)
    np.testing.assert_allclose(mine[4], ref[4], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(mine[5], ref[5], rtol=1e-3, atol=2e-3)


def test_auc_parity(vis_ref):
    rng = np.random.default_rng(3)
    r = rng.uniform(0, 40, 50)
    t = rng.uniform(0, 40, 50)
    ref_auc, _ = vis_ref.calculate_auc_np(r, t, max_threshold=30)
    assert abs(calculate_auc(r, t, 30) - ref_auc) < 1e-9


def test_umeyama_recovers_transform():
    rng = np.random.default_rng(4)
    from scipy.spatial.transform import Rotation

    src = rng.normal(0, 1, (50, 3))
    R = Rotation.random(random_state=4).as_matrix()
    s_true, t_true = 2.5, np.array([1.0, -2.0, 0.5])
    dst = s_true * src @ R.T + t_true
    s, R_est, t_est = umeyama_alignment(src, dst)
    np.testing.assert_allclose(s, s_true, rtol=1e-6)
    np.testing.assert_allclose(R_est, R, atol=1e-8)
    np.testing.assert_allclose(t_est, t_true, atol=1e-8)


def test_ate_and_rpe():
    gt = _random_poses(10, seed=5)
    # pred = scaled/rotated/translated copy of gt -> ATE ~ 0 after Sim3
    from scipy.spatial.transform import Rotation

    T = np.eye(4)
    T[:3, :3] = 1.7 * Rotation.random(random_state=6).as_matrix()
    T[:3, 3] = [3, -1, 2]
    pred = T @ gt
    ate, _ = ate_rmse(gt[:, :3, 3], pred[:, :3, 3], correct_scale=True)
    assert ate < 1e-8

    m = eval_metrics(gt, gt)
    assert m["ate"] < 1e-9 and m["rpe_trans"] < 1e-9 and m["rpe_rot"] < 1e-4


def test_tum_roundtrip(tmp_path):
    poses = _random_poses(5, seed=7)
    p = tmp_path / "traj.txt"
    save_trajectory_tum_format(poses, None, str(p))
    loaded, ts = load_trajectory_tum_format(str(p))
    np.testing.assert_allclose(loaded, poses, atol=1e-5)
    np.testing.assert_allclose(ts, np.arange(5))
