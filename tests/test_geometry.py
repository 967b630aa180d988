"""Parity + invariant tests for the geometry library vs the torch reference."""

import numpy as np
import pytest
import jax.numpy as jnp

from iggt_official_tpu.geometry import (
    closed_form_inverse_se3,
    depth_to_cam_coords_points,
    depth_to_world_coords_points,
    extri_intri_to_pose_encoding,
    mat_to_quat,
    pose_encoding_to_extri_intri,
    project_world_points_to_pixels,
    quat_to_mat,
    unproject_depth_map_to_point_map,
)

from . import torch_ref


def random_rotations(rng, n):
    """Random rotation matrices via QR decomposition."""
    A = rng.standard_normal((n, 3, 3))
    Q, R = np.linalg.qr(A)
    # fix sign so det = +1
    Q = Q * np.sign(np.diagonal(R, axis1=-2, axis2=-1))[:, None, :]
    det = np.linalg.det(Q)
    Q[det < 0, :, 0] *= -1
    return Q.astype(np.float32)


@pytest.fixture(scope="module")
def ref():
    return torch_ref.iggt_modules()


def test_quat_mat_roundtrip():
    rng = np.random.default_rng(0)
    R = random_rotations(rng, 64)
    q = np.asarray(mat_to_quat(jnp.asarray(R)))
    R2 = np.asarray(quat_to_mat(jnp.asarray(q)))
    np.testing.assert_allclose(R, R2, atol=2e-5)
    # standardized: real part non-negative, unit norm
    assert (q[:, 3] >= 0).all()
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)


def test_quat_parity_vs_torch(ref):
    import torch
    from iggt.utils.rotation import mat_to_quat as t_m2q, quat_to_mat as t_q2m

    rng = np.random.default_rng(1)
    R = random_rotations(rng, 32)
    q_ref = t_m2q(torch.from_numpy(R)).numpy()
    q_jax = np.asarray(mat_to_quat(jnp.asarray(R)))
    np.testing.assert_allclose(q_ref, q_jax, atol=1e-5)

    q_raw = rng.standard_normal((32, 4)).astype(np.float32)
    R_ref = t_q2m(torch.from_numpy(q_raw)).numpy()
    R_jax = np.asarray(quat_to_mat(jnp.asarray(q_raw)))
    np.testing.assert_allclose(R_ref, R_jax, atol=1e-5)


def _random_cameras(rng, B, S):
    R = random_rotations(rng, B * S).reshape(B, S, 3, 3)
    t = rng.standard_normal((B, S, 3, 1)).astype(np.float32)
    extr = np.concatenate([R, t], axis=-1)
    intr = np.zeros((B, S, 3, 3), dtype=np.float32)
    f = rng.uniform(200, 600, (B, S, 2)).astype(np.float32)
    intr[..., 0, 0] = f[..., 0]
    intr[..., 1, 1] = f[..., 1]
    intr[..., 0, 2] = 252.0
    intr[..., 1, 2] = 168.0
    intr[..., 2, 2] = 1.0
    return extr, intr


def test_pose_encoding_roundtrip_and_parity(ref):
    import torch
    from iggt.utils.pose_enc import (
        extri_intri_to_pose_encoding as t_enc,
        pose_encoding_to_extri_intri as t_dec,
    )

    rng = np.random.default_rng(2)
    extr, intr = _random_cameras(rng, 2, 3)
    hw = (336, 504)

    enc_ref = t_enc(torch.from_numpy(extr), torch.from_numpy(intr), hw).numpy()
    enc_jax = np.asarray(
        extri_intri_to_pose_encoding(jnp.asarray(extr), jnp.asarray(intr), hw)
    )
    np.testing.assert_allclose(enc_ref, enc_jax, atol=1e-5)

    ex_ref, in_ref = t_dec(torch.from_numpy(enc_ref), hw)
    ex_jax, in_jax = pose_encoding_to_extri_intri(jnp.asarray(enc_jax), hw)
    np.testing.assert_allclose(ex_ref.numpy(), np.asarray(ex_jax), atol=1e-5)
    np.testing.assert_allclose(in_ref.numpy(), np.asarray(in_jax), atol=1e-3)

    # roundtrip recovers the rotation and translation
    np.testing.assert_allclose(np.asarray(ex_jax), extr, atol=1e-4)


def test_se3_inverse():
    rng = np.random.default_rng(3)
    extr, _ = _random_cameras(rng, 1, 8)
    inv = np.asarray(closed_form_inverse_se3(jnp.asarray(extr)))
    assert inv.shape == (1, 8, 4, 4)
    eye = np.einsum("bsij,bsjk->bsik", inv[..., :3, :3], extr[..., :3, :3])
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    # t_inv = -R^T t
    np.testing.assert_allclose(
        inv[..., :3, 3],
        -np.einsum("bsji,bsj->bsi", extr[..., :3, :3], extr[..., :3, 3]),
        atol=1e-5,
    )


def test_unprojection_parity(ref):
    from iggt.utils.geometry import unproject_depth_map_to_point_map as t_unproj

    rng = np.random.default_rng(4)
    extr, intr = _random_cameras(rng, 1, 4)
    depth = rng.uniform(0.5, 5.0, (4, 24, 32)).astype(np.float32)

    ref_pts = t_unproj(depth[..., None], extr[0], intr[0])
    jax_pts = np.asarray(
        unproject_depth_map_to_point_map(
            jnp.asarray(depth), jnp.asarray(extr[0]), jnp.asarray(intr[0])
        )
    )
    np.testing.assert_allclose(ref_pts, jax_pts, atol=1e-4)


def test_project_unproject_consistency():
    rng = np.random.default_rng(5)
    extr, intr = _random_cameras(rng, 1, 2)
    depth = rng.uniform(1.0, 4.0, (2, 16, 20)).astype(np.float32)

    world, cam, mask = depth_to_world_coords_points(
        jnp.asarray(depth), jnp.asarray(extr[0]), jnp.asarray(intr[0])
    )
    assert bool(mask.all())
    uv, z = project_world_points_to_pixels(
        world.reshape(2, -1, 3), jnp.asarray(extr[0]), jnp.asarray(intr[0])
    )
    np.testing.assert_allclose(np.asarray(z).reshape(2, 16, 20), depth, atol=1e-3)
    vv, uu = np.meshgrid(np.arange(16), np.arange(20), indexing="ij")
    grid = np.stack([uu, vv], axis=-1).reshape(-1, 2)
    np.testing.assert_allclose(
        np.asarray(uv).reshape(2, -1, 2), np.broadcast_to(grid, (2, 320, 2)),
        atol=1e-2,
    )


def test_cam_coords_simple():
    intr = jnp.asarray(
        [[100.0, 0.0, 8.0], [0.0, 100.0, 6.0], [0.0, 0.0, 1.0]]
    )
    depth = jnp.full((12, 16), 2.0)
    cam = depth_to_cam_coords_points(depth, intr)
    # center pixel maps to (0, 0, depth)
    np.testing.assert_allclose(np.asarray(cam[6, 8]), [0.0, 0.0, 2.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(cam[6, 9]), [0.02, 0.0, 2.0], atol=1e-6)
