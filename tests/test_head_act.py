"""Parity tests for head activations and positional embeddings."""

import numpy as np
import pytest
import jax.numpy as jnp

from iggt_official_tpu.heads.act import activate_head, activate_pose, inverse_log_transform
from iggt_official_tpu.heads.embeds import (
    create_uv_grid,
    position_grid_to_embed,
)

from . import torch_ref


@pytest.fixture(scope="module")
def ref():
    return torch_ref.iggt_modules()


def test_inverse_log_transform():
    x = jnp.asarray([-2.0, -0.5, 0.0, 0.5, 2.0])
    y = np.asarray(inverse_log_transform(x))
    expected = np.sign(x) * np.expm1(np.abs(x))
    np.testing.assert_allclose(y, expected, atol=1e-6)


def test_activate_pose_parity(ref):
    import torch
    from iggt.heads.head_act import activate_pose as t_act

    rng = np.random.default_rng(0)
    enc = rng.standard_normal((2, 3, 9)).astype(np.float32)
    out_ref = t_act(torch.from_numpy(enc), "linear", "linear", "relu").numpy()
    out_jax = np.asarray(activate_pose(jnp.asarray(enc), "linear", "linear", "relu"))
    np.testing.assert_allclose(out_ref, out_jax, atol=1e-6)


@pytest.mark.parametrize(
    "activation,conf",
    [
        ("norm_exp", "expp1"),
        ("norm", "expp0"),
        ("exp", "sigmoid"),
        ("inv_log", "expp1"),
        ("xy_inv_log", "expp1"),
        ("sigmoid", "sigmoid"),
        ("linear", "expp1"),
        ("relu", "expp0"),
    ],
)
def test_activate_head_parity(ref, activation, conf):
    import torch
    from iggt.heads.head_act import activate_head as t_act

    rng = np.random.default_rng(1)
    # reference takes NCHW; ours takes NHWC
    out_nchw = rng.standard_normal((2, 4, 6, 8)).astype(np.float32)
    pts_ref, conf_ref = t_act(torch.from_numpy(out_nchw), activation, conf)

    out_nhwc = np.transpose(out_nchw, (0, 2, 3, 1))
    pts_jax, conf_jax = activate_head(jnp.asarray(out_nhwc), activation, conf)
    np.testing.assert_allclose(pts_ref.numpy(), np.asarray(pts_jax), atol=1e-5)
    np.testing.assert_allclose(conf_ref.numpy(), np.asarray(conf_jax), atol=1e-5)


def test_uv_grid_parity(ref):
    from iggt.heads.utils import create_uv_grid as t_uv

    for (w, h) in [(36, 24), (37, 37), (10, 17)]:
        g_ref = t_uv(w, h, aspect_ratio=w / h).numpy()
        g_jax = np.asarray(create_uv_grid(w, h, aspect_ratio=w / h))
        assert g_ref.shape == g_jax.shape == (h, w, 2)
        np.testing.assert_allclose(g_ref, g_jax, atol=1e-6)


def test_position_grid_to_embed_parity(ref):
    import torch
    from iggt.heads.utils import create_uv_grid as t_uv, position_grid_to_embed as t_pe

    g_ref = t_uv(18, 12, aspect_ratio=1.5)
    emb_ref = t_pe(g_ref, 64).numpy()
    emb_jax = np.asarray(
        position_grid_to_embed(jnp.asarray(g_ref.numpy()), 64)
    )
    np.testing.assert_allclose(emb_ref, emb_jax, atol=2e-5)
