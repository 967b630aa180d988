"""Track head parity vs the reference PyTorch implementation (CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from iggt_official_tpu.config import TrackHeadConfig
from iggt_official_tpu.heads.track.modules import EfficientUpdateFormer
from iggt_official_tpu.heads.track.predictor import BaseTrackerPredictor
from iggt_official_tpu.heads.track.sampling import (
    bilinear_sample_nhwc,
    get_2d_embedding,
    get_2d_sincos_pos_embed,
)
from iggt_official_tpu.utils.torch_convert import iggt_rename, torch_state_dict_to_flax

from . import torch_ref


@pytest.fixture(scope="module")
def ref():
    return torch_ref.iggt_modules()


def _convert(mod):
    return torch_state_dict_to_flax(
        {k: v.detach().numpy() for k, v in mod.state_dict().items()},
        rename=iggt_rename,
    )


@pytest.mark.parametrize("padding", ["border", "zeros"])
def test_bilinear_sampler_parity(ref, padding):
    import torch
    from iggt.heads.track_modules.utils import bilinear_sampler

    rng = np.random.default_rng(0)
    fmap = rng.normal(0, 1, (2, 3, 8, 10)).astype(np.float32)  # NCHW
    coords = rng.uniform(-1.5, 11, (2, 5, 7, 2)).astype(np.float32)  # (x, y)
    with torch.no_grad():
        refv = bilinear_sampler(
            torch.from_numpy(fmap), torch.from_numpy(coords),
            padding_mode=padding,
        ).numpy()  # (B, C, 5, 7)
    mine = np.asarray(
        bilinear_sample_nhwc(
            jnp.asarray(fmap.transpose(0, 2, 3, 1)), jnp.asarray(coords),
            padding_mode=padding,
        )
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(mine, refv, rtol=1e-5, atol=1e-5)


def test_2d_embedding_parity(ref):
    import torch
    from iggt.heads.track_modules.utils import get_2d_embedding as tref

    rng = np.random.default_rng(1)
    xy = rng.uniform(-5, 5, (2, 6, 2)).astype(np.float32)
    with torch.no_grad():
        refv = tref(torch.from_numpy(xy), 64, cat_coords=False).numpy()
    mine = np.asarray(get_2d_embedding(jnp.asarray(xy), 64))
    np.testing.assert_allclose(mine, refv, rtol=1e-5, atol=1e-5)


def test_2d_sincos_grid_parity(ref):
    import torch
    from iggt.heads.track_modules.utils import get_2d_sincos_pos_embed as tref

    with torch.no_grad():
        refv = tref(96, (6, 9)).numpy()  # (1, C, H, W)
    mine = np.asarray(get_2d_sincos_pos_embed(96, (6, 9)))
    np.testing.assert_allclose(
        mine.transpose(0, 3, 1, 2), refv, rtol=1e-5, atol=1e-5
    )


def test_update_former_parity(ref):
    import torch
    from iggt.heads.track_modules.blocks import EfficientUpdateFormer as TRef

    torch.manual_seed(0)
    tmod = TRef(
        space_depth=2, time_depth=2, input_dim=40, hidden_size=32,
        num_heads=4, output_dim=10, num_virtual_tracks=4,
    ).eval()
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (2, 5, 3, 40)).astype(np.float32)  # (B, N, T, D)
    with torch.no_grad():
        refv, _ = tmod(torch.from_numpy(x))

    mine = EfficientUpdateFormer(
        space_depth=2, time_depth=2, hidden_size=32, num_heads=4,
        output_dim=10, num_virtual_tracks=4,
    )
    out = mine.apply({"params": _convert(tmod)}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out), refv.numpy(), rtol=2e-4, atol=2e-5
    )


def test_tracker_predictor_parity(ref):
    import torch
    from iggt.heads.track_modules.base_track_predictor import (
        BaseTrackerPredictor as TRef,
    )

    torch.manual_seed(3)
    tmod = TRef(
        stride=2, corr_levels=3, corr_radius=2, latent_dim=16,
        hidden_size=32, depth=2, predict_conf=True,
    ).eval()
    # shrink virtual tracks for speed: rebuild updateformer small
    rng = np.random.default_rng(3)
    B, S, C, HH, WW = 1, 3, 16, 12, 16
    fmaps = rng.normal(0, 1, (B, S, C, HH, WW)).astype(np.float32)
    queries = rng.uniform(2, 20, (B, 5, 2)).astype(np.float32)
    with torch.no_grad():
        ref_coords, ref_vis, ref_conf = tmod(
            torch.from_numpy(queries), torch.from_numpy(fmaps), iters=2
        )

    cfg = TrackHeadConfig(
        features=16, corr_levels=3, corr_radius=2, hidden_size=32,
        predict_conf=True, iters=2,
    )
    mine = BaseTrackerPredictor(cfg, stride=2, depth=2)
    params = _convert(tmod)
    coords, vis, conf = mine.apply(
        {"params": params},
        jnp.asarray(queries),
        jnp.asarray(fmaps.transpose(0, 1, 3, 4, 2)),
        iters=2,
    )
    assert len(coords) == len(ref_coords) == 2
    np.testing.assert_allclose(
        np.asarray(coords[-1]), ref_coords[-1].numpy(), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(vis), ref_vis.numpy(), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(conf), ref_conf.numpy(), rtol=1e-3, atol=1e-3
    )


def test_corr_pyramid_repeated_levels_share_scale():
    """When the feature map exhausts before corr_levels, the repeated
    coarsest maps must be sampled at the coarsest level's ACTUAL scale
    (not 2**lvl), so their correlation windows match the real level's."""
    import jax.numpy as jnp

    from iggt_official_tpu.heads.track.corr import build_pyramid, corr_sample

    rng = np.random.default_rng(0)
    B, S, H, W, C = 1, 2, 8, 8, 16
    fmaps = jnp.asarray(rng.normal(0, 1, (B, S, H, W, C)).astype(np.float32))
    levels, scales = build_pyramid(fmaps, num_levels=7)
    assert [l.shape[2] for l in levels] == [8, 4, 2, 1, 1, 1, 1]
    assert scales == [1.0, 2.0, 4.0, 8.0, 8.0, 8.0, 8.0]

    targets = jnp.asarray(rng.normal(0, 1, (B, S, 3, C)).astype(np.float32))
    coords = jnp.asarray(rng.uniform(0, 8, (B, S, 3, 2)).astype(np.float32))
    out = corr_sample(levels, scales, targets, coords, radius=2)
    K = 25
    out = np.asarray(out).reshape(B, S, 3, 7, K)
    # levels 3..6 are the same map at the same scale -> identical samples
    for lvl in (4, 5, 6):
        np.testing.assert_array_equal(out[..., lvl, :], out[..., 3, :])
