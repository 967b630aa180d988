"""Head parity vs the reference PyTorch implementation (CPU)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from iggt_official_tpu.config import (
    CameraHeadConfig,
    DPTConfig,
    ModelConfig,
    PartHeadConfig,
)
from iggt_official_tpu.heads.adaptor import SamProjector
from iggt_official_tpu.heads.camera_head import CameraHead
from iggt_official_tpu.heads.dpt_head import DPTHead
from iggt_official_tpu.heads.part_head import PartHead
from iggt_official_tpu.heads.window_attn import (
    SwinCA,
    SwinSA,
    extract_overlapping_windows,
)
from iggt_official_tpu.layers.blocks import CrossAttention
from iggt_official_tpu.utils.torch_convert import iggt_rename, torch_state_dict_to_flax

from . import torch_ref


@pytest.fixture(scope="module")
def ref():
    return torch_ref.iggt_modules()


def _sd(mod):
    return {k: v for k, v in mod.state_dict().items()}


def _convert(mod):
    return torch_state_dict_to_flax(
        {k: v.detach().numpy() for k, v in _sd(mod).items()}, rename=iggt_rename
    )


def _randomize_bn(mod, rng):
    """Give BatchNorm running stats non-trivial values for a real test."""
    import torch

    for m in mod.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(
                torch.from_numpy(rng.normal(0, 0.5, m.running_mean.shape).astype("f"))
            )
            m.running_var.copy_(
                torch.from_numpy(rng.uniform(0.5, 2, m.running_var.shape).astype("f"))
            )


def test_camera_head_parity(ref):
    import torch
    from iggt.heads.camera_head import CameraHead as TCameraHead

    rng = np.random.default_rng(0)
    torch.manual_seed(0)
    tcam = TCameraHead(dim_in=64, trunk_depth=2, num_heads=4).eval()
    with torch.no_grad():
        tcam.empty_pose_tokens.normal_(0, 1.0)

    B, S, P, C = 2, 3, 7, 64
    tokens = rng.normal(0, 1, (B, S, P, C)).astype(np.float32)
    with torch.no_grad():
        ref_list = tcam([torch.from_numpy(tokens)])

    cfg = CameraHeadConfig(dim_in=64, trunk_depth=2, num_heads=4)
    out = CameraHead(cfg).apply({"params": _convert(tcam)}, jnp.asarray(tokens))
    assert len(out) == len(ref_list) == 4
    for mine, theirs in zip(out, ref_list):
        np.testing.assert_allclose(
            np.asarray(mine), theirs.detach().numpy(), rtol=2e-4, atol=2e-5
        )


def _token_list(rng, n_layers, B, S, P, C):
    return [rng.normal(0, 1, (B, S, P, C)).astype(np.float32) for _ in range(n_layers)]


@pytest.mark.parametrize("use_point_feat", [False, True])
def test_dpt_head_parity(ref, use_point_feat):
    import torch
    from iggt.heads.dpt_head import DPTHead as TDPTHead

    rng = np.random.default_rng(1)
    torch.manual_seed(1)
    tdpt = TDPTHead(
        dim_in=32,
        output_dim=4,
        activation="inv_log",
        conf_activation="expp1",
        features=16,
        out_channels=[16, 32, 32, 32],
        intermediate_layer_idx=[0, 1, 2, 3],
        use_point_feat=use_point_feat,
    ).eval()

    B, S, H, W = 1, 2, 28, 42
    ph, pw = H // 14, W // 14
    toks = _token_list(rng, 4, B, S, 5 + ph * pw, 32)
    imgs = torch.zeros(B, S, 3, H, W)
    with torch.no_grad():
        ref_out = tdpt([torch.from_numpy(t) for t in toks], imgs, 5)

    cfg = DPTConfig(
        dim_in=32,
        output_dim=4,
        activation="inv_log",
        conf_activation="expp1",
        features=16,
        out_channels=(16, 32, 32, 32),
        intermediate_layer_idx=(0, 1, 2, 3),
        use_point_feat=use_point_feat,
    )
    jtoks = [jnp.asarray(t) for t in toks]
    head = DPTHead(cfg)
    params = _convert(tdpt)
    out = head.apply({"params": params}, jtoks, (H, W), 5)

    if use_point_feat:
        preds, conf, pyr = out
        ref_preds, ref_conf, ref_pyr = ref_out
        for mine, theirs in zip(pyr, ref_pyr):
            np.testing.assert_allclose(
                np.asarray(mine),
                theirs.detach().numpy().transpose(0, 2, 3, 1),
                rtol=2e-4,
                atol=2e-4,
            )
    else:
        preds, conf = out
        ref_preds, ref_conf = ref_out
    # reference returns NCHW maps; activate_head permutes to NHWC already
    np.testing.assert_allclose(
        np.asarray(preds), ref_preds.detach().numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(conf), ref_conf.detach().numpy(), rtol=2e-4, atol=2e-4
    )


def test_sam_projector_parity(ref):
    import torch
    from iggt.heads.adaptor import SamProjector as TSamProjector

    rng = np.random.default_rng(2)
    torch.manual_seed(2)
    tproj = TSamProjector(dim_in=32, out_channels=[8, 8, 8, 8])
    _randomize_bn(tproj, rng)
    tproj.eval()

    B, S, H, W = 1, 2, 28, 42
    ph, pw = H // 14, W // 14
    toks = _token_list(rng, 4, B, S, 5 + ph * pw, 32)
    tproj.intermediate_layer_idx = [0, 1, 2, 3]
    imgs = torch.zeros(B, S, 3, H, W)
    with torch.no_grad():
        ref_out, _pos = tproj([torch.from_numpy(t) for t in toks], imgs, 5)

    proj = SamProjector(
        dim_in=32, intermediate_layer_idx=(0, 1, 2, 3), out_channels=(8, 8, 8, 8)
    )
    out = proj.apply(
        {"params": _convert(tproj)}, [jnp.asarray(t) for t in toks], (H, W), 5
    )
    assert len(out) == 4
    for mine, theirs in zip(out, ref_out.values()):
        np.testing.assert_allclose(
            np.asarray(mine),
            theirs.detach().numpy().transpose(0, 2, 3, 1),
            rtol=2e-4,
            atol=2e-4,
        )


def test_cross_attention_parity(ref):
    import torch
    from iggt.heads.block import MemEffCrossAttention

    rng = np.random.default_rng(3)
    torch.manual_seed(3)
    tca = MemEffCrossAttention(dim=32, num_heads=8, qkv_bias=True).eval()

    q = rng.normal(0, 1, (2, 12, 32)).astype(np.float32)
    kv = rng.normal(0, 1, (2, 20, 32)).astype(np.float32)
    with torch.no_grad():
        ref_out = tca(torch.from_numpy(q), torch.from_numpy(kv), torch.from_numpy(kv))

    out = CrossAttention(dim=32, num_heads=8).apply(
        {"params": _convert(tca)}, jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv)
    )
    np.testing.assert_allclose(
        np.asarray(out), ref_out.detach().numpy(), rtol=2e-4, atol=2e-5
    )


def test_swin_sa_parity(ref):
    import torch
    from iggt.heads.window_sa import SwinSA as TSwinSA

    rng = np.random.default_rng(4)
    torch.manual_seed(4)
    tswin = TSwinSA(
        img_size=64, out_chans=32, embed_dim=32, num_heads=4, window_size=8
    ).eval()

    x = rng.normal(0, 1, (2, 16, 24, 32)).astype(np.float32)
    with torch.no_grad():
        ref_out = tswin(torch.from_numpy(x))

    out = SwinSA(embed_dim=32, out_chans=32, num_heads=4, window_size=8).apply(
        {"params": _convert(tswin)}, jnp.asarray(x)
    )
    np.testing.assert_allclose(
        np.asarray(out), ref_out.detach().numpy(), rtol=2e-4, atol=2e-4
    )


def test_overlapping_windows_match_torch_unfold(ref):
    """Our gather-based unfold matches torch nn.Unfold window extraction."""
    import torch

    rng = np.random.default_rng(5)
    ws, ows = 8, 12
    x = rng.normal(0, 1, (2, 16, 24, 6)).astype(np.float32)
    mine = np.asarray(extract_overlapping_windows(jnp.asarray(x), ws, ows))

    unfold = torch.nn.Unfold(
        kernel_size=(ows, ows), stride=ws, padding=(ows - ws) // 2
    )
    t = unfold(torch.from_numpy(x.transpose(0, 3, 1, 2)))  # (B, C*ows*ows, nw)
    t = t.reshape(2, 6, ows * ows, -1).permute(0, 3, 2, 1)  # (B, nw, ows*ows, C)
    theirs = t.reshape(-1, ows * ows, 6).numpy()
    np.testing.assert_allclose(mine, theirs, rtol=1e-6, atol=1e-6)


def test_swin_ca_parity(ref):
    """SwinCA/OCAB numeric parity with converted weights, including the
    reference's channel-scrambled q-window partition
    (`window_sa.py:280-287`) which ``q_window_mode="reference"`` (the
    default) replicates op-for-op."""
    import torch
    from iggt.heads.window_sa import SwinCA as TSwinCA

    rng = np.random.default_rng(4)
    torch.manual_seed(4)
    t = TSwinCA(
        img_size=64, out_chans=32, embed_dim=32, num_heads=4, window_size=8
    ).eval()

    x = rng.normal(0, 1, (2, 16, 24, 32)).astype(np.float32)
    kv = rng.normal(0, 1, (2, 16, 24, 32)).astype(np.float32)
    with torch.no_grad():
        ref_out = t(
            torch.from_numpy(x), torch.from_numpy(kv), torch.from_numpy(kv)
        ).numpy()

    out = SwinCA(embed_dim=32, out_chans=32, num_heads=4, window_size=8).apply(
        {"params": _convert(t)}, jnp.asarray(x), jnp.asarray(kv), jnp.asarray(kv)
    )
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-4, atol=2e-5)


def test_swin_ca_hat_mode_shapes():
    """The spatially-correct upstream-HAT q partition stays available for
    from-scratch training (``q_window_mode="hat"``)."""
    rng = np.random.default_rng(6)
    x = rng.normal(0, 1, (2, 16, 24, 32)).astype(np.float32)
    kv = rng.normal(0, 1, (2, 16, 24, 32)).astype(np.float32)
    mod = SwinCA(
        embed_dim=32, out_chans=32, num_heads=4, window_size=8,
        q_window_mode="hat",
    )
    params = mod.init(jax.random.PRNGKey(0), x, kv, kv)
    out = mod.apply(params, jnp.asarray(x), jnp.asarray(kv), jnp.asarray(kv))
    assert out.shape == (2, 16, 24, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_part_head_parity(ref):
    """End-to-end PartHead numeric parity with converted torch weights
    (ref `part_head.py:102-243`), covering the OCAB scramble AND the
    dead-code quirk at `part_head.py:178-185` (cross_attention_1's output
    is computed but never consumed by refinenet2)."""
    import torch
    from iggt.heads.part_head import PartHead as TPartHead

    rng = np.random.default_rng(7)
    torch.manual_seed(7)
    t = TPartHead(
        dim_in=64, output_dim=8, features=64, out_channels=[64, 64, 64, 64]
    ).eval()

    B, S, H, W = 1, 2, 112, 112
    ph, pw = H // 14, W // 14  # 8x8
    proj = [
        rng.normal(0, 1, (B * S, 64, ph * m, pw * m)).astype(np.float32)
        for m in (4, 2, 1)
    ] + [rng.normal(0, 1, (B * S, 64, ph // 2, pw // 2)).astype(np.float32)]
    pts = [
        rng.normal(0, 1, (B * S, 64, ph * m, pw * m)).astype(np.float32)
        for m in (4, 2, 1)
    ]
    images = np.zeros((B, S, 3, H, W), np.float32)
    with torch.no_grad():
        ref_out = t(
            [torch.from_numpy(p) for p in proj],
            torch.from_numpy(images),
            5,
            frames_chunk_size=None,
            point_feature=[torch.from_numpy(p) for p in pts],
        ).numpy()

    cfg = PartHeadConfig(dim_in=64, features=64, window_size=8)
    out = PartHead(cfg).apply(
        {"params": _convert(t)},
        [jnp.asarray(p.transpose(0, 2, 3, 1)) for p in proj],
        [jnp.asarray(p.transpose(0, 2, 3, 1)) for p in pts],
        (H, W),
        (B, S),
    )
    np.testing.assert_allclose(
        np.asarray(out),
        ref_out.transpose(0, 1, 3, 4, 2),
        rtol=2e-4,
        atol=2e-5,
    )


def test_part_head_shapes():
    rng = np.random.default_rng(7)
    cfg = PartHeadConfig(dim_in=64, features=64, window_size=8)
    B, S, H, W = 1, 2, 112, 112
    ph, pw = H // 14, W // 14  # 8x8
    proj = [
        rng.normal(0, 1, (B * S, ph * m, pw * m, 64)).astype(np.float32)
        for m in (4, 2, 1)
    ] + [rng.normal(0, 1, (B * S, ph // 2, pw // 2, 64)).astype(np.float32)]
    pts = [
        rng.normal(0, 1, (B * S, ph * m, pw * m, 64)).astype(np.float32)
        for m in (4, 2, 1)
    ]
    head = PartHead(cfg)
    params = head.init(
        jax.random.PRNGKey(0),
        [jnp.asarray(t) for t in proj],
        [jnp.asarray(t) for t in pts],
        (H, W),
        (B, S),
    )
    out = head.apply(
        params,
        [jnp.asarray(t) for t in proj],
        [jnp.asarray(t) for t in pts],
        (H, W),
        (B, S),
    )
    assert out.shape == (B, S, H, W, cfg.output_dim)
    assert np.isfinite(np.asarray(out)).all()


def test_iggt_end_to_end_tiny():
    """Full IGGT assembly on a tiny config: shapes + finiteness."""
    from iggt_official_tpu.models.vggt import IGGT

    cfg = ModelConfig().scaled(
        embed_dim=64, depth=4, num_heads=4, img_size=112, patch_embed="conv"
    )
    # part head features stay 256: the point-head fusion pyramid it consumes
    # is `features`-wide and both default to 256 (`vggt.py:138,147`)
    model = IGGT(cfg)
    rng = np.random.default_rng(8)
    B, S, H, W = 1, 2, 112, 112
    imgs = jnp.asarray(rng.uniform(0, 1, (B, S, H, W, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), imgs)
    preds = model.apply(params, imgs)
    assert preds["pose_enc"].shape == (B, S, 9)
    assert preds["depth"].shape == (B, S, H, W, 1)
    assert preds["depth_conf"].shape == (B, S, H, W)
    assert preds["world_points"].shape == (B, S, H, W, 3)
    assert preds["world_points_conf"].shape == (B, S, H, W)
    assert preds["part_feat"].shape == (B, S, H, W, 8)
    for v in jax.tree.leaves(preds):
        assert np.isfinite(np.asarray(v)).all()


def test_iggt_fused_ln_matches_baseline():
    """The Pallas single-pass LayerNorm (fused_ln=True) reproduces the
    nn.LayerNorm fp32-island outputs (interpret mode on CPU)."""
    from iggt_official_tpu.models.vggt import IGGT

    cfg = ModelConfig().scaled(
        embed_dim=64, depth=2, num_heads=2, img_size=56, patch_embed="conv"
    )
    model = IGGT(cfg)
    rng = np.random.default_rng(12)
    imgs = jnp.asarray(rng.uniform(0, 1, (1, 2, 56, 56, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), imgs)
    base = model.apply(params, imgs)
    fused = model.apply(params, imgs, fused_ln=True)
    for k in ("depth", "pose_enc", "world_points", "part_feat"):
        np.testing.assert_allclose(
            np.asarray(base[k], np.float32), np.asarray(fused[k], np.float32),
            atol=1e-5, rtol=1e-5, err_msg=k,
        )


def test_vggt_feat_only():
    """`feat_only=True` mirrors the reference's `forward_feat`
    (`vggt.py:97-130`): last token map + raw depth/point head outputs,
    no camera refinement, no tracking."""
    from iggt_official_tpu.models.vggt import VGGT

    cfg = ModelConfig().scaled(
        embed_dim=64, depth=4, num_heads=4, img_size=56, patch_embed="conv"
    )
    cfg = dataclasses.replace(cfg, name="vggt", enable_part=False)
    model = VGGT(cfg)
    rng = np.random.default_rng(9)
    B, S, H, W = 1, 2, 56, 56
    imgs = jnp.asarray(rng.uniform(0, 1, (B, S, H, W, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), imgs)
    preds = model.apply(params, imgs, feat_only=True)
    assert set(preds) == {"cam_token", "depth", "point", "images"}
    assert preds["cam_token"].shape[:2] == (B, S)
    depth, depth_conf = preds["depth"]
    assert depth.shape == (B, S, H, W, 1)
    assert depth_conf.shape == (B, S, H, W)
    pts, conf = preds["point"]
    assert pts.shape == (B, S, H, W, 3)
    assert "pose_enc" not in preds


def test_iggt_bf16_head_fast_mode():
    """head_dtype="bfloat16" runs the decode paths in bf16 and stays close
    to the fp32 island output (same params)."""
    import dataclasses

    from iggt_official_tpu.models.vggt import IGGT

    cfg = ModelConfig().scaled(
        embed_dim=64, depth=4, num_heads=4, img_size=112, patch_embed="conv"
    )
    cfg_fast = dataclasses.replace(cfg, head_dtype="bfloat16")
    rng = np.random.default_rng(9)
    B, S, H, W = 1, 2, 112, 112
    imgs = jnp.asarray(rng.uniform(0, 1, (B, S, H, W, 3)).astype(np.float32))

    model = IGGT(cfg)
    params = model.init(jax.random.PRNGKey(0), imgs)
    ref = model.apply(params, imgs)
    # identical param tree: the fast mode only changes compute dtype
    fast = IGGT(cfg_fast).apply(params, imgs)

    assert fast["part_feat"].dtype == jnp.float32  # outputs upcast
    for key in ("depth", "world_points", "part_feat", "pose_enc"):
        a, b = np.asarray(ref[key]), np.asarray(fast[key])
        assert np.isfinite(b).all()
        denom = np.maximum(np.abs(a), 1.0)
        assert np.median(np.abs(a - b) / denom) < 0.05, key
    # camera head is always fp32 -> pose must match tightly
    np.testing.assert_allclose(
        np.asarray(ref["pose_enc"]), np.asarray(fast["pose_enc"]),
        rtol=1e-4, atol=1e-4,
    )


def test_iggt_prime_view_count_chunked():
    """S=11 (prime, above frames_chunk_size=8) forces single-view scan
    chunks (cs=1); the batched and flat scan-output layouts coincide in
    shape there, so the unchunk path must be told which it has instead of
    sniffing (a shape-sniff crash shipped in round 2)."""
    from iggt_official_tpu.models.vggt import IGGT

    cfg = ModelConfig().scaled(
        embed_dim=32, depth=2, num_heads=2, img_size=28, patch_embed="conv"
    )
    model = IGGT(cfg)
    rng = np.random.default_rng(9)
    B, S, H, W = 1, 11, 28, 28
    imgs = jnp.asarray(rng.uniform(0, 1, (B, S, H, W, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), imgs)
    preds = model.apply(params, imgs)
    assert preds["depth"].shape == (B, S, H, W, 1)
    assert preds["part_feat"].shape == (B, S, H, W, 8)
    for v in jax.tree.leaves(preds):
        assert np.isfinite(np.asarray(v)).all()
    # cross-check against the unchunked decode: chunking is layout-only
    import dataclasses

    cfg2 = dataclasses.replace(cfg, frames_chunk_size=0)
    preds2 = IGGT(cfg2).apply(params, imgs)
    np.testing.assert_allclose(
        np.asarray(preds2["depth"]), np.asarray(preds["depth"]),
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(preds2["part_feat"]), np.asarray(preds["part_feat"]),
        rtol=2e-4, atol=2e-5,
    )


def test_window_attention_bias_parity(ref):
    """`window_sa.py:83-121` WindowAttention (relative-position-bias MHA).

    Parity artifact: the shipped HAB deliberately does NOT use this class
    (the reference routes HAB through MemEffAttention, which ignores the
    rpi argument), but the reference ships it and this pins our port."""
    import torch
    from iggt.heads.window_sa import WindowAttention as TWindowAttention

    from iggt_official_tpu.heads.window_attn import (
        WindowAttention,
        rpi_window_sa,
    )

    rng = np.random.default_rng(4)
    torch.manual_seed(4)
    ws, dim, heads = 4, 32, 4
    twin = TWindowAttention(dim, (ws, ws), heads).eval()
    with torch.no_grad():
        twin.relative_position_bias_table.copy_(
            torch.from_numpy(
                rng.normal(0, 0.5, twin.relative_position_bias_table.shape)
                .astype("f")
            )
        )
    rpi = rpi_window_sa(ws)
    x = rng.normal(0, 1, (6, ws * ws, dim)).astype(np.float32)
    with torch.no_grad():
        want = twin(torch.from_numpy(x), torch.from_numpy(rpi.astype(np.int64)))

    win = WindowAttention(dim=dim, window_size=ws, num_heads=heads)
    got = win.apply({"params": _convert(twin)}, jnp.asarray(x), jnp.asarray(rpi))
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=2e-5, atol=2e-5
    )


def test_geo_projector_parity(ref):
    """`adaptor.py:38-138` GeoProjector {res2..res5} pyramid (the
    reference ships it alongside SamProjector; unused by the demo)."""
    import torch
    from iggt.heads.adaptor import GeoProjector as TGeoProjector

    rng = np.random.default_rng(5)
    torch.manual_seed(5)
    tproj = TGeoProjector(dim_in=32, out_channels=[8, 8, 8, 8]).eval()
    tproj.intermediate_layer_idx = [0, 1, 2, 3]

    B, S, H, W = 1, 2, 28, 42
    ph, pw = H // 14, W // 14
    toks = _token_list(rng, 4, B, S, 5 + ph * pw, 32)
    imgs = torch.zeros(B, S, 3, H, W)
    with torch.no_grad():
        ref_out = tproj([torch.from_numpy(t) for t in toks], imgs, 5)

    from iggt_official_tpu.heads.adaptor import GeoProjector

    proj = GeoProjector(
        dim_in=32, intermediate_layer_idx=(0, 1, 2, 3),
        out_channels=(8, 8, 8, 8),
    )
    out = proj.apply(
        {"params": _convert(tproj)}, [jnp.asarray(t) for t in toks], (H, W), 5
    )
    assert set(out) == {"res2", "res3", "res4", "res5"}
    for key, theirs in ref_out.items():
        np.testing.assert_allclose(
            np.asarray(out[key]),
            theirs.detach().numpy().transpose(0, 2, 3, 1),
            rtol=2e-4, atol=2e-4,
        )
