"""Parity tests for the layer stack vs the reference torch implementation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from iggt_official_tpu.layers.blocks import Attention, Block
from iggt_official_tpu.layers.rope import (
    apply_rope_2d,
    compute_rope_2d,
    make_patch_positions,
)
from iggt_official_tpu.layers.vit import DinoViT
from iggt_official_tpu.config import ViTConfig
from iggt_official_tpu.utils.torch_convert import torch_state_dict_to_flax
from iggt_official_tpu.ops.conv import Conv2d, ConvTranspose2d

from . import torch_ref


@pytest.fixture(scope="module")
def ref():
    return torch_ref.iggt_modules()


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def _rand_positions(rng, B, N, hi=12):
    return rng.integers(0, hi, (B, N, 2)).astype(np.int64)


def test_rope_parity(ref):
    import torch
    from iggt.layers.rope import RotaryPositionEmbedding2D

    rng = np.random.default_rng(0)
    B, H, N, D = 2, 4, 10, 32
    q = rng.standard_normal((B, H, N, D)).astype(np.float32)
    pos = _rand_positions(rng, B, N)

    rope_t = RotaryPositionEmbedding2D(frequency=100.0)
    out_ref = rope_t(torch.from_numpy(q), torch.from_numpy(pos)).numpy()

    # ours is (B, N, H, D)
    tables = compute_rope_2d(jnp.asarray(pos), D, 100.0)
    out_jax = apply_rope_2d(jnp.asarray(q.transpose(0, 2, 1, 3)), tables)
    np.testing.assert_allclose(
        out_ref, np.asarray(out_jax).transpose(0, 2, 1, 3), atol=2e-5
    )


def test_rope_preserves_norm():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 6, 2, 64)).astype(np.float32))
    pos = jnp.asarray(_rand_positions(rng, 1, 6))
    tables = compute_rope_2d(pos, 64)
    out = apply_rope_2d(q, tables)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1),
        np.linalg.norm(np.asarray(q), axis=-1),
        rtol=1e-5,
    )


def test_make_patch_positions():
    pos = np.asarray(make_patch_positions(2, 3, 4, patch_start_idx=5))
    assert pos.shape == (4, 5 + 6, 2)
    assert (pos[:, :5] == 0).all()
    assert pos[0, 5].tolist() == [1, 1]
    assert pos[0, 6].tolist() == [1, 2]
    assert pos[0, 8].tolist() == [2, 1]  # row-major over (y, x)


@pytest.mark.parametrize("qk_norm,with_rope", [(False, False), (True, True)])
def test_attention_parity(ref, qk_norm, with_rope):
    import torch
    from iggt.layers.attention import Attention as TAttention
    from iggt.layers.rope import RotaryPositionEmbedding2D

    rng = np.random.default_rng(2)
    B, N, C, H = 2, 11, 64, 4
    x = rng.standard_normal((B, N, C)).astype(np.float32)
    pos = _rand_positions(rng, B, N)

    rope_t = RotaryPositionEmbedding2D(100.0) if with_rope else None
    tattn = TAttention(C, num_heads=H, qk_norm=qk_norm, rope=rope_t, fused_attn=True)
    tattn.eval()
    with torch.no_grad():
        out_ref = tattn(
            torch.from_numpy(x),
            pos=torch.from_numpy(pos) if with_rope else None,
        ).numpy()

    params = torch_state_dict_to_flax(_sd(tattn))
    jattn = Attention(dim=C, num_heads=H, qk_norm=qk_norm)
    tables = compute_rope_2d(jnp.asarray(pos), C // H) if with_rope else None
    out_jax = jattn.apply({"params": params}, jnp.asarray(x), rope=tables)
    np.testing.assert_allclose(out_ref, np.asarray(out_jax), atol=2e-5)


def test_block_parity(ref):
    import torch
    from iggt.layers.block import Block as TBlock
    from iggt.layers.rope import RotaryPositionEmbedding2D

    rng = np.random.default_rng(3)
    B, N, C, H = 2, 9, 64, 4
    x = rng.standard_normal((B, N, C)).astype(np.float32)
    pos = _rand_positions(rng, B, N)

    rope_t = RotaryPositionEmbedding2D(100.0)
    tblock = TBlock(dim=C, num_heads=H, init_values=0.01, qk_norm=True, rope=rope_t)
    tblock.eval()
    with torch.no_grad():
        out_ref = tblock(torch.from_numpy(x), pos=torch.from_numpy(pos)).numpy()

    params = torch_state_dict_to_flax(_sd(tblock))
    jblock = Block(dim=C, num_heads=H, init_values=0.01, qk_norm=True)
    tables = compute_rope_2d(jnp.asarray(pos), C // H)
    out_jax = jblock.apply({"params": params}, jnp.asarray(x), rope=tables)
    np.testing.assert_allclose(out_ref, np.asarray(out_jax), atol=3e-5)


def test_vit_parity(ref):
    import torch
    from iggt.layers.vision_transformer import DinoVisionTransformer

    rng = np.random.default_rng(4)
    cfg = ViTConfig(
        img_size=70, patch_size=14, embed_dim=64, depth=2, num_heads=4,
        num_register_tokens=4, init_values=1.0,
    )
    tvit = DinoVisionTransformer(
        img_size=70, patch_size=14, embed_dim=64, depth=2, num_heads=4,
        num_register_tokens=4, init_values=1.0, interpolate_antialias=True,
        interpolate_offset=0.0, block_chunks=0,
    )
    tvit.eval()
    # randomize params that init to zeros so parity is meaningful
    with torch.no_grad():
        tvit.pos_embed.normal_(std=0.5)
        tvit.cls_token.normal_(std=0.5)
        tvit.register_tokens.normal_(std=0.5)

    # same-size input: no pos-embed interpolation
    x = rng.standard_normal((2, 3, 70, 70)).astype(np.float32)
    with torch.no_grad():
        out_ref = tvit.forward_features(torch.from_numpy(x))["x_norm_patchtokens"].numpy()

    params = torch_state_dict_to_flax(_sd(tvit))
    jvit = DinoViT(cfg)
    out_jax = jvit.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(out_ref, np.asarray(out_jax), atol=5e-5)

    # rectangular input: exercises antialiased bicubic pos-embed interpolation
    x2 = rng.standard_normal((1, 3, 42, 56)).astype(np.float32)
    with torch.no_grad():
        out_ref2 = tvit.forward_features(torch.from_numpy(x2))["x_norm_patchtokens"].numpy()
    out_jax2 = jvit.apply({"params": params}, jnp.asarray(x2.transpose(0, 2, 3, 1)))
    # interpolation kernels differ slightly (jax cubic vs torch antialiased
    # bicubic); tolerance covers the propagated difference
    np.testing.assert_allclose(out_ref2, np.asarray(out_jax2), atol=2e-2)
    corr = np.corrcoef(out_ref2.ravel(), np.asarray(out_jax2).ravel())[0, 1]
    assert corr > 0.9999


def test_conv2d_parity():
    import torch

    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 8, 10, 5)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    for (k, s, p) in [(3, 1, 1), (3, 2, 1), (1, 1, 0)]:
        tconv = torch.nn.Conv2d(5, 7, k, s, p)
        with torch.no_grad():
            out_ref = tconv(xt).numpy().transpose(0, 2, 3, 1)
        params = torch_state_dict_to_flax({
            "weight": tconv.weight.detach().numpy(),
            "bias": tconv.bias.detach().numpy(),
        })
        out_jax = Conv2d(7, k, s, p).apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(out_ref, np.asarray(out_jax), atol=1e-5)


def test_conv_transpose2d_parity():
    import torch

    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 8, 10, 5)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    # all (k, s, p) combos used by the heads
    for (k, s, p) in [(4, 4, 0), (2, 2, 0), (4, 2, 1)]:
        tconv = torch.nn.ConvTranspose2d(5, 7, k, s, p)
        with torch.no_grad():
            out_ref = tconv(xt).numpy().transpose(0, 2, 3, 1)
        params = torch_state_dict_to_flax(
            {"weight": tconv.weight.detach().numpy(),
             "bias": tconv.bias.detach().numpy()},
            conv_transpose_paths=lambda p: True,
        )
        out_jax = ConvTranspose2d(7, k, s, p).apply({"params": params}, jnp.asarray(x))
        assert out_ref.shape == out_jax.shape
        np.testing.assert_allclose(out_ref, np.asarray(out_jax), atol=1e-5)


def test_fused_qk_prep_attention_interpret():
    """Pallas fused LN+RoPE kernel == XLA prep + attention (interpret mode)."""
    from iggt_official_tpu.layers.rope import (
        compute_rope_2d, make_patch_positions, pack_rope_tables,
    )
    from iggt_official_tpu.ops.flash_attention import (
        _qk_prep_xla, attention, flash_attention_fused,
    )

    B, N, H, D = 2, 30, 2, 64
    pos = make_patch_positions(5, 5, B, 5)  # 5 special + 25 patches
    tables = compute_rope_2d(pos, D)
    cos, sin = pack_rope_tables(tables)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, N, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, N, H, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, N, H, D)).astype(np.float32))
    gq = jnp.asarray(rng.standard_normal(D).astype(np.float32))
    bq = jnp.asarray(rng.standard_normal(D).astype(np.float32))
    gk = jnp.asarray(rng.standard_normal(D).astype(np.float32))
    bk = jnp.asarray(rng.standard_normal(D).astype(np.float32))

    ref = attention(
        _qk_prep_xla(q, gq, bq, cos, sin, 1e-5),
        _qk_prep_xla(k, gk, bk, cos, sin, 1e-5),
        v,
    )
    for norm, rope in [(True, True), (False, True), (True, False)]:
        out = flash_attention_fused(
            q, k, v,
            cos if rope else None, sin if rope else None,
            (gq, bq, gk, bk) if norm else None,
            interpret=True,
        )
        if norm and rope:
            np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                       atol=2e-5, rtol=1e-4)
        assert out.shape == q.shape and not np.isnan(np.asarray(out)).any()
