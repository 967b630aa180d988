"""KV token merging (ops/token_merge.py) + the key-bias attention path."""

import numpy as np
import jax
import jax.numpy as jnp

from iggt_official_tpu.ops.flash_attention import attention, sdpa_chunked
from iggt_official_tpu.ops.token_merge import (
    compute_merge_plan,
    make_merged_attention,
    merge_kv,
)


def _rand(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(0, 1, shape).astype(np.float32)
    )


def test_plan_partitions_tokens_and_respects_protection():
    B, N, C = 2, 32, 8
    x = _rand((B, N, C))
    protect = np.zeros((B, N), bool)
    protect[:, :6] = True  # first 6 tokens must survive
    plan = compute_merge_plan(x, r=8, protect=jnp.asarray(protect))

    for b in range(B):
        kept = set(np.asarray(plan.kept_idx[b]).tolist())
        src = set(np.asarray(plan.src_idx[b]).tolist())
        assert kept | src == set(range(N))
        assert not kept & src
        assert not src & set(range(6))  # protected never merged away
        # every merge lands on an even (kept) position
        dst_tokens = np.asarray(plan.kept_idx[b])[np.asarray(plan.dst[b])]
        assert all(t % 2 == 0 for t in dst_tokens)
        # ... and never on a protected token: their K/V stay bit-exact
        assert not set(dst_tokens.tolist()) & set(range(6))


def test_merged_attention_exact_on_duplicate_tokens():
    """Proportional attention: merging exact duplicates is lossless."""
    B, N, H, D = 1, 16, 2, 8
    rng = np.random.default_rng(1)
    base = rng.normal(0, 1, (B, N // 2, H, D)).astype(np.float32)
    # token 2i+1 duplicates token 2i
    k = jnp.asarray(np.repeat(base, 2, axis=1))
    v = jnp.asarray(np.repeat(rng.normal(0, 1, (B, N // 2, H, D)), 2, axis=1)
                    .astype(np.float32))
    q = _rand((B, N, H, D), seed=2)

    feat = k.reshape(B, N, H * D)
    plan = compute_merge_plan(feat, r=N // 2, protect=jnp.zeros((B, N), bool))
    k_m, v_m, log_s = merge_kv(k, v, plan)
    np.testing.assert_allclose(np.asarray(jnp.exp(log_s)), 2.0)

    ref = attention(q, k, v)
    out = attention(q, k_m, v_m, key_bias=log_s)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )

    out2 = make_merged_attention(plan)(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_key_bias_matches_explicit_softmax():
    B, Nq, Nk, H, D = 2, 24, 16, 2, 8
    q, k, v = _rand((B, Nq, H, D), 3), _rand((B, Nk, H, D), 4), _rand(
        (B, Nk, H, D), 5
    )
    bias = _rand((B, Nk), 6)
    s = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(D) + np.asarray(bias)[
        :, None, None, :
    ]
    p = jax.nn.softmax(jnp.asarray(s), axis=-1)
    ref = jnp.einsum("bhqk,bkhd->bqhd", p, v)
    np.testing.assert_allclose(
        np.asarray(attention(q, k, v, key_bias=bias)), np.asarray(ref),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sdpa_chunked(q, k, v, key_bias=bias, block_q=8)),
        np.asarray(ref), rtol=1e-5, atol=1e-5,
    )


def test_aggregator_global_merge_runs():
    from iggt_official_tpu.config import ModelConfig
    from iggt_official_tpu.models.vggt import IGGT

    cfg = ModelConfig().scaled(
        embed_dim=32, depth=2, num_heads=2, img_size=28, patch_embed="conv"
    )
    model = IGGT(cfg)
    images = _rand((1, 4, 28, 28, 3), 7)
    params = model.init(jax.random.PRNGKey(0), images)
    out = model.apply(params, images, global_merge_r=32)
    for key in ["depth", "world_points", "pose_enc", "part_feat"]:
        assert np.isfinite(np.asarray(out[key])).all(), key

    # identical frames + merge -> close to the unmerged forward (merged
    # tokens are exact duplicates up to per-frame special tokens)
    dup = jnp.tile(images[:, :1], (1, 4, 1, 1, 1))
    ref = model.apply(params, dup)
    got = model.apply(params, dup, global_merge_r=32)
    np.testing.assert_allclose(
        np.asarray(got["depth"]), np.asarray(ref["depth"]), rtol=0.1, atol=0.05
    )


def test_protected_kv_pass_through_exact():
    """Protected tokens are neither merged away nor merge targets, so
    their merged K/V rows equal the originals bit-for-bit."""
    B, N, H, D = 1, 32, 2, 8
    k = _rand((B, N, H, D), seed=3)
    v = _rand((B, N, H, D), seed=4)
    protect = np.zeros((B, N), bool)
    protect[:, :10] = True
    plan = compute_merge_plan(
        k.reshape(B, N, H * D), r=6, protect=jnp.asarray(protect)
    )
    k_m, v_m, log_s = merge_kv(k, v, plan)
    kept = np.asarray(plan.kept_idx[0])
    for slot, tok in enumerate(kept):
        if tok < 10:
            np.testing.assert_array_equal(
                np.asarray(k_m[0, slot]), np.asarray(k[0, tok]))
            np.testing.assert_array_equal(
                np.asarray(v_m[0, slot]), np.asarray(v[0, tok]))
            assert float(log_s[0, slot]) == 0.0


def test_single_view_merge_request_is_noop():
    """S=1 protects every token; a nonzero global_merge_r must quietly
    disable merging instead of raising at trace time."""
    import dataclasses

    from iggt_official_tpu.config import ModelConfig
    from iggt_official_tpu.models.vggt import VGGT

    cfg = ModelConfig().scaled(
        embed_dim=32, depth=2, num_heads=2, img_size=28, patch_embed="conv"
    )
    cfg = dataclasses.replace(cfg, enable_part=False, name="vggt")
    model = VGGT(cfg)
    images = _rand((1, 1, 28, 28, 3), seed=5)
    params = model.init(jax.random.PRNGKey(0), images)
    out = model.apply(params, images, global_merge_r=64)
    assert np.isfinite(np.asarray(out["depth"])).all()
