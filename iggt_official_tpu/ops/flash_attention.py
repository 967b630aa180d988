"""Fused flash attention for TPU (Pallas) + memory-safe XLA fallback.

Replaces the reference's `torch.nn.functional.scaled_dot_product_attention`
(`iggt/layers/attention.py:61`).  The aggregator's global-attention blocks
run over N = S * ~1374 tokens (`iggt/models/aggregator.py:308-336`); naive
softmax materializes (H, N, N) logits — 11.6 GB fp32 at 8 views @ 518 px —
so the fused online-softmax kernel is required to fit HBM at all, and is
the main throughput lever (BASELINE.md north star).

Kernel design
- grid (B*H, N/BQ, N/BK): query blocks are parallel; the key-block axis is
  the innermost "arbitrary" dimension, so K/V stream through VMEM via the
  grid pipeline while fp32 running max/sum/accumulator scratch persists
  across it — no (N, N) buffer ever exists and VMEM stays bounded at any
  sequence length (32-64-view scenes included).
- QK^T and PV ride the MXU in the input dtype with f32 accumulation
  (``preferred_element_type``); exp on the VPU in fp32.  Matches
  `sdpa_xla`'s fp32-softmax numerics to bf16 noise.  ~37 TFLOP/s on v5e at
  the 8-view global-attention shape (the D=64 head dim caps the MXU at
  half depth).
- Sequence padding to the block size is masked on the key side
  (additive -1e30 before the running max).

`attention(q, k, v)` dispatches: Pallas on TPU, blockwise-XLA `sdpa_chunked`
elsewhere (same online-softmax algorithm expressed with lax.map — used by
the CPU test mesh and as the long-sequence fallback).

Fused qk-prep variant (`attention_fused` / `flash_attention_fused`): the
aggregator blocks' fp32 qk-norm LayerNorm + 2D RoPE run *inside* the kernel
on the VMEM-resident q/k blocks, skipping the XLA pre-pass whose fp32
64-lane intermediates are HBM-layout-hostile (measured ~1.9x per frame
block on v5e).  The rotate-half is a (D, D) +/-1 constant matmul on the
MXU (`_rot_matrix`) — exact in any dtype, no lane shuffles.  Used when one
key block covers the sequence (per-frame attention); streaming shapes keep
the XLA pre-pass (k-prep would be recomputed per query block).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(
    *refs,
    bk: int, n_keys: int, scale: float, has_bias: bool,
):
    if has_bias:
        q_ref, k_ref, v_ref, bias_ref, o_ref, m_ref, l_ref, acc_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref = refs
        bias_ref = None
    """Streaming flash step: one (BQ, D) query block x one (BK, D) key block.

    The kv-block index is the innermost grid dimension; the fp32 running
    max/sum/accumulator live in VMEM scratch and persist across it, so K/V
    stream through bounded VMEM via the grid pipeline (whole-K residency
    would blow the 16MB VMEM at long sequences).
    """
    ik = pl.program_id(2)
    num_kb = pl.num_programs(2)

    @pl.when(ik == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                                       # (BQ, D), input dtype
    bq = q.shape[0]
    k = k_ref[0]                                       # (BK, D)
    v = v_ref[0]
    # keep the matmul in the input dtype (bf16 rides the MXU at full rate);
    # accumulate f32 and apply the softmax scale afterwards
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                          # (BQ, BK) f32
    if bias_ref is not None:
        s = s + bias_ref[0][None, :]                   # per-key logit bias
    key_idx = ik * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    s = jnp.where(key_idx < n_keys, s, NEG_INF)

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    m_ref[:] = m_new
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ik == num_kb - 1)
    def _():
        o_ref[0] = (
            acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
        ).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_bias: Optional[jax.Array] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
) -> jax.Array:
    """Fused attention, (B, Nq, H, D) x (B, Nk, H, D) -> (B, Nq, H, D).

    ``key_bias`` (B, Nk) fp32 is added to every query's logits — the
    proportional-attention term for merged KV tokens (ops/token_merge.py).
    No masking/causality."""
    B, Nq, H, D = q.shape
    Nk = k.shape[1]
    scale = 1.0 / math.sqrt(D)

    # adaptive blocks: streaming 1024-blocks at long N; at short N a single
    # key block with a bounded query block minimizes grid-pipeline overhead
    # (~1.3x over 512/512 at the per-frame N=1374, v5e)
    if block_q is None or block_k is None:
        if max(Nq, Nk) <= 2048:
            block_q, block_k = 512, 2048
        else:
            block_q = block_k = 1024
    bq = min(block_q, _round_up(Nq, 128))
    bk = min(block_k, _round_up(Nk, 128))
    nq_pad = _round_up(Nq, bq)
    nk_pad = _round_up(Nk, bk)

    def to_bh(x, n_pad):  # (B, N, H, D) -> (B*H, N_pad, D)
        n = x.shape[1]
        x = jnp.swapaxes(x, 1, 2).reshape(B * H, n, D)
        return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))

    qb, kb, vb = to_bh(q, nq_pad), to_bh(k, nk_pad), to_bh(v, nk_pad)
    has_bias = key_bias is not None
    inputs = [qb, kb, vb]
    in_specs = [
        pl.BlockSpec((1, bq, D), lambda b, iq, ik: (b, iq, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, D), lambda b, iq, ik: (b, ik, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, D), lambda b, iq, ik: (b, ik, 0),
                     memory_space=pltpu.VMEM),
    ]
    if has_bias:
        inputs.append(
            jnp.pad(key_bias.astype(jnp.float32), ((0, 0), (0, nk_pad - Nk)))
        )
        in_specs.append(
            pl.BlockSpec((1, bk), lambda b, iq, ik: (b // H, ik),
                         memory_space=pltpu.VMEM)
        )

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, bk=bk, n_keys=Nk, scale=scale, has_bias=has_bias
        ),
        grid=(B * H, nq_pad // bq, nk_pad // bk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, D), lambda b, iq, ik: (b, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, nq_pad, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),   # running max
            pltpu.VMEM((bq, 1), jnp.float32),   # running sum
            pltpu.VMEM((bq, D), jnp.float32),   # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Nq * Nk * D,
            bytes_accessed=(
                B * H * (2 * Nq + 2 * Nk) * D
            ) * q.dtype.itemsize,
            transcendentals=B * H * Nq * Nk,
        ),
    )(*inputs)

    out = out[:, :Nq].reshape(B, H, Nq, D)
    return jnp.swapaxes(out, 1, 2)


def _rot_matrix(d: int) -> jnp.ndarray:
    """The 2D-RoPE rotate-half as a (D, D) +/-1 constant.

    ``x @ R`` equals ``concat(-x[q:2q], x[0:q], -x[3q:4q], x[2q:3q])`` with
    q = D/4 — the rotate-half pairing of `layers/rope.py` applied per
    spatial half.  Expressing the lane permutation as a tiny matmul keeps
    it on the MXU inside the Pallas kernel (lane shuffles at 16-element
    granularity are slow on the VPU); every product is x_i * (+/-1), so the
    result is exact in any float dtype.
    """
    q = d // 4
    i = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
    blk = jnp.equal(i // (2 * q), j // (2 * q))  # stay within the y/x half
    lower = jnp.equal((i % (2 * q)) - q, j % (2 * q))   # R[j+q, j] = -1
    upper = jnp.equal((i % (2 * q)) + q, j % (2 * q))   # R[j-q, j] = +1
    return jnp.where(blk & lower, -1.0, jnp.where(blk & upper, 1.0, 0.0)).astype(
        jnp.float32
    )


def _ln_rope_block(x, gamma, beta, cos, sin, rot, eps: float, use_norm: bool):
    """fp32 qk-norm + 2D RoPE on a VMEM-resident (BLK, D) tile.

    Mirrors the unfused path exactly: flax LayerNorm with fast variance
    (`layers/blocks.py` q_norm/k_norm, fp32) then `apply_rope_2d` fp32
    mul-adds; the caller casts the result back to the compute dtype.
    ``rot`` is the (D, D) +/-1 rotate-half matrix, passed in as a kernel
    input (generating it in-kernel scalarizes in Mosaic and explodes
    compile time).
    """
    x = x.astype(jnp.float32)
    if use_norm:
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu, 0.0
        )
        x = (x - mu) * jax.lax.rsqrt(var + eps)
        x = x * gamma + beta
    if cos is not None:
        r = jax.lax.dot(x, rot, preferred_element_type=jnp.float32)
        x = x * cos + r * sin
    return x


def _flash_fused_kernel(
    *refs,
    bk: int, n_keys: int, scale: float, has_bias: bool,
    use_norm: bool, use_rope: bool, eps: float,
):
    """Flash step with qk-norm + RoPE fused into the q/k block loads.

    Ref order: q, k, v, [cos_q, sin_q, cos_k, sin_k, rot], [gq, bq, gk, bkb],
    [bias], o, then scratch m, l, acc, qp.  The prepped q block is computed
    once (ik == 0) into fp32 scratch and reused across the key-block sweep;
    k is prepped per block on the VPU/MXU while the pipeline streams.
    """
    it = iter(refs)
    q_ref, k_ref, v_ref = next(it), next(it), next(it)
    rot_ref = None
    if use_rope:
        cosq_ref, sinq_ref, cosk_ref, sink_ref, rot_ref = (
            next(it), next(it), next(it), next(it), next(it)
        )
    if use_norm:
        gq_ref, bq_ref, gk_ref, bkb_ref = next(it), next(it), next(it), next(it)
    bias_ref = next(it) if has_bias else None
    o_ref = next(it)
    m_ref, l_ref, acc_ref, qp_ref = next(it), next(it), next(it), next(it)

    ik = pl.program_id(2)
    num_kb = pl.num_programs(2)

    @pl.when(ik == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        qp_ref[:] = _ln_rope_block(
            q_ref[0],
            gq_ref[0] if use_norm else None,
            bq_ref[0] if use_norm else None,
            cosq_ref[0] if use_rope else None,
            sinq_ref[0] if use_rope else None,
            rot_ref[:] if use_rope else None,
            eps, use_norm,
        ).astype(qp_ref.dtype)

    q = qp_ref[:]                                      # (BQ, D) compute dtype
    bq = q.shape[0]
    k = _ln_rope_block(
        k_ref[0],
        gk_ref[0] if use_norm else None,
        bkb_ref[0] if use_norm else None,
        cosk_ref[0] if use_rope else None,
        sink_ref[0] if use_rope else None,
        rot_ref[:] if use_rope else None,
        eps, use_norm,
    ).astype(q.dtype)                                  # (BK, D)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    if bias_ref is not None:
        s = s + bias_ref[0][None, :]
    key_idx = ik * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    s = jnp.where(key_idx < n_keys, s, NEG_INF)

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    m_ref[:] = m_new
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ik == num_kb - 1)
    def _():
        o_ref[0] = (
            acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("eps", "block_q", "block_k", "interpret"),
)
def flash_attention_fused(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    rope_cos: Optional[jax.Array] = None,
    rope_sin: Optional[jax.Array] = None,
    qk_norm_params: Optional[tuple] = None,
    key_bias: Optional[jax.Array] = None,
    eps: float = 1e-5,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention with qk-norm + 2D RoPE fused into the kernel.

    q/k/v: (B, N, H, D) in the compute dtype, *pre* norm/rope.
    rope_cos/rope_sin: (B, N, D) fp32 packed tables (`rope.pack_rope_tables`).
    qk_norm_params: (gamma_q, beta_q, gamma_k, beta_k), each (D,) fp32.

    Fusing the fp32 LN + rotation into the block loads removes the separate
    HBM round trips the XLA pre-pass pays (the 64-lane fp32 intermediates
    dominate the aggregator's non-matmul time at 8 views).
    """
    B, Nq, H, D = q.shape
    Nk = k.shape[1]
    scale = 1.0 / math.sqrt(D)
    use_rope = rope_cos is not None
    use_norm = qk_norm_params is not None

    if block_q is None or block_k is None:
        if max(Nq, Nk) <= 2048:
            # single key block + bounded query block: minimal grid overhead
            # at the per-frame shapes (~1.4x over 512/512 at N=1374) while
            # keeping Mosaic compile time in check (whole-N query blocks
            # compile 30x slower for ~5% less throughput)
            block_q, block_k = 512, 2048
        else:
            block_q = block_k = 1024
    bq = min(block_q, _round_up(Nq, 128))
    bk = min(block_k, _round_up(Nk, 128))
    nq_pad = _round_up(Nq, bq)
    nk_pad = _round_up(Nk, bk)

    def to_bh(x, n_pad):  # (B, N, H, D) -> (B*H, N_pad, D)
        n = x.shape[1]
        x = jnp.swapaxes(x, 1, 2).reshape(B * H, n, D)
        return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))

    inputs = [to_bh(q, nq_pad), to_bh(k, nk_pad), to_bh(v, nk_pad)]
    in_specs = [
        pl.BlockSpec((1, bq, D), lambda b, iq, ik: (b, iq, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, D), lambda b, iq, ik: (b, ik, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, D), lambda b, iq, ik: (b, ik, 0),
                     memory_space=pltpu.VMEM),
    ]
    if use_rope:
        cos = rope_cos.astype(jnp.float32)
        sin = rope_sin.astype(jnp.float32)
        padq = ((0, 0), (0, nq_pad - Nq), (0, 0))
        padk = ((0, 0), (0, nk_pad - Nk), (0, 0))
        inputs += [
            jnp.pad(cos[:, :Nq], padq), jnp.pad(sin[:, :Nq], padq),
            jnp.pad(cos, padk), jnp.pad(sin, padk),
            _rot_matrix(D),
        ]
        in_specs += [
            pl.BlockSpec((1, bq, D), lambda b, iq, ik: (b // H, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, D), lambda b, iq, ik: (b // H, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda b, iq, ik: (b // H, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda b, iq, ik: (b // H, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), lambda b, iq, ik: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    if use_norm:
        for p in qk_norm_params:
            inputs.append(p.astype(jnp.float32).reshape(1, D))
            in_specs.append(
                pl.BlockSpec((1, D), lambda b, iq, ik: (0, 0),
                             memory_space=pltpu.VMEM)
            )
    if key_bias is not None:
        inputs.append(
            jnp.pad(key_bias.astype(jnp.float32), ((0, 0), (0, nk_pad - Nk)))
        )
        in_specs.append(
            pl.BlockSpec((1, bk), lambda b, iq, ik: (b // H, ik),
                         memory_space=pltpu.VMEM)
        )

    out = pl.pallas_call(
        functools.partial(
            _flash_fused_kernel, bk=bk, n_keys=Nk, scale=scale,
            has_bias=key_bias is not None, use_norm=use_norm,
            use_rope=use_rope, eps=eps,
        ),
        grid=(B * H, nq_pad // bq, nk_pad // bk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, D), lambda b, iq, ik: (b, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, nq_pad, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),   # running max
            pltpu.VMEM((bq, 1), jnp.float32),   # running sum
            pltpu.VMEM((bq, D), jnp.float32),   # output accumulator
            pltpu.VMEM((bq, D), q.dtype),       # prepped q block
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Nq * Nk * D,
            bytes_accessed=(
                B * H * (2 * Nq + 2 * Nk) * D
            ) * q.dtype.itemsize,
            transcendentals=B * H * Nq * Nk,
        ),
        interpret=interpret,
    )(*inputs)

    out = out[:, :Nq].reshape(B, H, Nq, D)
    return jnp.swapaxes(out, 1, 2)


def _qk_prep_xla(x, gamma, beta, cos, sin, eps):
    """XLA reference of the in-kernel prep (CPU path + numerics tests)."""
    dt = x.dtype
    x = x.astype(jnp.float32)
    if gamma is not None:
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu, 0.0)
        x = (x - mu) * jax.lax.rsqrt(var + eps) * gamma + beta
    if cos is not None:
        # precision="highest" keeps the fp32 rotation exact on TPU (the
        # default matmul precision would round through bf16), matching the
        # concat-based rotate-half of apply_rope_2d and the fp32 island
        # argument in ops/interpolate.py
        r = jnp.matmul(x, _rot_matrix(x.shape[-1]), precision="highest")
        x = x * cos[..., None, :] + r * sin[..., None, :]
    return x.astype(dt)


def attention_fused(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    rope_cos: Optional[jax.Array] = None,
    rope_sin: Optional[jax.Array] = None,
    qk_norm_params: Optional[tuple] = None,
    key_bias: Optional[jax.Array] = None,
    eps: float = 1e-5,
) -> jax.Array:
    """qk-norm + RoPE + attention, fused on TPU, composed in XLA elsewhere.

    Same contract as `flash_attention_fused`; the non-TPU path applies the
    identical fp32 prep with XLA ops and reuses the `attention` dispatcher.
    """
    if rope_cos is None and qk_norm_params is None:
        return attention(q, k, v, key_bias)
    # Fuse the prep into the kernel only when one key block covers the whole
    # sequence (the per-frame shapes): there the k-side prep runs exactly
    # once and the fused kernel measures ~1.9x over the XLA prep + softmax
    # (v5e, N=1374).  At streaming lengths the k-prep would be recomputed
    # per query block, which measures *slower* than the XLA pre-pass.
    if _running_on_tpu() and max(q.shape[1], k.shape[1]) <= 2048:
        return flash_attention_fused(
            q, k, v, rope_cos, rope_sin, qk_norm_params, key_bias, eps=eps
        )
    gq = bq = gk = bk = None
    if qk_norm_params is not None:
        gq, bq, gk, bk = qk_norm_params
    q = _qk_prep_xla(q, gq, bq, rope_cos, rope_sin, eps)
    k = _qk_prep_xla(k, gk, bk, rope_cos, rope_sin, eps)
    return attention(q, k, v, key_bias)


attention_fused.supports_fused_qk_prep = True


def sdpa_chunked(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_bias: Optional[jax.Array] = None,
    block_q: int = 1024,
) -> jax.Array:
    """Blockwise-XLA attention: same O(N) memory idea without Pallas.

    Numerically identical to full softmax (per-block exact softmax over the
    full key axis in fp32); memory is (H, BQ, N) instead of (H, N, N).
    """
    B, N, H, D = q.shape
    scale = 1.0 / math.sqrt(D)
    n_blocks = -(-N // block_q)
    n_pad = n_blocks * block_q
    qp = jnp.pad(q, ((0, 0), (0, n_pad - N), (0, 0), (0, 0)))
    qp = qp.reshape(B, n_blocks, block_q, H, D)

    def one_block(qb):  # (B, BQ, H, D)
        s = jnp.einsum("bqhd,bkhd->bhqk", qb, k).astype(jnp.float32) * scale
        if key_bias is not None:
            s = s + key_bias[:, None, None, :]
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)

    out = jax.lax.map(one_block, jnp.swapaxes(qp, 0, 1))   # (nb, B, BQ, H, D)
    out = jnp.swapaxes(out, 0, 1).reshape(B, n_pad, H, D)
    return out[:, :N]


def _running_on_tpu() -> bool:
    # honour an explicitly pinned default device (the CPU test harness pins
    # jax_default_device to cpu while the TPU plugin stays registered)
    dev = getattr(jax.config, "jax_default_device", None)
    if dev is not None:
        return dev.platform == "tpu"
    return jax.default_backend() == "tpu"


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_bias: Optional[jax.Array] = None,
    rope_cos: Optional[jax.Array] = None,
    rope_sin: Optional[jax.Array] = None,
    qk_norm_params: Optional[tuple] = None,
) -> jax.Array:
    """Default fused attention.

    Dispatch measured on v5e (8 views @ 518px): XLA's fused softmax wins at
    short sequences (the per-frame 1369-token blocks), the Pallas kernel
    wins — and is the only O(N)-memory option — at the long global-attention
    sequences; CPU always takes the blockwise-XLA path.  ``key_bias``
    (B, Nk) is the merged-KV proportional-attention term.

    When ``rope_cos``/``qk_norm_params`` are given (the `Attention` module's
    fused protocol), the fp32 qk-norm + 2D-RoPE prep is fused into the
    Pallas kernel on TPU (`attention_fused`).
    """
    if rope_cos is not None or qk_norm_params is not None:
        return attention_fused(
            q, k, v, rope_cos, rope_sin, qk_norm_params, key_bias
        )
    N = max(q.shape[1], k.shape[1])
    if _running_on_tpu() and (N >= 4096 or 512 <= N <= 2048):
        # long N: the only O(N)-memory option; mid N: the single-key-block
        # kernel config beats XLA's fused softmax (2.8ms vs 3.5ms at the
        # per-frame N=1374, v5e) by never materializing (H, N, N) logits.
        # Tiny N stays on XLA — the logits fit in cache and the pallas_call
        # launch overhead dominates.
        return flash_attention(q, k, v, key_bias)
    if N <= 4096:
        # full softmax materializes (H, N, N) <= ~1GB here; XLA fuses it
        # well.  NB: keep the logits in the input dtype when there is no
        # bias — forcing an early fp32 cast doubles the materialized
        # intermediate and measurably slows the frame-attention blocks.
        scale = q.shape[-1] ** -0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        if key_bias is not None:
            logits = logits.astype(jnp.float32) + key_bias[:, None, None, :]
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v)
    return sdpa_chunked(q, k, v, key_bias)


attention.supports_fused_qk_prep = True
