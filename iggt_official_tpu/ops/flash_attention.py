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
    block_q: int = 1024,
    block_k: int = 1024,
) -> jax.Array:
    """Fused attention, (B, Nq, H, D) x (B, Nk, H, D) -> (B, Nq, H, D).

    ``key_bias`` (B, Nk) fp32 is added to every query's logits — the
    proportional-attention term for merged KV tokens (ops/token_merge.py).
    No masking/causality."""
    B, Nq, H, D = q.shape
    Nk = k.shape[1]
    scale = 1.0 / math.sqrt(D)

    # adaptive blocks: large blocks win at long N, but padding N up to the
    # block size wastes FLOPs at short N (e.g. the per-frame ViT's 1369
    # tokens padded to 2048 is ~50% waste)
    if max(Nq, Nk) < 4 * max(block_q, block_k):
        block_q = block_k = 512
    blk = max(block_q, block_k)
    bq = min(blk, _round_up(Nq, 128))
    bk = min(blk, _round_up(Nk, 128))
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
) -> jax.Array:
    """Default fused attention.

    Dispatch measured on v5e (8 views @ 518px): XLA's fused softmax wins at
    short sequences (the per-frame 1369-token blocks), the Pallas kernel
    wins — and is the only O(N)-memory option — at the long global-attention
    sequences; CPU always takes the blockwise-XLA path.  ``key_bias``
    (B, Nk) is the merged-KV proportional-attention term.
    """
    N = max(q.shape[1], k.shape[1])
    if _running_on_tpu() and N >= 4096:
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
