"""Fused flash attention for TPU (Pallas) + memory-safe XLA fallback.

Replaces the reference's `torch.nn.functional.scaled_dot_product_attention`
(`iggt/layers/attention.py:61`).  The aggregator's global-attention blocks
run over N = S * ~1374 tokens (`iggt/models/aggregator.py:308-336`); naive
softmax materializes (H, N, N) logits — 11.6 GB fp32 at 8 views @ 518 px —
so the fused online-softmax kernel is required to fit HBM at all, and is
the main throughput lever (BASELINE.md north star).

Kernel design
- grid (B*H, N/BQ): one program per query block per (batch, head).
- K/V live in VMEM whole (bf16 K+V at 24k tokens x 64 dim = 6 MB); the
  online-softmax loop walks BK-sized key blocks with fp32 running max/sum
  and an fp32 accumulator — no (N, N) buffer ever exists.
- QK^T and PV ride the MXU with ``preferred_element_type=f32``; exp on the
  VPU in fp32.  Matches `sdpa_xla`'s fp32-softmax numerics to bf16 noise.
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


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, bk: int, n_keys: int, scale: float):
    """One (BQ, D) query block against all keys with online softmax."""
    q = q_ref[0].astype(jnp.float32) * scale           # (BQ, D)
    bq, d = q.shape
    n_pad = k_ref.shape[1]
    num_kb = n_pad // bk

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(i * bk, bk), :]             # (BK, D)
        v = v_ref[0, pl.ds(i * bk, bk), :]
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # (BQ, BK)
        # mask padded keys
        key_idx = i * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        s = jnp.where(key_idx < n_keys, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = 512,
    block_k: int = 512,
) -> jax.Array:
    """Fused attention, (B, N, H, D) -> (B, N, H, D), no masking/causality."""
    B, N, H, D = q.shape
    scale = 1.0 / math.sqrt(D)

    bq = min(block_q, _round_up(N, 128))
    bk = min(block_k, _round_up(N, 128))
    n_pad = _round_up(N, max(bq, bk))

    def to_bh(x):  # (B, N, H, D) -> (B*H, N_pad, D)
        x = jnp.swapaxes(x, 1, 2).reshape(B * H, N, D)
        return jnp.pad(x, ((0, 0), (0, n_pad - N), (0, 0)))

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, bk=bk, n_keys=N, scale=scale),
        grid=(B * H, n_pad // bq),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, iq: (b, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, D), lambda b, iq: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, D), lambda b, iq: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda b, iq: (b, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, n_pad, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * N * N * D,
            bytes_accessed=(3 * B * H * N * D + B * H * N * D) * q.dtype.itemsize,
            transcendentals=B * H * N * N,
        ),
    )(qb, kb, vb)

    out = out[:, :N].reshape(B, H, N, D)
    return jnp.swapaxes(out, 1, 2)


def sdpa_chunked(
    q: jax.Array, k: jax.Array, v: jax.Array, block_q: int = 1024
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
        s = jnp.einsum("bqhd,bkhd->bhqk", qb, k) * scale
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
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


def attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Default fused attention: Pallas on TPU, blockwise XLA elsewhere."""
    if _running_on_tpu():
        return flash_attention(q, k, v)
    return sdpa_chunked(q, k, v)
