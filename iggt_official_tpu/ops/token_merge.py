"""Training-free KV token merging for the global-attention blocks.

FastVGGT-style acceleration (arXiv:2509.02560, see PAPERS.md): multi-view
patch tokens are heavily redundant across frames, so the O((S*P)^2)
global attention can run against a merged key/value set with negligible
accuracy change.  Differences from the torch formulation, for TPU:

- static shapes everywhere: the merge count ``r`` is a compile-time
  constant, the plan is (kept_idx, src_idx, dst) index arrays, and the
  reduced KV length is ``N - r`` — no data-dependent shapes under jit.
- queries stay full-length and only K/V are merged, so no unmerge scatter
  is needed and the output token count is unchanged.
- the merge plan is computed ONCE per forward from the trunk input tokens
  and reused by every global block (the matching cost would otherwise
  rival the attention it saves).
- merged keys use proportional attention: a merged key of ``s`` source
  tokens carries an additive ``log(s)`` logit bias, threaded through the
  Pallas flash kernel (`ops/flash_attention.py`) as a per-key bias.

Matching is ToMe-style bipartite soft matching (even positions = targets,
odd positions = merge candidates) on cosine similarity; protected tokens
(camera/register tokens and the whole reference frame 0) are excluded
from BOTH sides — they are never merged away and never receive merges, so
their keys/values pass through bit-exact.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from iggt_official_tpu.ops.flash_attention import attention


class MergePlan(NamedTuple):
    kept_idx: jax.Array  # (B, N - r) token indices that survive
    src_idx: jax.Array   # (B, r) token indices merged away
    dst: jax.Array       # (B, r) position in kept_idx receiving each source


def compute_merge_plan(
    x: jax.Array, r: int, protect: jax.Array
) -> MergePlan:
    """Bipartite soft matching over tokens ``x`` (B, N, C).

    ``protect`` (B, N) bool marks tokens that neither merge away nor
    receive merges (their K/V pass through exactly).
    ``r`` must not exceed the number of unprotected odd-position tokens —
    the caller clamps it (the protected set is static in practice).
    """
    B, N, _ = x.shape
    nb = (N + 1) // 2          # even positions: merge targets
    na = N // 2                # odd positions: merge candidates
    if not 0 < r <= na:
        raise ValueError(f"r={r} out of range for {na} candidates")

    xn = x * jax.lax.rsqrt(
        jnp.sum(jnp.square(x), axis=-1, keepdims=True) + 1e-6
    )
    a, b = xn[:, 1::2], xn[:, 0::2]
    scores = jnp.einsum("bac,bkc->bak", a, b)          # (B, na, nb)
    scores = jnp.where(protect[:, 1::2][:, :, None], -jnp.inf, scores)
    # protected targets receive no merges either: their K/V stay exact
    scores = jnp.where(protect[:, 0::2][:, None, :], -jnp.inf, scores)

    best = jnp.max(scores, axis=-1)                     # (B, na)
    best_dst = jnp.argmax(scores, axis=-1)              # (B, na) into b-set
    _, merge_a = jax.lax.top_k(best, r)                 # (B, r) into a-set

    merged_mask = jnp.zeros((B, na), bool)
    batch = jnp.arange(B)[:, None]
    merged_mask = merged_mask.at[batch, merge_a].set(True)
    # kept candidates in original order (stable sort puts False first)
    order = jnp.argsort(merged_mask.astype(jnp.int32), axis=-1, stable=True)
    kept_a = order[:, : na - r]

    even = jnp.broadcast_to(2 * jnp.arange(nb)[None], (B, nb))
    kept_idx = jnp.concatenate([even, 2 * kept_a + 1], axis=1)  # (B, N - r)
    src_idx = 2 * merge_a + 1
    dst = jnp.take_along_axis(best_dst, merge_a, axis=1)  # b-set slot == kept slot
    return MergePlan(kept_idx=kept_idx, src_idx=src_idx, dst=dst)


def merge_kv(
    k: jax.Array, v: jax.Array, plan: MergePlan
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Merge K/V (B, N, H, D) down to (B, N - r, H, D) by averaging each
    merged source into its target; returns (k, v, log_sizes)."""
    B = k.shape[0]
    batch = jnp.arange(B)[:, None]
    idx = plan.kept_idx[:, :, None, None]

    def reduce(x):
        kept = jnp.take_along_axis(x, idx, axis=1)
        src = jnp.take_along_axis(x, plan.src_idx[:, :, None, None], axis=1)
        return kept.astype(jnp.float32).at[batch, plan.dst].add(
            src.astype(jnp.float32)
        )

    sizes = jnp.ones(plan.kept_idx.shape, jnp.float32).at[
        batch, plan.dst
    ].add(1.0)
    k_m = (reduce(k) / sizes[:, :, None, None]).astype(k.dtype)
    v_m = (reduce(v) / sizes[:, :, None, None]).astype(v.dtype)
    return k_m, v_m, jnp.log(sizes)


def make_merged_attention(plan: MergePlan) -> Callable:
    """attn_fn(q, k, v) that runs attention against the merged K/V with the
    proportional-attention log-size key bias."""

    def attn(q, k, v):
        k_m, v_m, log_s = merge_kv(k, v, plan)
        return attention(q, k_m, v_m, key_bias=log_s)

    return attn
