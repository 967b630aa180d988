"""Mesh-sharded attention wrappers for the aggregator.

GSPMD cannot partition a Pallas custom call, so under a mesh the two
attention patterns are expressed explicitly with `shard_map`:

- frame attention: (B*S, P, H, D) with the batch dim sharded over
  ("data", "seq") — embarrassingly parallel, each shard runs the local
  fused kernel with no communication (`aggregator.py:277-306` semantics).
- global attention: (B, S*P, H, D) with the token dim sharded over "seq" —
  queries stay local while K/V are all-gathered over the seq axis (the
  standard sequence-parallel attention baseline; the all-gather rides ICI
  and is O(N*H*D) per block vs the O(N^2) attention compute).  A
  communication-overlapped ring variant is `make_ring_global_attention`.

On meshes with a "model" axis the head dim is additionally sharded over it
in ALL three wrappers (heads are embarrassingly parallel in every pattern;
the seq all-gather / ppermute composes with the head split).  Head counts
that don't divide the model axis fall back to local heads for that call —
the q/k/v head counts differ between the DINOv2 patch embed (which also
receives the frame attn_fn, `models/aggregator.py:100`) and the trunk, so
the check is per-call rather than per-build.

Both return drop-in `attn_fn` callables for `Aggregator`/`VGGT`/`IGGT`.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from iggt_official_tpu.ops.flash_attention import attention
from iggt_official_tpu.parallel.mesh import AXIS_DATA, AXIS_MODEL, AXIS_SEQ


def _head_axis(mesh: Mesh, num_heads: int) -> Optional[str]:
    """"model" when the mesh has a tp axis that divides `num_heads`
    (the Megatron head split); None otherwise — an indivisible head count
    would die at trace time with an opaque shard_map divisibility error,
    so it degrades to locally-replicated heads instead."""
    if AXIS_MODEL not in mesh.axis_names:
        return None
    n_model = mesh.shape[AXIS_MODEL]
    if n_model <= 1 or num_heads % n_model != 0:
        return None
    return AXIS_MODEL


def make_frame_attention(
    mesh: Mesh, base_fn: Callable = attention
) -> Callable:
    """Batch-sharded local attention for the frame blocks (q/k/v are
    (B*S, P, H, D); heads shard over "model" on tp meshes)."""

    @functools.lru_cache(maxsize=None)
    def build(num_heads: int):
        spec = P((AXIS_DATA, AXIS_SEQ), None, _head_axis(mesh, num_heads), None)

        @functools.partial(
            shard_map, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_rep=False,
        )
        def fn(q, k, v):
            return base_fn(q, k, v)

        return fn

    return lambda q, k, v: build(q.shape[2])(q, k, v)


def make_global_attention(
    mesh: Mesh, base_fn: Callable = attention
) -> Callable:
    """Sequence-sharded attention with all-gathered K/V for the global
    blocks; heads shard over "model" on tp meshes (the O((S*P)^2) compute
    splits n_model-fold; the K/V gather is per-head-shard)."""

    @functools.lru_cache(maxsize=None)
    def build(num_heads: int):
        spec = P(AXIS_DATA, AXIS_SEQ, _head_axis(mesh, num_heads), None)

        @functools.partial(
            shard_map, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_rep=False,
        )
        def fn(q, k, v):
            k_full = jax.lax.all_gather(k, AXIS_SEQ, axis=1, tiled=True)
            v_full = jax.lax.all_gather(v, AXIS_SEQ, axis=1, tiled=True)
            return base_fn(q, k_full, v_full)

        return fn

    return lambda q, k, v: build(q.shape[2])(q, k, v)


def make_ring_global_attention(mesh: Mesh) -> Callable:
    """Ring attention over the "seq" axis (SURVEY §7 scale-out plan).

    Each device holds one sequence shard of Q/K/V; K/V shards rotate around
    the ring with `ppermute` while an online softmax accumulates — per-step
    memory is O(n_local^2) and XLA overlaps the permute with the next
    step's compute.  Equivalent numerics to the all-gather variant with
    num_devices-fold lower peak K/V memory; preferable at 32-64 views.
    Heads additionally shard over "model" on tp meshes.
    """
    import jax.numpy as jnp

    @functools.lru_cache(maxsize=None)
    def build(num_heads: int):
        spec = P(AXIS_DATA, AXIS_SEQ, _head_axis(mesh, num_heads), None)

        @functools.partial(
            shard_map, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_rep=False,
        )
        def fn(q, k, v):
            size = mesh.shape[AXIS_SEQ]
            scale = q.shape[-1] ** -0.5
            B, nq = q.shape[0], q.shape[1]
            H = q.shape[2]
            perm = [(j, (j + 1) % size) for j in range(size)]

            m0 = jnp.full((B, H, nq, 1), -1e30, jnp.float32)
            l0 = jnp.zeros((B, H, nq, 1), jnp.float32)
            acc0 = jnp.zeros((B, nq, H, q.shape[-1]), jnp.float32)

            def step(i, carry):
                m, l, acc, k_cur, v_cur = carry
                s = jnp.einsum("bqhd,bkhd->bhqk", q, k_cur).astype(
                    jnp.float32
                ) * scale
                m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
                p = jnp.exp(s - m_new)
                alpha = jnp.exp(m - m_new)
                l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
                pv = jnp.einsum(
                    "bhqk,bkhd->bqhd", p.astype(v_cur.dtype), v_cur
                )
                acc_new = (
                    acc * jnp.moveaxis(alpha, 1, 2) + pv.astype(jnp.float32)
                )
                k_next = jax.lax.ppermute(k_cur, AXIS_SEQ, perm)
                v_next = jax.lax.ppermute(v_cur, AXIS_SEQ, perm)
                return m_new, l_new, acc_new, k_next, v_next

            m, l, acc, _, _ = jax.lax.fori_loop(
                0, size, step, (m0, l0, acc0, k, v)
            )
            out = acc / jnp.moveaxis(jnp.maximum(l, 1e-30), 1, 2)
            return out.astype(q.dtype)

        return fn

    return lambda q, k, v: build(q.shape[2])(q, k, v)


def make_mesh_attention_fns(
    mesh: Optional[Mesh], base_fn: Callable = attention, ring: bool = False
):
    """(frame_attn_fn, global_attn_fn) for a mesh (or the plain kernel)."""
    if mesh is None:
        return base_fn, base_fn
    global_fn = (
        make_ring_global_attention(mesh)
        if ring
        else make_global_attention(mesh, base_fn)
    )
    return make_frame_attention(mesh, base_fn), global_fn
