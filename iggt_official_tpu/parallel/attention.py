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
  communication-overlapped ring variant can replace the gather later
  without changing the call sites.

Both return drop-in `attn_fn` callables for `Aggregator`/`VGGT`/`IGGT`.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from iggt_official_tpu.ops.flash_attention import attention
from iggt_official_tpu.parallel.mesh import AXIS_DATA, AXIS_SEQ


def make_frame_attention(
    mesh: Mesh, base_fn: Callable = attention
) -> Callable:
    """Batch-sharded local attention for the frame blocks."""
    spec = P((AXIS_DATA, AXIS_SEQ), None, None, None)

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_rep=False,
    )
    def fn(q, k, v):
        return base_fn(q, k, v)

    return fn


def make_global_attention(
    mesh: Mesh, base_fn: Callable = attention
) -> Callable:
    """Sequence-sharded attention with all-gathered K/V for the global
    blocks."""
    spec = P(AXIS_DATA, AXIS_SEQ, None, None)

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_rep=False,
    )
    def fn(q, k, v):
        k_full = jax.lax.all_gather(k, AXIS_SEQ, axis=1, tiled=True)
        v_full = jax.lax.all_gather(v, AXIS_SEQ, axis=1, tiled=True)
        return base_fn(q, k_full, v_full)

    return fn


def make_mesh_attention_fns(
    mesh: Optional[Mesh], base_fn: Callable = attention
):
    """(frame_attn_fn, global_attn_fn) for a mesh (or the plain kernel)."""
    if mesh is None:
        return base_fn, base_fn
    return make_frame_attention(mesh, base_fn), make_global_attention(
        mesh, base_fn
    )
