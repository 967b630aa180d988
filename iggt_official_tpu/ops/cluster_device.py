"""Device-side mutual-reachability MST for the clustering pipeline.

The HDBSCAN stage (ops/cluster.py) consumes the MST of the
mutual-reachability kNN graph; at the demo-scale 150k-point subsample the
(K, k=64) kNN arrays are ~76 MB, which is expensive to pull through a
remote-TPU tunnel (~35 MB/s down), and host-side MST construction costs
another ~0.8 s of single-core Boruvka.  This module keeps the kNN arrays
on the accelerator and runs Boruvka there; the host receives only the
<= K-1 MST edges (~2 MB).

XLA-shaped Boruvka via *rank keys*: edges get a one-time int32 rank =
their position in the ascending (weight, flat-edge-index) order (a single
stable device sort, ~40 ms at 9.6M edges — measured).  Because rank is a
total order, each round's per-component minimum edge is ONE int32
scatter-min instead of a lexicographic (f32, i32) two-pass, the min-edge
graph is cycle-free apart from mutual pairs, and the result is
deterministic.  Per round: the forward direction (edges grouped by source
node in the native (K, k) layout) reduces densely; the reverse direction
is one scatter-min keyed by the destination's component.  Union-find is
pointer-jumping over the (K,) component array.

Tie order matches native/postproc.cpp::mst_knn (weight ties broken by
flat kNN index), so with identical kNN inputs the emitted edge SET equals
the host kernel's (pinned in tests/test_cluster_device.py).  Edge
*emission order* differs (host: Boruvka round order; here: rank order) —
equal-weight MST edges may therefore condense in a different (equally
minimal) dendrogram order, the same freedom ops/cluster.py::_mreach_mst
already documents between its scipy and native backends.

Replaces (together with ops/cluster.py) the reference's cuml GPU HDBSCAN
dependency (`iggt/utils/misc.py:19-22`, `:81-170`).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

_BIG = np.int32(2**31 - 1)


@functools.partial(jax.jit, static_argnames=("min_samples",))
def _boruvka_rank(knn_dist: jax.Array, knn_idx: jax.Array, min_samples: int):
    """(K, k) kNN arrays -> MST edges of the mutual-reachability graph.

    Returns (out_a, out_b (K,) i32, out_w (K,) f32, n_out scalar i32,
    core (K,) f32); the first n_out entries are forest edges sorted by
    (weight, flat edge index).  knn arrays are ascending with self at
    column 0 (`_weighted_core_distances` layout, unit weights), so the
    unit-weight core distance is column min_samples-1.
    """
    K, k = knn_dist.shape
    E = K * k
    dist = knn_dist.astype(jnp.float32)
    core = dist[:, min_samples - 1]

    node = jnp.arange(K, dtype=jnp.int32)
    dst = knn_idx.astype(jnp.int32)                      # (K, k)
    w = jnp.maximum(dist, jnp.maximum(core[:, None], core[dst]))
    valid = (dst != node[:, None]) & jnp.isfinite(w)
    w = jnp.where(valid, w, jnp.inf)

    # rank = position in the ascending (w, eid) order; invalid edges sort
    # to the tail and are excluded by rank >= n_valid
    eid = jnp.arange(E, dtype=jnp.int32)
    _, perm = jax.lax.sort(
        (w.reshape(-1), eid), dimension=0, is_stable=True, num_keys=1
    )                                                     # sorted-pos -> eid
    rank2d = (
        jnp.zeros(E, jnp.int32).at[perm].set(eid).reshape(K, k)
    )                                                     # eid -> sorted pos
    n_valid = jnp.sum(valid, dtype=jnp.int32)
    rank2d = jnp.where(rank2d < n_valid, rank2d, _BIG)

    # per-rank endpoint tables for winner reconstruction (device-resident)
    src_of_rank = perm // k
    dst_of_rank = dst.reshape(-1)[perm]
    w_of_rank = w.reshape(-1)[perm]

    max_rounds = max(1, math.ceil(math.log2(max(K, 2))))

    def round_fn(state):
        comp, keep, _r, _changed = state
        comp_dst = comp[dst]                              # (K, k) gather
        active = comp[:, None] != comp_dst
        r_act = jnp.where(active, rank2d, _BIG)

        # forward: edges are grouped by source node -> dense min, then a
        # K-sized scatter onto components
        node_min = jnp.min(r_act, axis=1)
        best = jnp.full(K, _BIG, jnp.int32).at[comp].min(node_min)
        # reverse: one scatter-min keyed by the destination's component
        best = best.at[comp_dst.reshape(-1)].min(r_act.reshape(-1))

        has = best < _BIG
        r_star = jnp.where(has, best, 0)
        keep = keep.at[r_star].max(has)

        # union: component -> its winner edge's opposite side
        cu = comp[src_of_rank[r_star]]
        cv = comp[dst_of_rank[r_star]]
        opp = jnp.where(cu == node, cv, cu)
        parent = jnp.where(has, opp, node)
        # mutual pairs (a <-> b picked the same edge): smaller id is root
        parent = jnp.where(
            (parent[parent] == node) & (node < parent), node, parent
        )
        parent = jax.lax.fori_loop(
            0, max_rounds, lambda _, p: p[p], parent
        )
        return parent[comp], keep, _r + 1, jnp.any(has)

    def cond_fn(state):
        _comp, _keep, r, changed = state
        return jnp.logical_and(r < max_rounds, changed)

    _comp, keep, _r, _ = jax.lax.while_loop(
        cond_fn,
        round_fn,
        (node, jnp.zeros(E, bool), jnp.int32(0), jnp.bool_(True)),
    )

    # compact kept ranks ascending into (K,) buffers (<= K-1 of them);
    # rank order == (w, eid) order
    pos = jnp.where(keep, jnp.cumsum(keep) - 1, K)
    sl = jnp.where(keep, jnp.arange(E, dtype=jnp.int32), 0)
    out_a = jnp.zeros(K, jnp.int32).at[pos].set(src_of_rank[sl], mode="drop")
    out_b = jnp.zeros(K, jnp.int32).at[pos].set(dst_of_rank[sl], mode="drop")
    out_w = jnp.zeros(K, jnp.float32).at[pos].set(w_of_rank[sl], mode="drop")
    n_out = jnp.sum(keep, dtype=jnp.int32)
    return out_a, out_b, out_w, n_out, core


def mreach_mst_device(
    knn_dist: jax.Array, knn_idx: jax.Array, min_samples: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Mutual-reachability MST edges from device-resident kNN arrays.

    Returns host (edge_a (n,) i64, edge_b (n,) i64, edge_d (n,) f64,
    core (K,) f64) ready for `_labels_from_edges` — only these small
    arrays cross the device->host boundary."""
    a, b, w, n, core = _boruvka_rank(knn_dist, knn_idx, min_samples)
    n = int(n)
    return (
        np.asarray(a[:n]).astype(np.int64),
        np.asarray(b[:n]).astype(np.int64),
        np.asarray(w[:n]).astype(np.float64),
        np.asarray(core).astype(np.float64),
    )
