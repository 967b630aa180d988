"""k-NN feature smoothing over 3D world points, TPU-native.

Behavioural parity: `iggt/utils/misc.py:24-78` (`knn_avg_features_pyg`):
build a k-NN graph (k=20, self excluded) over ALL views' per-pixel 3D world
points jointly (the reference's batch tensor is all zeros, so its search is
global, `misc.py:63`), then average each point's neighbour features.

TPU design: exact k-NN over ~1.4M points needs an O(N^2) distance matrix or
an irregular spatial index — neither maps to the MXU.  Instead we sort
points along a Morton (Z-order) curve and take the exact k nearest among a
2*window sorted neighbourhood: one argsort + static gathers + a top-k, all
regular, all on-device.  Morton locality makes this a high-recall
approximation of the true k-NN graph; the feature *average* it feeds is
soft, so recall > ~0.9 leaves the smoothed features within test tolerance
of the exact graph (validated in tests/test_postproc.py against a brute
O(N^2) reference on small clouds).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


def _morton_codes(points: jax.Array, bits: int = 10) -> jax.Array:
    """Interleave-bit Z-order codes for (M, 3) points, uint32."""
    p = points.astype(jnp.float32)
    lo = jnp.min(p, axis=0)
    hi = jnp.max(p, axis=0)
    scale = (2**bits - 1) / jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip((p - lo) * scale, 0, 2**bits - 1).astype(jnp.uint32)

    def spread(x):  # spread 10 bits to every 3rd bit
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)


# fixed rotations diversifying the space-filling curves (arbitrary but
# deterministic well-spread orthonormal frames)
_ROTATIONS = np.stack(
    [
        np.eye(3, dtype=np.float32),
        np.array(  # 45 deg about z then 45 deg about x
            [[0.7071, -0.7071, 0.0],
             [0.5, 0.5, -0.7071],
             [0.5, 0.5, 0.7071]], np.float32),
        np.array(  # 45 deg about y then 45 deg about z
            [[0.5, -0.7071, 0.5],
             [0.5, 0.7071, 0.5],
             [-0.7071, 0.0, 0.7071]], np.float32),
    ]
)


@functools.partial(jax.jit, static_argnames=("k", "window", "block"))
def knn_smooth_features(
    points: jax.Array,
    features: jax.Array,
    k: int = 20,
    window: int = 32,
    block: int = 65536,
) -> jax.Array:
    """Average each point's k nearest neighbours' features.

    points: (..., 3); features: (..., F); leading dims are flattened into a
    single global cloud (matching the reference's global search).  Neighbour
    candidates are the union, over 3 rotated Morton orderings, of the
    2*window points adjacent in each ordering (duplicates masked), from
    which the exact k nearest are kept.

    The candidate dedup/distance/top-k phase is lax.map'ed over ``block``-
    point chunks: unblocked, its transients ((M, 3*2w, 3) gathered
    positions and friends) reach ~8 GiB at 10-view demo scale (M=1.69M)
    and OOM a 16 GiB chip alongside the model params — blocking bounds
    them at ~300 MiB with identical numerics.
    """
    shape = features.shape
    pts = points.reshape(-1, 3).astype(jnp.float32)
    fts = features.reshape(-1, shape[-1]).astype(jnp.float32)
    M = pts.shape[0]

    offsets = jnp.concatenate(
        [jnp.arange(-window, 0), jnp.arange(1, window + 1)]
    )  # self excluded (loop=False in the reference)
    rows = jnp.arange(M)[:, None]

    cand_ids = []
    for rot in _ROTATIONS:
        order = jnp.argsort(_morton_codes(pts @ jnp.asarray(rot).T))
        pos = rows + offsets[None, :]  # position in this sorted order
        valid = (pos >= 0) & (pos < M)
        ids = order[jnp.clip(pos, 0, M - 1)]  # sorted-pos -> global id
        # each point's own row in sorted order maps back: candidates of the
        # point at sorted position i are order[i +/- offsets]; scatter them
        # to the point id order[i]
        own = order  # (M,) global id of sorted position i
        gathered = jnp.full((M, offsets.shape[0]), -1, jnp.int32)
        gathered = gathered.at[own].set(
            jnp.where(valid, ids, -1).astype(jnp.int32)
        )
        cand_ids.append(gathered)

    cand = jnp.concatenate(cand_ids, axis=1)  # (M, 3*2w) global ids, -1 pad

    def smooth_block(args):
        cand_b, pts_b = args  # (B, 3*2w) i32, (B, 3) f32
        # mask duplicates: sort ids per row, invalidate repeats
        cand_sorted = jnp.sort(cand_b, axis=1)
        dup = jnp.concatenate(
            [
                jnp.zeros((cand_b.shape[0], 1), bool),
                cand_sorted[:, 1:] == cand_sorted[:, :-1],
            ],
            axis=1,
        )
        cand_ok = (cand_sorted >= 0) & ~dup
        safe = jnp.clip(cand_sorted, 0, M - 1)

        d2 = jnp.sum((pts[safe] - pts_b[:, None, :]) ** 2, axis=-1)
        d2 = jnp.where(cand_ok, d2, jnp.inf)

        _, nbr = jax.lax.top_k(-d2, k)  # (B, k) into candidate axis
        nbr_idx = jnp.take_along_axis(safe, nbr, axis=1)
        return jnp.mean(fts[nbr_idx], axis=1)

    if M <= block:
        smoothed = smooth_block((cand, pts))
    else:
        pad = (-M) % block
        cand_p = jnp.pad(cand, ((0, pad), (0, 0)), constant_values=-1)
        pts_p = jnp.pad(pts, ((0, pad), (0, 0)))
        out = jax.lax.map(
            smooth_block,
            (
                cand_p.reshape(-1, block, cand.shape[1]),
                pts_p.reshape(-1, block, 3),
            ),
        )
        smoothed = out.reshape(-1, shape[-1])[:M]
    return smoothed.reshape(shape)


def _knn_block(
    qb: jax.Array, ref: jax.Array, ref_sq: jax.Array, k: int,
    approx: bool = False,
):
    """k nearest refs for one query block (Q, C) vs (R, C).

    ``approx=True`` selects through `lax.approx_min_k` (the TPU
    PartialReduce unit) — ~6x faster than exact `top_k` at the clustering
    scale (24 ms vs 145 ms per (4096, 150k) block on v5e, HBM-bound) at
    an expected recall >= the 0.95 target; distances of returned
    candidates are exact, and a missed true neighbour can only *inflate*
    the k-th distance, the same failure direction as the kNN-graph
    truncation the clustering pipeline already tolerates
    (ops/cluster.py::_mreach_mst)."""
    q32 = qb.astype(jnp.float32)
    d = (
        jnp.sum(q32 * q32, axis=-1, keepdims=True)
        + ref_sq[None, :]
        - 2.0 * jnp.matmul(q32, ref.T, precision="highest")
    )
    if k == 1:  # argmin beats top_k's sort for the 1-NN backfill
        idx = jnp.argmin(d, axis=-1)[:, None]
        neg = -jnp.take_along_axis(d, idx, axis=-1)
    elif approx:
        val, idx = jax.lax.approx_min_k(d, k, recall_target=0.95)
        neg = -val
    else:
        neg, idx = jax.lax.top_k(-d, k)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx


@functools.partial(jax.jit, static_argnames=("k", "approx"))
def _knn_all_blocks(
    qblocks: jax.Array, ref: jax.Array, k: int, approx: bool = False
):
    """lax.map over query blocks (NB, B, C) -> one dispatch, one transfer
    (the per-block host sync costs ~34 ms each through a remote-TPU
    tunnel; 376 blocks of backfill used to pay it 376 times)."""
    ref_sq = jnp.sum(ref * ref, axis=-1)
    return jax.lax.map(
        lambda qb: _knn_block(qb, ref, ref_sq, k, approx=approx), qblocks
    )


def query_block_for(n_ref: int, block: int = 4096) -> int:
    """The query-block size brute_knn actually dispatches with: the
    default block, shrunk (to a power of two, >= 256) so the (block, R)
    f32 distance buffer stays under ~512 MiB.  Exposed so callers that
    pad query counts to bound the XLA shape family (the clustering
    refinement's device force-path) compute the SAME block as the real
    dispatch — a mismatch would silently re-open the
    one-program-per-query-count compile tail."""
    max_block = max(256, int((512 * 2**20) // max(n_ref * 4, 1)))
    if block > max_block:
        block = max(256, 1 << (max_block.bit_length() - 1))
    return block


def brute_knn(
    ref,
    query,
    k: int,
    block: int = 4096,
    approx: bool = False,
    out_device: bool = False,
):
    """kNN on the accelerator: chunked (Q, R) distance blocks on the MXU
    + top_k (exact, default) or approx_min_k (``approx=True``), all blocks
    in a single jitted dispatch.  Accepts numpy or device arrays; returns
    (dist (Q, k), idx (Q, k)) sorted ascending, self included when query
    is ref — numpy, or device arrays when ``out_device`` (skips the
    device->host transfer for consumers that keep working on-device,
    e.g. the device MST)."""
    ref_d = jnp.asarray(ref, jnp.float32)
    Q, C = query.shape
    # bound the (block, R) f32 distance buffer at ~512 MiB: the default
    # 4096-query block is sized for 150k refs (2.4 GiB transient); the
    # exact-mode 1-NN backfill passes ~1M refs, where 4096 x R x 4B would
    # be a 16 GiB allocation (OOMed on 6-view demo scenes)
    block = query_block_for(ref_d.shape[0], block)
    pad = (-Q) % block
    q = jnp.asarray(query, jnp.float32)
    if pad:
        q = jnp.concatenate([q, jnp.zeros((pad, C), jnp.float32)])
    d, i = _knn_all_blocks(q.reshape(-1, block, C), ref_d, k, approx=approx)
    d = d.reshape(-1, k)[:Q]
    i = i.reshape(-1, k)[:Q]
    if out_device:
        return d, i
    return np.asarray(d), np.asarray(i).astype(np.int64)


def knn_smooth_features_exact(
    points, features, k: int = 20
):
    """Exact-graph variant of `knn_smooth_features` (reference semantics
    verbatim: true k nearest in the global cloud, self excluded —
    `iggt/utils/misc.py:24-78`).

    Used to isolate the Morton-window approximation's end-to-end cost
    (PERF.md "smoothing approximation" section): the kNN graph comes from
    the threaded native KD-tree when built (exact, host), else device
    brute force.  Returns numpy.
    """
    shape = features.shape
    pts = np.asarray(points, np.float32).reshape(-1, 3)
    fts = np.asarray(features, np.float32).reshape(-1, shape[-1])
    M = pts.shape[0]
    kq = min(k + 1, M)  # +1: drop the self column below

    from iggt_official_tpu import native

    if native.available():
        _, idx = native.knn_query(pts, kq)
    else:
        _, idx = brute_knn(pts, pts, kq)

    rows = np.arange(M)
    # self sorts first at distance 0 (smallest-index tiebreak keeps it
    # first among duplicates of the query point itself only when the query
    # IS that index; otherwise drop whichever column equals the row id)
    is_self = idx == rows[:, None]
    # ensure exactly one drop per row: prefer the first self hit, else col 0
    first_self = np.where(is_self.any(1), is_self.argmax(1), 0)
    keep = np.ones((M, kq), bool)
    keep[rows, first_self] = False
    nbr = idx[keep].reshape(M, kq - 1)[:, : k]
    smoothed = fts[nbr].mean(axis=1)
    return smoothed.reshape(shape).astype(np.float32)
