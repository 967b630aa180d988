"""Unit tests for the full-density boundary-merge refinement.

`ops/cluster.py::_boundary_merge_full_density` re-tests, at full density,
the cluster-boundary decisions a subsampled HDBSCAN run makes on the
thinned graph (reference behavior being approximated:
`/root/reference/iggt/utils/misc.py:81-170` full-density cuml HDBSCAN).
Three decision modes, each with a synthetic scene that isolates it:

1. merge restored — a sub-eps full-density bridge the thinning severed;
2. split kept — a viable small cluster whose 1-NN backfill ring would,
   uncertified, route a spurious path through the big cluster (the
   demo9 regression, `benchmarks/diag_demo9_merge.py`);
3. fold — blob subtrees that never reach ``min_cluster_size`` before
   touching the big cluster's interior (condensed-node semantics).
"""

import numpy as np
import pytest
from sklearn.neighbors import NearestNeighbors

from iggt_official_tpu.ops.cluster import _boundary_merge_full_density

EPS, MS, MCS = 0.06, 10, 200


def _ball(rng, center, n, r):
    pts = rng.normal(0, r / 2, (n, 2)) + center
    return np.clip(pts - center, -r, r) + center


def _nn1_map(pts, flat):
    nn = NearestNeighbors(n_neighbors=1).fit(pts)
    return nn.kneighbors(flat, return_distance=False)[:, 0].astype(np.int64)


def _refine(flat, pts, labels, mcs=MCS):
    j_all = _nn1_map(pts, flat)
    return _boundary_merge_full_density(
        flat.astype(np.float32), pts.astype(np.float32),
        labels.astype(np.int64), j_all, EPS, MS, mcs,
    )


def test_bridge_merge_restored():
    """Two dense balls + a sub-eps bridge: full density is one cluster,
    the subsample (bridge dropped) splits it — refinement must union."""
    rng = np.random.default_rng(0)
    a = _ball(rng, (0.0, 0.0), 2000, 0.15)
    b = _ball(rng, (0.5, 0.0), 2000, 0.15)
    tx = np.linspace(0.12, 0.38, 400)
    bridge = np.stack([tx, rng.normal(0, 0.004, 400)], 1)
    flat = np.concatenate([a, bridge, b])
    # uniform thinning: the bridge survives only sparsely — far too thin
    # for the density-scaled thinned run to keep the sides connected,
    # but close enough (< 2*eps) to flag the pair for re-testing
    keep = np.concatenate([
        np.arange(0, 2000, 4), np.arange(2000, 2400, 40),
        np.arange(2400, 4400, 4)])
    pts = flat[keep]
    labels = (flat[keep, 0] > 0.25).astype(np.int64)
    out = _refine(flat, pts, labels)
    assert len(np.unique(out)) == 1


def test_viable_small_cluster_split_kept():
    """A small-but-viable cluster separated from a big one by > eps must
    stay split even though the backfill mislabels gap points: endpoint
    certification keeps the spurious through-background path out."""
    rng = np.random.default_rng(1)
    big = _ball(rng, (0.0, 0.0), 20000, 0.5)
    small = _ball(rng, (0.62, 0.0), 600, 0.04)   # gap ~0.08 > eps
    # sparse dust in the gap: belongs to nothing, backfills to `small`
    dust = np.stack([rng.uniform(0.52, 0.57, 30),
                     rng.normal(0, 0.02, 30)], 1)
    flat = np.concatenate([big, small, dust])
    keep = np.concatenate([
        np.arange(0, 20000, 10), 20000 + np.arange(0, 600, 3)])
    pts = flat[keep]
    labels = (keep >= 20000).astype(np.int64)
    out = _refine(flat, pts, labels)
    assert len(np.unique(out)) == 2


def test_below_mcs_blob_folded():
    """A blob whose full-density mass is below min_cluster_size can never
    be selected by the exact condensed tree — unconditional fold."""
    rng = np.random.default_rng(2)
    big = _ball(rng, (0.0, 0.0), 20000, 0.5)
    small = _ball(rng, (0.62, 0.0), 120, 0.02)   # 120 < MCS=200
    flat = np.concatenate([big, small])
    keep = np.concatenate([
        np.arange(0, 20000, 10), 20000 + np.arange(0, 120, 2)])
    pts = flat[keep]
    labels = (keep >= 20000).astype(np.int64)
    out = _refine(flat, pts, labels)
    assert len(np.unique(out)) == 1


def _chain_graph(heights):
    """Path graph 0-1-...-n with the given per-edge linkage heights."""
    n = len(heights) + 1
    src = np.arange(n - 1, dtype=np.int32)
    dst = src + 1
    return n, src, dst, np.asarray(heights, np.float64)


def test_sweep_folds_touch_before_mass():
    """Blob seeds reach big interior at a lower linkage height than the
    one where any blob component reaches min_cluster_size: fold."""
    from iggt_official_tpu.ops.cluster import _grow_until_viable_or_touch

    # nodes: [s0 s1 s2 | big]; s-chain links at 0.5, s2-big at 0.1
    n, src, dst, w = _chain_graph([0.5, 0.5, 0.1])
    is_s = np.array([True, True, True, False])
    is_big = np.array([False, False, False, True])
    assert _grow_until_viable_or_touch(
        n, src, dst, w, is_s, is_big, min_cluster_size=3)


def test_sweep_keeps_mass_before_touch():
    """Blob reaches min_cluster_size mass strictly below the height where
    it touches big interior: viable, keep the split."""
    from iggt_official_tpu.ops.cluster import _grow_until_viable_or_touch

    n, src, dst, w = _chain_graph([0.1, 0.1, 0.9])
    is_s = np.array([True, True, True, False])
    is_big = np.array([False, False, False, True])
    assert not _grow_until_viable_or_touch(
        n, src, dst, w, is_s, is_big, min_cluster_size=3)


def test_mst_gate_short_circuits():
    """With MST edges provided, a pair whose thinned merge height exceeds
    margin*eps is never re-tested — labels return unchanged even when the
    full-density geometry holds a sub-eps bridge (thinning only inflates
    merge heights, so a high thinned saddle certifies a high true saddle;
    the bridge here is synthetic contradiction to prove the short-circuit,
    not a reachable state)."""
    rng = np.random.default_rng(6)
    a = _ball(rng, (0.0, 0.0), 2000, 0.15)
    b = _ball(rng, (0.5, 0.0), 2000, 0.15)
    tx = np.linspace(0.12, 0.38, 400)
    bridge = np.stack([tx, rng.normal(0, 0.004, 400)], 1)
    flat = np.concatenate([a, bridge, b])
    keep = np.concatenate([
        np.arange(0, 2000, 4), np.arange(2000, 2400, 40),
        np.arange(2400, 4400, 4)])
    pts = flat[keep]
    labels = (flat[keep, 0] > 0.25).astype(np.int64)
    # hand-built MST: chains within each side, one cross edge at 0.2
    K = len(keep)
    left = np.flatnonzero(labels == 0)
    right = np.flatnonzero(labels == 1)
    edge_a = np.concatenate([left[:-1], right[:-1], [left[-1]]])
    edge_b = np.concatenate([left[1:], right[1:], [right[0]]])
    edge_d = np.concatenate([
        np.full(len(left) - 1, 0.01), np.full(len(right) - 1, 0.01), [0.2]])
    j_all = _nn1_map(pts, flat)
    out = _boundary_merge_full_density(
        flat.astype(np.float32), pts.astype(np.float32), labels, j_all,
        EPS, MS, MCS, mst=(edge_a, edge_b, edge_d),
    )
    np.testing.assert_array_equal(out, labels)
    # and with the true sub-eps cross edge, the gate admits the pair and
    # the full-density pass restores the merge
    edge_d[-1] = 0.07
    out2 = _boundary_merge_full_density(
        flat.astype(np.float32), pts.astype(np.float32), labels, j_all,
        EPS, MS, MCS, mst=(edge_a, edge_b, edge_d),
    )
    assert len(np.unique(out2)) == 1


def test_single_cluster_noop():
    rng = np.random.default_rng(4)
    flat = _ball(rng, (0.0, 0.0), 3000, 0.3)
    keep = np.arange(0, 3000, 3)
    pts = flat[keep]
    labels = np.zeros(len(keep), np.int64)
    out = _refine(flat, pts, labels)
    np.testing.assert_array_equal(out, labels)


def test_far_clusters_untouched():
    """No candidate pairs within margin*eps: labels returned unchanged."""
    rng = np.random.default_rng(5)
    a = _ball(rng, (0.0, 0.0), 3000, 0.2)
    b = _ball(rng, (2.0, 0.0), 3000, 0.2)
    flat = np.concatenate([a, b])
    keep = np.arange(0, 6000, 3)
    pts = flat[keep]
    labels = (keep >= 3000).astype(np.int64)
    out = _refine(flat, pts, labels)
    np.testing.assert_array_equal(out, labels)
