"""Density clustering of instance features -> multi-view masks.

Behavioural parity: `iggt/utils/misc.py:81-269`:
- ``cluster_features_to_masks_mv``: flatten all views' (N, H, W, C=8)
  features, density-cluster them jointly (same instance id across views),
  reassign noise pixels to their 1-NN clustered pixel, optional jet
  colormap with per-label colors consistent across views.
- ``cluster_features_to_masks``: per-view variant (kmeans | dbscan).

Host split (the reference needs cuml's GPU HDBSCAN, `misc.py:19-22`):
density clustering is irregular, so it runs on the host as a first-party
**weighted HDBSCAN**: weighted core distances -> mutual-reachability kNN
graph -> MST -> weighted single linkage -> condensed tree
(min_cluster_size) -> excess-of-mass selection with
``cluster_selection_epsilon`` and ``allow_single_cluster=False`` — the
actual HDBSCAN algorithm (Campello et al.; epsilon rule per Malzer & Baum
2019) generalized so a point of weight m acts as m coincident points.
Above 150k pixels the pipeline clusters a uniform subsample with
density-scaled parameters and 1-NN-assigns the rest (the same mechanism
the reference uses for noise pixels).  Fidelity vs sklearn's HDBSCAN on
raw pixels is measured in tests/test_cluster_fidelity.py
(Hungarian-matched mIoU).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional, Tuple, Union

import numpy as np


def _debug_t(label: str, t0: float) -> None:
    """Phase timing for the refinement pass (IGGT_DEBUG_TIMING=1)."""
    if os.environ.get("IGGT_DEBUG_TIMING"):
        print(f"[refine] {label}: {time.perf_counter()-t0:.2f}s",
              flush=True)


def _accelerator_available() -> bool:
    """True when device brute-force kNN should be used.

    Steady-state MXU blocks beat the host KD-tree 3x even through the
    remote tunnel (27.7s vs 87s at demo scale, identical labels), but the
    FIRST compile costs minutes there.  Policy: IGGT_DEVICE_KNN=1 forces
    on, =0 forces off; unset -> auto: on when the default device is a real
    accelerator AND a persistent compilation cache is configured (so the
    one-time compile amortizes across processes — bench.py and long-running
    services set JAX_COMPILATION_CACHE_DIR)."""
    import os

    flag = os.environ.get("IGGT_DEVICE_KNN")
    if flag == "0":
        return False
    if flag != "1" and not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return False
    try:
        import jax

        dev = jax.config.jax_default_device
        if dev is not None:
            return dev.platform != "cpu"
        return jax.default_backend() != "cpu"
    except Exception:  # pragma: no cover - jax always importable here
        return False


def _nn1(ref: np.ndarray, query: np.ndarray) -> np.ndarray:
    """Index of nearest ``ref`` point per query.

    Large queries run as brute-force blocks on the accelerator (MXU);
    small ones use the native C++ KD-tree / sklearn."""
    if ref.shape[0] * query.shape[0] >= 1_000_000 and _accelerator_available():
        from iggt_official_tpu.ops.knn import brute_knn

        return brute_knn(ref, query, 1)[1][:, 0]
    from iggt_official_tpu import native

    if native.available():
        return native.nearest_neighbor(ref, query)
    from sklearn.neighbors import NearestNeighbors

    nn = NearestNeighbors(n_neighbors=1).fit(ref)
    _, j = nn.kneighbors(query)
    return j[:, 0]


def _knn(points: np.ndarray, k: int):
    """(dist, idx) of the k nearest points (self included).

    Preference order: IGGT_DEVICE_KNN=1 forces accelerator brute force
    (wins on locally-attached chips); otherwise the native bucketed
    KD-tree (~10 s at the 150k x 8-D x k=64 clustering scale — beats even
    the remote-tunnel TPU's 27.7 s); then device brute force; then
    sklearn."""
    import os

    from iggt_official_tpu import native

    force_device = os.environ.get("IGGT_DEVICE_KNN") == "1"
    large = points.shape[0] ** 2 >= 4_000_000
    if large and (force_device or not native.available()) and _accelerator_available():
        from iggt_official_tpu.ops.knn import brute_knn

        return brute_knn(points, points, k)
    if native.available():
        return native.knn_query(points, k)
    from sklearn.neighbors import NearestNeighbors

    return NearestNeighbors(n_neighbors=k).fit(points).kneighbors(points)


class _UnionFind:
    def __init__(self, n: int):
        self.parent = np.arange(n)

    def find(self, x: int) -> int:
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def weighted_dbscan(
    points: np.ndarray,
    weights: np.ndarray,
    eps: float,
    min_samples: int,
) -> np.ndarray:
    """First-party DBSCAN over weighted points (cells).

    A point is core iff the total weight within eps (incl. itself) is
    >= min_samples; core points within eps merge (union-find); non-core
    points join the cluster of their closest core neighbour within eps.
    Returns labels (K,), -1 = noise.

    Dispatches to the C++ KD-tree kernel (native/postproc.cpp) when the
    extension built; this numpy/sklearn path is the fallback and the
    parity reference.
    """
    from iggt_official_tpu import native

    if native.available():
        return native.weighted_dbscan(points, weights, eps, min_samples)
    from sklearn.neighbors import NearestNeighbors

    K = points.shape[0]
    nn = NearestNeighbors(radius=eps).fit(points)
    neigh = nn.radius_neighbors(points, return_distance=False)

    mass = np.array([weights[idx].sum() for idx in neigh])
    core = mass >= min_samples

    uf = _UnionFind(K)
    for i in np.flatnonzero(core):
        for j in neigh[i]:
            if core[j]:
                uf.union(i, int(j))

    labels = np.full(K, -1, np.int64)
    roots: Dict[int, int] = {}
    for i in np.flatnonzero(core):
        r = uf.find(i)
        labels[i] = roots.setdefault(r, len(roots))

    # border points: nearest core neighbour within eps
    border = np.flatnonzero(~core)
    if border.size and core.any():
        core_idx = np.flatnonzero(core)
        nn_core = NearestNeighbors(n_neighbors=1).fit(points[core_idx])
        dist, j = nn_core.kneighbors(points[border])
        ok = dist[:, 0] <= eps
        labels[border[ok]] = labels[core_idx[j[ok, 0]]]
    return labels


def _weighted_core_distances(
    points: np.ndarray, weights: np.ndarray, min_samples: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-cell core distance treating a cell of weight m as m coincident
    points: the smallest radius whose cumulative weight >= min_samples.

    Returns (core (K,), knn_dist (K, k), knn_idx (K, k)) — the kNN arrays
    are reused for the mutual-reachability graph.
    """
    K = points.shape[0]
    # wide enough for the reachability graph too: missing kNN edges can
    # only inflate MST merge heights (over-splitting), so keep >= 64
    k = min(K, max(64, min_samples + 1))
    dist, idx = _knn(points, k)
    while True:
        cumw = np.cumsum(weights[idx], axis=1)
        short = cumw[:, -1] < min_samples
        if not short.any() or k >= K:
            break
        k = min(K, k * 4)
        dist, idx = _knn(points, k)
    # first column of idx is the point itself (distance 0)
    pos = np.argmax(cumw >= min_samples, axis=1)
    core = dist[np.arange(K), pos]
    core[cumw[:, -1] < min_samples] = np.inf  # total weight < min_samples
    return core, dist, idx


def _mreach_mst(
    core: np.ndarray,
    knn_dist: np.ndarray,
    knn_idx: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Mutual-reachability kNN graph -> MST edges (a, b, d), shared by the
    native and Python labelling backends so their tie-breaking matches.

    The spanning forest comes from the native Boruvka kernel when built
    (~10x faster than scipy Prim at 15M edges on one core), else scipy.
    Tie edges may pick a different (equally minimal) tree between the two
    backends; both are valid HDBSCAN inputs and each run is deterministic."""
    from iggt_official_tpu import native

    if native.available():
        return native.mst_knn(knn_dist, knn_idx, core)

    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import minimum_spanning_tree

    K = core.shape[0]
    src = np.repeat(np.arange(K), knn_idx.shape[1])
    dst = np.asarray(knn_idx).reshape(-1).astype(np.int64)
    d = np.asarray(knn_dist, np.float64).reshape(-1)
    mreach = np.maximum(d, np.maximum(core[src], core[dst]))
    sel = (src != dst) & np.isfinite(mreach)
    graph = coo_matrix(
        (mreach[sel], (src[sel], dst[sel])), shape=(K, K)
    ).tocsr()
    mst = minimum_spanning_tree(graph).tocoo()
    return (
        mst.row.astype(np.int64),
        mst.col.astype(np.int64),
        mst.data.astype(np.float64),
    )


def _weighted_single_linkage(
    weights: np.ndarray,
    edge_a: np.ndarray,
    edge_b: np.ndarray,
    edge_d: np.ndarray,
) -> np.ndarray:
    """Single-linkage dendrogram over precomputed MST edges.

    Returns linkage Z (K-1, 4): [left, right, distance, weighted size],
    node ids like scipy (leaves 0..K-1, merge i -> K+i).  Disconnected
    components are joined by +inf edges (they never truly merge; the
    condensed tree treats the inf-distance root splits as lambda=0).
    """
    K = weights.shape[0]
    edges = list(zip(edge_d, edge_a, edge_b))

    # join remaining components (and isolated/inf-core cells) at +inf
    uf = _UnionFind(K)
    for _, a, b in edges:
        uf.union(int(a), int(b))
    rep = sorted({uf.find(i) for i in range(K)})
    for other in rep[1:]:
        edges.append((np.inf, rep[0], other))

    edges.sort(key=lambda e: e[0])
    Z = np.zeros((K - 1, 4))
    uf2 = _UnionFind(2 * K - 1)
    comp_node = np.arange(K)  # union-find root -> current dendrogram node
    sizes = np.concatenate([weights.astype(np.float64), np.zeros(K - 1)])
    nxt = K
    for dist_e, a, b in edges:
        ra, rb = uf2.find(int(a)), uf2.find(int(b))
        if ra == rb:
            continue
        na, nb = comp_node[ra], comp_node[rb]
        Z[nxt - K] = (na, nb, dist_e, sizes[na] + sizes[nb])
        sizes[nxt] = sizes[na] + sizes[nb]
        uf2.union(ra, rb)
        comp_node[uf2.find(ra)] = nxt
        nxt += 1
    assert nxt == 2 * K - 1, "MST did not span all cells"
    return Z


def _labels_from_edges(
    edge_a: np.ndarray,
    edge_b: np.ndarray,
    edge_d: np.ndarray,
    weights: np.ndarray,
    core: np.ndarray,
    eps: float,
    min_cluster_size: int,
    allow_single_cluster: bool,
) -> np.ndarray:
    """MST edges -> HDBSCAN labels through the native C++ port of
    `_labels_from_mst` when built (dendrogram + condensed tree +
    EOM/epsilon selection); the Python path is the tested spec and the
    fallback — tests assert they agree on the same MST.

    Edges are canonicalized to (d, min(a,b), max(a,b)) order first:
    equal-weight MST edges (common — mutual-reachability ties through
    shared core distances) would otherwise condense in backend-dependent
    order, so canonicalizing makes the labels a function of the edge SET
    alone — the host and device MST builders emit the same set in
    different orders (tests/test_cluster_device.py)."""
    lo = np.minimum(edge_a, edge_b)
    hi = np.maximum(edge_a, edge_b)
    order = np.lexsort((hi, lo, edge_d))
    edge_a = np.asarray(edge_a)[order]
    edge_b = np.asarray(edge_b)[order]
    edge_d = np.asarray(edge_d)[order]

    from iggt_official_tpu import native

    if native.available():
        return native.hdbscan_mst_labels(
            edge_a, edge_b, edge_d, weights, core,
            float(eps), float(min_cluster_size), allow_single_cluster,
        )
    return _labels_from_mst(
        edge_a, edge_b, edge_d, weights, core,
        eps, min_cluster_size, allow_single_cluster,
    )


def weighted_hdbscan(
    points: np.ndarray,
    weights: np.ndarray,
    eps: float,
    min_samples: int,
    min_cluster_size: int,
    allow_single_cluster: bool = False,
    approx_ok: bool = False,
    return_mst: bool = False,
) -> np.ndarray:
    """HDBSCAN(cluster_selection_epsilon=eps) over weighted points.

    The real algorithm — condensed tree + excess-of-mass selection with the
    Malzer-Baum epsilon rule — with every count treated as point
    multiplicity, replacing cuml/hdbscan (`iggt/utils/misc.py:124-129`).
    Returns labels (K,), -1 = noise.

    ``approx_ok=True`` allows the accelerator fast path (unit weights
    only): kNN via `approx_min_k` blocks and the mutual-reachability MST
    on-device (ops/cluster_device.py), so only the MST edges cross the
    device->host boundary; the condensed-tree labelling is shared with
    the host path.  A missed kNN candidate can only inflate its
    reachability weight — the same failure direction as the kNN-graph
    truncation both paths already accept; end-to-end fidelity vs the
    exact host path is measured in PERF.md.

    ``return_mst=True`` returns ``(labels, (edge_a, edge_b, edge_d),
    (knn_dist, knn_idx))`` — the mutual-reachability MST the labels were
    condensed from (gates the refinement's cluster-pair candidates,
    `_mst_candidate_pairs`) and the kNN arrays it was built from
    (device arrays on the accelerator path, numpy on the host path;
    the refinement derives its boundary seeds from them instead of
    re-probing — the probe's 77 MB dist/idx download was ~4 s of demo1
    p50 through the tunnel).
    """
    K = points.shape[0]
    if K == 1:
        labels = (np.zeros(1, np.int64) if weights[0] >= min_cluster_size
                  else np.full(1, -1, np.int64))
        empty = np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0)
        return (labels, empty, None) if return_mst else labels

    if (
        approx_ok
        and K >= 32_768
        and min_samples + 1 <= K
        and bool(np.all(weights == 1))
        and _accelerator_available()
    ):
        import jax

        from iggt_official_tpu.ops.cluster_device import mreach_mst_device
        from iggt_official_tpu.ops.knn import brute_knn

        k = min(K, max(64, min_samples + 1))
        t0 = time.perf_counter()
        d_dev, i_dev = brute_knn(
            points, points, k, approx=True, out_device=True
        )
        if os.environ.get("IGGT_DEBUG_TIMING"):
            jax.block_until_ready(d_dev)
        _debug_t("hdbscan/knn", t0)
        t0 = time.perf_counter()
        edge_a, edge_b, edge_d, core = mreach_mst_device(
            d_dev, i_dev, min_samples
        )
        _debug_t("hdbscan/mst", t0)
        t0 = time.perf_counter()
        labels = _labels_from_edges(
            edge_a, edge_b, edge_d, weights, core,
            eps, min_cluster_size, allow_single_cluster,
        )
        _debug_t("hdbscan/labels", t0)
        if return_mst:
            return labels, (np.asarray(edge_a), np.asarray(edge_b),
                            np.asarray(edge_d)), (d_dev, i_dev)
        return labels

    points = np.asarray(points)
    core, knn_dist, knn_idx = _weighted_core_distances(
        points, weights, min_samples
    )
    edge_a, edge_b, edge_d = _mreach_mst(core, knn_dist, knn_idx)
    labels = _labels_from_edges(
        edge_a, edge_b, edge_d, weights, core,
        eps, min_cluster_size, allow_single_cluster,
    )
    if return_mst:
        return labels, (np.asarray(edge_a), np.asarray(edge_b),
                        np.asarray(edge_d)), (knn_dist, knn_idx)
    return labels


def _labels_from_mst(
    edge_a: np.ndarray,
    edge_b: np.ndarray,
    edge_d: np.ndarray,
    weights: np.ndarray,
    core: np.ndarray,
    eps: float,
    min_cluster_size: int,
    allow_single_cluster: bool = False,
) -> np.ndarray:
    """Pure-Python HDBSCAN labelling from mutual-reachability MST edges
    (the spec path for native.hdbscan_mst_labels)."""
    K = weights.shape[0]
    Z = _weighted_single_linkage(weights, edge_a, edge_b, edge_d)

    # --- condensed tree (top-down), weighted min_cluster_size ---------
    # Arrays indexed by condensed-cluster id:
    #   parent_c, lam_birth (1/dist of the split that created it)
    # Per-point fallout: (point, cluster, lambda).
    n_nodes = 2 * K - 1
    left = Z[:, 0].astype(np.int64)
    right = Z[:, 1].astype(np.int64)
    zdist = Z[:, 2]
    wsize = np.concatenate([weights.astype(np.float64), Z[:, 3]])

    def lam(d):
        if d <= 0:
            return np.inf
        if not np.isfinite(d):
            return 0.0
        return 1.0 / d

    parent_c: list = [-1]
    lam_birth: list = [0.0]
    fall_point: list = []
    fall_cluster: list = []
    fall_lam: list = []
    # stack of (dendrogram node, condensed cluster id)
    stack = [(n_nodes - 1, 0)]
    while stack:
        node, cl = stack.pop()
        if node < K:
            fall_point.append(node)
            fall_cluster.append(cl)
            # leaves of the current cluster fall out when the cluster
            # fully dissolves; use the core distance as the leaf's death
            fall_lam.append(lam(max(core[node], 0.0)))
            continue
        i = node - K
        l, r, d = left[i], right[i], zdist[i]
        ld = lam(d)
        wl, wr = wsize[l], wsize[r]
        big_l, big_r = wl >= min_cluster_size, wr >= min_cluster_size
        if big_l and big_r:
            cl_l = len(parent_c)
            parent_c.append(cl)
            lam_birth.append(ld)
            cl_r = len(parent_c)
            parent_c.append(cl)
            lam_birth.append(ld)
            stack.append((l, cl_l))
            stack.append((r, cl_r))
        elif big_l or big_r:
            big, small = (l, r) if big_l else (r, l)
            # small side's points fall out of `cl` at this lambda
            sub = [small]
            while sub:
                s = sub.pop()
                if s < K:
                    fall_point.append(s)
                    fall_cluster.append(cl)
                    fall_lam.append(ld)
                else:
                    sub.append(left[s - K])
                    sub.append(right[s - K])
            stack.append((big, cl))
        else:
            # both sides below min_cluster_size: everything falls out
            sub = [l, r]
            while sub:
                s = sub.pop()
                if s < K:
                    fall_point.append(s)
                    fall_cluster.append(cl)
                    fall_lam.append(ld)
                else:
                    sub.append(left[s - K])
                    sub.append(right[s - K])

    parent_arr = np.asarray(parent_c)
    birth = np.asarray(lam_birth)
    fp = np.asarray(fall_point)
    fc = np.asarray(fall_cluster)
    fl = np.asarray(fall_lam)
    n_cl = len(parent_c)

    # --- stability ----------------------------------------------------
    stab = np.zeros(n_cl)
    w_f = weights[fp].astype(np.float64)
    # points contribute (lambda_leave - lambda_birth) * weight; infinite
    # leave-lambdas (duplicate points, zero distances) are capped at the
    # max finite lambda in the tree to keep stabilities comparable
    finite_max = (
        np.max(fl[np.isfinite(fl)]) if np.isfinite(fl).any() else 1.0
    )
    fl_use = np.where(np.isfinite(fl), fl, finite_max)
    np.add.at(stab, fc, w_f * (fl_use - birth[fc]))
    # child clusters contribute (their birth - parent birth) * their mass
    child_mass = np.zeros(n_cl)
    np.add.at(child_mass, fc, w_f)
    total_mass = child_mass.copy()
    for c in range(n_cl - 1, 0, -1):
        total_mass[parent_arr[c]] += total_mass[c]
    for c in range(1, n_cl):
        p = parent_arr[c]
        stab[p] += total_mass[c] * (birth[c] - birth[p])

    # --- excess-of-mass selection ------------------------------------
    children: list = [[] for _ in range(n_cl)]
    for c in range(1, n_cl):
        children[parent_arr[c]].append(c)
    selected = np.zeros(n_cl, bool)
    subtree_stab = np.zeros(n_cl)
    for c in range(n_cl - 1, -1, -1):
        if not children[c]:
            selected[c] = True
            subtree_stab[c] = stab[c]
            continue
        child_sum = sum(subtree_stab[ch] for ch in children[c])
        if stab[c] > child_sum and (c != 0 or allow_single_cluster):
            selected[c] = True
            # deselect all descendants
            sub = list(children[c])
            while sub:
                s = sub.pop()
                selected[s] = False
                sub.extend(children[s])
            subtree_stab[c] = stab[c]
        else:
            subtree_stab[c] = child_sum
    if not allow_single_cluster:
        selected[0] = False

    # --- cluster_selection_epsilon (Malzer-Baum 2019) -----------------
    # A selected cluster whose birth distance (1/birth-lambda) < eps is
    # replaced by its first ancestor with birth distance >= eps.
    if eps and eps > 0:
        for c in np.flatnonzero(selected):
            birth_dist = np.inf if birth[c] == 0 else 1.0 / birth[c]
            if birth_dist >= eps:
                continue
            anc = c
            while anc != 0:
                p = parent_arr[anc]
                p_birth_dist = np.inf if birth[p] == 0 else 1.0 / birth[p]
                anc = p
                if p_birth_dist >= eps:
                    break
            if anc == 0 and not allow_single_cluster:
                # epsilon merge would reach the root: keep climbing to the
                # highest non-root ancestor instead
                anc = c
                while parent_arr[anc] != 0:
                    anc = parent_arr[anc]
            selected[c] = False
            selected[anc] = True
        # re-deselect descendants of selected clusters
        for c in np.flatnonzero(selected):
            sub = list(children[c])
            while sub:
                s = sub.pop()
                if selected[s]:
                    selected[s] = False
                sub.extend(children[s])

    # --- labels -------------------------------------------------------
    # nearest selected ancestor (incl. the fallout cluster itself)
    sel_anc = np.full(n_cl, -1, np.int64)
    order = np.arange(n_cl)
    for c in order:  # parents come before children (construction order)
        if selected[c]:
            sel_anc[c] = c
        elif parent_arr[c] >= 0:
            sel_anc[c] = sel_anc[parent_arr[c]]
    labels = np.full(K, -1, np.int64)
    lab_of = sel_anc[fc]
    labels[fp] = lab_of
    kept = np.unique(labels[labels >= 0])
    remap = np.full(n_cl, -1, np.int64)
    remap[kept] = np.arange(len(kept))
    labels[labels >= 0] = remap[labels[labels >= 0]]
    return labels


def _seed_mask_from_knn(knn, labels: np.ndarray, in_pair: np.ndarray,
                        thresh: float) -> np.ndarray:
    """(K,) mask of subsample points with a candidate-pair cross-cluster
    neighbour within ``thresh``, computed from the clustering's own kNN
    arrays.  Device arrays run fused on the accelerator (one jit, only
    the boolean mask downloaded); numpy arrays run in numpy."""
    dist, idx = knn
    if isinstance(dist, np.ndarray):
        nbr_lab = labels[idx]
        near = (nbr_lab != labels[:, None]) & (dist <= thresh)
        near &= in_pair[labels[:, None], nbr_lab]
        return near.any(axis=1)

    import jax.numpy as jnp

    # pad the (L, L) pair matrix to a power-of-two size: L is the scene's
    # cluster count, and an unpadded shape would recompile the jit per
    # distinct L on the minutes-slow remote compile path (ADVICE r4);
    # padding with False rows/cols is a no-op for the mask
    L = in_pair.shape[0]
    Lp = max(8, 1 << (L - 1).bit_length())
    if Lp != L:
        padded = np.zeros((Lp, Lp), bool)
        padded[:L, :L] = in_pair
        in_pair = padded
    return np.asarray(_get_seed_mask_jit()(
        dist, idx, jnp.asarray(labels), jnp.asarray(in_pair),
        jnp.float32(thresh),
    ))


def _seed_mask_jit_impl(d, i, lab, pair, thresh):
    nbr = lab[i]
    near = (nbr != lab[:, None]) & (d <= thresh)
    near &= pair[lab[:, None], nbr]
    return near.any(axis=1)


_seed_mask_jit_cache: list = []


def _get_seed_mask_jit():
    if not _seed_mask_jit_cache:
        import jax

        _seed_mask_jit_cache.append(jax.jit(_seed_mask_jit_impl))
    return _seed_mask_jit_cache[0]


def _mst_candidate_pairs(mst, labels: np.ndarray, thresh: float):
    """Cluster pairs whose thinned-graph dendrogram merge height is
    <= ``thresh``: connected components of the MST restricted to edges
    <= thresh; every cross-label pair co-resident in a component merges
    at or below thresh.  Thinning inflates merge heights IN EXPECTATION
    (removing points stretches path bottlenecks; with density-scaled
    min_samples the thinned core distances dominate full-density cores
    on average, but sampling fluctuation can deflate an individual
    thinned height), so ``margin`` is empirical slack, not a proof:
    margin=2 held across seeds and budgets in the round-4 sweep
    (`benchmarks/subsample_policy_lab.py`) — do not shrink it on the
    strength of a soundness claim (ADVICE r4).  A pair separated by more
    than ``thresh = margin*eps`` in the thinned graph is skipped, and
    scenes with no near-eps pairs skip the whole full-density pass (the
    p50-critical case)."""
    edge_a, edge_b, edge_d = mst
    sel = np.asarray(edge_d) <= thresh
    if not sel.any():
        return set()
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    K = labels.shape[0]
    graph = coo_matrix(
        (np.ones(int(sel.sum()), np.int8),
         (np.asarray(edge_a)[sel], np.asarray(edge_b)[sel])),
        shape=(K, K),
    )
    _, comp = connected_components(graph, directed=False)
    pairs = set()
    # components holding >1 final label contribute all their cross pairs;
    # unique (comp, label) rows collapse the scan to one pass over a few
    # thousand entries instead of a python loop over every component
    keep = labels >= 0
    rows = np.unique(
        np.stack([comp[keep], labels[keep]], axis=1), axis=0)
    comp_u, lab_u = rows[:, 0], rows[:, 1]
    starts = np.flatnonzero(np.r_[True, np.diff(comp_u) != 0])
    bounds = np.r_[starts, len(comp_u)]
    for i in range(len(starts)):
        s, e = bounds[i], bounds[i + 1]
        if e - s > 1:
            labs = lab_u[s:e]
            for x in range(len(labs)):
                for y in range(x + 1, len(labs)):
                    pairs.add((int(labs[x]), int(labs[y])))
    return pairs


def _boundary_merge_full_density(
    flat,
    pts: np.ndarray,
    labels: np.ndarray,
    j_all,
    eps: float,
    min_samples: int,
    min_cluster_size: int = 0,
    margin: float = 2.0,
    cap: int = 250_000,
    mst=None,
    knn=None,
) -> np.ndarray:
    """Full-density merge refinement for subsampled clustering.

    Node-thinning systematically INFLATES minimax (bottleneck) distances:
    removing points from a 1-D feature-space bridge stretches the largest
    step along every path through it, so a cluster pair the full-density
    algorithm merges under ``cluster_selection_epsilon`` (separation just
    below eps) stays split in the thinned graph regardless of seed or
    budget (measured: demo7 splits 4-vs-3 at budgets 150k AND 300k and
    across seeds, `benchmarks/subsample_policy_lab.py`).

    This pass re-tests exactly those decisions at full density: for every
    cluster pair whose thinned-graph separation is below ``margin * eps``,
    take the full-resolution points assigned (via the existing 1-NN
    backfill map ``j_all``) to subsample points near the pair boundary,
    build their mutual-reachability kNN graph with the UNSCALED
    ``min_samples``, and union the pair's labels if the two sides are
    connected by edges of reachability <= eps.

    Soundness (one-sided): the boundary subset is a subset of the full
    point set, so its mutual-reachability distances dominate the full
    graph's; eps-connectivity here implies eps-connectivity at full
    density, where the Malzer-Baum epsilon rule would have kept the pair
    in one cluster (`_labels_from_mst`).  The pass therefore only
    restores merges the exact algorithm makes — it cannot over-merge
    (a missed long-way-around path merely leaves the conservative split
    in place).  Two guards make the one-sidedness hold in practice:

    - endpoint certification: connectivity endpoints (and part 2's seed
      sets) only admit points whose local kNN is >= 90% same-labelled —
      the 1-NN backfill labels a ring of neighbour-cluster pixels around
      every cluster, and uncertified endpoints let paths through that
      ring union clusters the path never visits;
    - the ``mst`` gate (`_mst_candidate_pairs`): candidate pairs come
      from the thinned MST's own merge heights when the caller passes
      the MST, so scenes whose pairs all merge above ``margin*eps``
      skip the full-density pass entirely (latency-critical: the
      refinement is on the demo p50 path).

    Validated against `exact=True` in
    `benchmarks/exact_clustering_deltas.json`.

    flat: (M, C) full features (numpy or device array); pts: (K, C)
    subsample; labels: (K,) subsample labels (noise already reassigned);
    j_all: (M,) 1-NN map full -> subsample, or a zero-arg callable
    returning it (lets the device path keep the backfill kernel in
    flight through the host-side candidate/seed phases).  Returns the
    (K,) labels with merged ids (a relabelled copy when merges happen).
    """
    uniq = np.unique(labels)
    uniq = uniq[uniq >= 0]
    if len(uniq) < 2 or min_samples + 1 > pts.shape[0]:
        return labels

    knn_fast = _refine_knn_self

    # --- candidate pairs ------------------------------------------------
    # preferred source: the thinned MST's own merge heights
    # (`_mst_candidate_pairs`) — exact, and free when the clustering
    # already ran; a scene whose pairs all merge above margin*eps skips
    # every full-density phase below, including the seed scan.
    t0 = time.perf_counter()
    if mst is not None:
        pairs = _mst_candidate_pairs(mst, labels, margin * eps)
        _debug_t("candidates/mst-gate", t0)
        if not pairs:
            return labels
        # refinement confirmed: the full-density phases below run host-side
        # (zero XLA programs — round-4 postmortem), so start the one
        # fixed-shape device->host transfer of the features now, overlapped
        # with the seed-mask / backfill phases
        if hasattr(flat, "copy_to_host_async"):
            try:
                flat.copy_to_host_async()
            except Exception:
                pass

    if mst is not None and knn is not None:
        # boundary seeds from the clustering's own kNN arrays — no new
        # kNN, and on the device path the (K, k) dist/idx stay on the
        # accelerator: only the (K,) seed mask crosses the tunnel (the
        # full arrays are ~77 MB, ~4 s of demo1 p50 at tunnel bandwidth)
        in_pair = np.zeros(
            (int(uniq.max()) + 1, int(uniq.max()) + 1), bool)
        for a, b in pairs:
            in_pair[a, b] = in_pair[b, a] = True
        t_seed = time.perf_counter()
        seed_mask = _seed_mask_from_knn(
            knn, labels, in_pair, margin * eps)
        _debug_t("candidates/seed-mask", t_seed)
        if not seed_mask.any():
            return labels
    else:
        # fallback (direct callers/tests): cross-cluster proximity probe
        k_probe = min(64, pts.shape[0])
        dist, idx = knn_fast(pts, k_probe)
        dist, idx = np.asarray(dist), np.asarray(idx)
        nbr_lab = labels[idx]                   # (K, k)
        cross = nbr_lab != labels[:, None]
        near = cross & (np.asarray(dist) <= margin * eps)
        if mst is not None:
            in_pair = np.zeros(
                (int(uniq.max()) + 1, int(uniq.max()) + 1), bool)
            for a, b in pairs:
                in_pair[a, b] = in_pair[b, a] = True
            near &= in_pair[labels[:, None], nbr_lab]
        seed_mask = near.any(axis=1)
        if not seed_mask.any():
            return labels
        if mst is None:
            pairs = set()
            rows, cols = np.nonzero(near)
            for r, c in zip(rows.tolist(), cols.tolist()):
                a, b = int(labels[r]), int(nbr_lab[r, c])
                pairs.add((min(a, b), max(a, b)))
    _debug_t("candidates+seeds", t0)

    # --- host-side from here: materialize features + lazy kNN tree ------
    t0 = time.perf_counter()
    if not isinstance(flat, np.ndarray):
        flat = np.asarray(flat)  # fixed-shape transfer, no compile
    flat = np.ascontiguousarray(flat, np.float32)
    _debug_t("flat-materialize", t0)

    tree_box: list = []

    def flat_tree():
        """Native kNN tree over the full features, built on first use
        (only cluster pairs with a small side need per-pair queries) and
        amortized across every part-2 pair.  Returns None under
        IGGT_DEVICE_KNN=1 so `_knn_query_vs` falls through to the device
        brute path the flag exists to force (locally-attached chips)."""
        if (os.environ.get("IGGT_DEVICE_KNN") == "1"
                and _accelerator_available()):
            return None
        if not tree_box:
            from iggt_official_tpu import native

            t1 = time.perf_counter()
            tree_box.append(
                native.KnnTree(flat) if native.available() else None)
            _debug_t("flat-tree-build", t1)
        return tree_box[0]

    # --- boundary subset at full density --------------------------------
    lab_uf = _UnionFind(int(uniq.max()) + 1)

    # --- part 1: sub-eps connectivity at full density --------------------
    t0 = time.perf_counter()
    j_all = j_all() if callable(j_all) else np.asarray(j_all)
    member = seed_mask[j_all]
    sel = np.flatnonzero(member)
    if sel.size > cap:
        sel = np.random.default_rng(0).choice(sel, cap, replace=False)
    if sel.size >= min_samples + 1:
        sub = np.asarray(flat[sel], np.float32)
        sub_lab = labels[j_all[sel]]

        k_local = min(min_samples + 1, sub.shape[0])
        d_loc, i_loc = knn_fast(sub, k_local)
        d_loc = np.asarray(d_loc)
        i_loc = np.asarray(i_loc)
        core = d_loc[:, min(min_samples, k_local) - 1]

        n = sub.shape[0]
        src = np.repeat(np.arange(n, dtype=np.int32), k_local)
        dst = i_loc.reshape(-1).astype(np.int32)
        mreach = np.maximum(
            d_loc.reshape(-1), np.maximum(core[src], core[dst])
        )
        ok = (mreach <= eps) & (src != dst)
        if ok.any():
            from scipy.sparse import coo_matrix
            from scipy.sparse.csgraph import connected_components

            graph = coo_matrix(
                (np.ones(int(ok.sum()), np.int8), (src[ok], dst[ok])),
                shape=(n, n),
            )
            _, comp = connected_components(graph, directed=False)
            # endpoint certification: the 1-NN backfill labels are not
            # trustworthy near boundaries — a background pixel backfilled
            # as cluster ``a`` is eps-connected through the (dense)
            # background to one backfilled as ``b``, which would union
            # a/b on a path that never visits either cluster (measured:
            # demo9's part-2 analogue folded 2 real clusters this way).
            # A point certifies for its label iff >= 90% of its local
            # kNN share it; intermediaries stay unrestricted (the path
            # itself is real geometry either way).
            purity = (sub_lab[i_loc] == sub_lab[:, None]).mean(axis=1)
            cert = purity >= 0.9
            for a, b in pairs:
                # connected at <= eps iff a component holds both labels
                in_a = np.unique(comp[(sub_lab == a) & cert])
                in_b = np.unique(comp[(sub_lab == b) & cert])
                if np.intersect1d(in_a, in_b, assume_unique=True).size:
                    lab_uf.union(a, b)

    _debug_t("part1", t0)

    # --- part 2: condensed-node viability of small clusters -------------
    t0 = time.perf_counter()
    try:
        _small_cluster_viability_merges(
            flat, labels, j_all, pairs, lab_uf, eps, min_samples,
            min_cluster_size, flat_tree=flat_tree,
        )
    finally:
        if tree_box and tree_box[0] is not None:
            tree_box[0].close()
    _debug_t("part2", t0)

    roots = np.array([lab_uf.find(int(u)) for u in uniq])
    if np.all(roots == uniq):
        return labels
    remap = np.full(int(uniq.max()) + 1, -1, np.int64)
    remap[uniq] = roots
    # compact to 0..n-1 like the labelling stage does
    kept = np.unique(roots)
    compact = np.full(int(kept.max()) + 1, -1, np.int64)
    compact[kept] = np.arange(len(kept))
    out = labels.copy()
    pos = labels >= 0
    out[pos] = compact[remap[labels[pos]]]
    return out


def _refine_knn_self(x, k: int):
    """Self-kNN for the refinement's boundary subsets — host-side by
    design.  The subset sizes here are data-dependent (seed-mask hits,
    blob neighbourhoods), and on remote-compile backends every novel
    device shape is a fresh multi-minute XLA compile: round 4's driver
    bench sat 44+ minutes in this pass's compile tail (VERDICT r4).  The
    native C++ tree is compile-free and these subsets are <= a few
    hundred k points.  ``IGGT_DEVICE_KNN=1`` (explicit force, for
    locally-attached chips where compiles are cheap) restores the device
    brute blocks."""
    x = np.asarray(x, np.float32)
    if os.environ.get("IGGT_DEVICE_KNN") == "1" and _accelerator_available():
        from iggt_official_tpu.ops.knn import brute_knn

        return brute_knn(x, x, k, approx=x.shape[0] ** 2 >= 4_000_000)
    from iggt_official_tpu import native

    if native.available():
        return native.knn_query(x, k)
    from sklearn.neighbors import NearestNeighbors

    return NearestNeighbors(n_neighbors=k).fit(x).kneighbors(x)


def _knn_query_vs(ref, query: np.ndarray, k: int, tree=None):
    """(dist, idx) of the k nearest ``ref`` rows per query row, exact.

    Exact top_k on purpose: part 2's verdicts are sensitive to missing
    local-graph edges — `approx_min_k` at its 0.95 recall target folded a
    real demo9 cluster (5-vs-6, mIoU 0.799; exact restores 6/6 at 0.937),
    because dropped edges delay the blob's mass accretion past its touch
    height.

    Host-side by design (same rationale as `_refine_knn_self`): the
    refinement calls this with data-dependent blob/neighbourhood query
    counts, and every distinct device shape was a fresh multi-minute
    remote XLA compile — round 4's bench never finished this pass.  Pass
    ``tree`` (a ``native.KnnTree`` over ``ref``) to amortize the tree
    build across the per-cluster-pair queries.  ``IGGT_DEVICE_KNN=1``
    restores the device brute blocks (query counts padded to a
    power-of-two block count so the shape family stays bounded, with the
    block size computed by brute_knn's own 512 MiB formula)."""
    if tree is not None:
        return tree.query(np.asarray(query, np.float32), k)
    if os.environ.get("IGGT_DEVICE_KNN") == "1" and _accelerator_available():
        from iggt_official_tpu.ops.knn import brute_knn, query_block_for

        q = np.asarray(query, np.float32)
        Q = q.shape[0]
        # pad to brute_knn's OWN dispatch block (shared helper — a
        # mismatched mirror would re-open the per-query-count compile
        # tail, ADVICE r4)
        block = query_block_for(ref.shape[0])
        n_blocks = -(-Q // block)
        n_pow2 = 1 << max(0, n_blocks - 1).bit_length()
        if n_pow2 * block > Q:
            q = np.concatenate(
                [q, np.repeat(q[:1], n_pow2 * block - Q, axis=0)])
        d, i = brute_knn(ref, q, k, block=block)
        return d[:Q], i[:Q]
    from iggt_official_tpu import native

    if native.available():
        return native.knn_query_vs(
            np.asarray(ref, np.float32), np.asarray(query, np.float32), k)
    from sklearn.neighbors import NearestNeighbors

    nn = NearestNeighbors(n_neighbors=k).fit(np.asarray(ref))
    return nn.kneighbors(query)


def _small_cluster_viability_merges(
    flat,
    labels: np.ndarray,
    j_all: np.ndarray,
    pairs,
    lab_uf: "_UnionFind",
    eps: float,
    min_samples: int,
    min_cluster_size: int,
    small_cap_ratio: int = 8,
    flat_tree=None,
) -> None:
    """Full-density condensed-node viability test for small clusters.

    The second thinning bias (after bottleneck inflation): when a small
    blob meets a big cluster in the dendrogram, the exact algorithm keeps
    it as its own cluster only if the blob-side SUBTREE — every point
    connected to it strictly below the merge height — reaches
    ``min_cluster_size`` total mass (`_labels_from_mst` big_l/big_r);
    otherwise its points fall out into the neighbour's condensed node.
    The subsampled run makes this decision on the thinned graph, whose
    inflated saddles systematically let sparse blobs separate (measured:
    demo7's 2454-px blob, junction cores 0.063-0.073 vs full
    min_cluster_size 500, `benchmarks/subsample_policy_lab.py`).

    This pass replays the decision at full density for every candidate
    pair with a small side, as a LOCAL single-linkage growth: over the
    kNN mutual-reachability graph of the blob's full-resolution
    neighbourhood (blob points + their k nearest, UNSCALED min_samples
    cores), sweep the linkage threshold upward and watch the component(s)
    containing blob points.  If a blob component reaches
    ``min_cluster_size`` mass while still separate from the big
    cluster's interior, the blob is viable — keep the split.  If it
    touches the big cluster's interior first, its subtree was below
    min_cluster_size at the merge — fold it in.  Interior means big-
    labelled points whose own kNN is >= 90% big-labelled (1-NN backfill
    labels near the junction are not trustworthy).  The neighbourhood is
    one kNN hop, which can only UNDER-count the subtree (missing late
    accretions keeps splits in place) — conservative in the same
    direction as part 1.  Merges are recorded into ``lab_uf``.
    """
    if not min_cluster_size:
        return
    full_labels = labels[j_all]
    sizes = np.bincount(
        full_labels[full_labels >= 0],
        minlength=int(labels.max()) + 1,
    )
    k = min_samples + 1
    if k > full_labels.shape[0]:
        return
    for a, b in sorted(pairs):
        s, big = (a, b) if sizes[a] <= sizes[b] else (b, a)
        if lab_uf.find(s) == lab_uf.find(big):
            continue
        if sizes[s] < min_cluster_size:
            # below the full-density min_cluster_size the condensed tree
            # can never select it — the split is a pure thinning artifact
            lab_uf.union(s, big)
            continue
        if not sizes[s] < small_cap_ratio * min_cluster_size:
            continue
        if sizes[s] > 20_000:
            continue
        tp = time.perf_counter()
        s_idx = np.flatnonzero(full_labels == s)
        tree = flat_tree() if callable(flat_tree) else flat_tree
        d_s, i_s = _knn_query_vs(
            flat, np.asarray(flat[s_idx], np.float32), k, tree=tree)
        d_s = np.asarray(d_s)
        i_s = np.asarray(i_s)
        if not (full_labels[i_s] == big).any():
            continue

        # one-hop neighbourhood of the blob at full resolution, capped by
        # keeping the CLOSEST non-blob neighbours: the mass event is
        # driven by the blob's own points (always all included — a blob
        # below min_cluster_size was folded unconditionally above), so
        # truncating far neighbours can only drop distant touch paths,
        # which biases toward keeping the split — the conservative
        # direction.  Without the cap a 3.6k-px blob's one-hop set
        # reaches ~300k ids and the kNN query over the 1M-px scene
        # dominates the refinement (117 s measured on demo9).
        nbr_cap = max(4 * s_idx.size, 30_000)
        nbr = i_s.reshape(-1)
        nbr_d = d_s.reshape(-1)
        outside = ~np.isin(nbr, s_idx)
        nbr, nbr_d = nbr[outside], nbr_d[outside]
        uniq_n, inv = np.unique(nbr, return_inverse=True)
        if uniq_n.size > nbr_cap:
            min_d = np.full(uniq_n.size, np.inf)
            np.minimum.at(min_d, inv, nbr_d)
            uniq_n = uniq_n[np.argsort(min_d, kind="stable")[:nbr_cap]]
        # blob rows reuse the first query's results — only the NEW
        # neighbour rows hit the device (the blob is usually the larger
        # side of the padded dispatch, so this halves the exact top_k
        # work per pair)
        d_new, i_new = _knn_query_vs(
            flat, np.asarray(flat[uniq_n], np.float32), k, tree=tree)
        cat = np.concatenate([s_idx, uniq_n])
        order = np.argsort(cat, kind="stable")
        L_ids = cat[order]
        dL = np.concatenate([d_s, np.asarray(d_new)])[order]
        iL = np.concatenate([i_s, np.asarray(i_new)])[order]
        coreL = dL[:, min_samples - 1]
        lab_L = full_labels[L_ids]
        # both memberships are certified by full-density neighbour purity:
        # the 1-NN backfill labels a ring of true-``big`` pixels as ``s``
        # around every blob, and an uncertified ``is_s`` seeds the sweep
        # with points sitting in the big cluster's dense component — which
        # "touches" big interior at a tiny threshold and folds viable
        # blobs (measured on demo9: 2 real clusters lost,
        # `benchmarks/diag_demo9_merge.py`).
        s_frac = (full_labels[iL] == s).mean(axis=1)
        is_s = (lab_L == s) & (s_frac >= 0.9)
        big_frac = (full_labels[iL] == big).mean(axis=1)
        is_big_int = (lab_L == big) & (big_frac >= 0.9)
        if not is_big_int.any() or not is_s.any():
            continue

        # local mreach edges (within the neighbourhood)
        nL = L_ids.shape[0]
        loc = np.full(int(full_labels.shape[0]), -1, np.int32)
        loc[L_ids] = np.arange(nL, dtype=np.int32)
        src = np.repeat(np.arange(nL, dtype=np.int32), k)
        dst = loc[iL.reshape(-1)]
        w = np.maximum(dL.reshape(-1), coreL[src])
        ok = dst >= 0
        w = np.where(ok, np.maximum(w, coreL[np.where(ok, dst, 0)]), np.inf)
        ok &= (src != dst) & np.isfinite(w)
        src, dst, w = src[ok], dst[ok], w[ok]

        merge_verdict = _grow_until_viable_or_touch(
            nL, src, dst, w, is_s, is_big_int, min_cluster_size
        )
        _debug_t(
            f"part2 pair ({s},{big}) blob={s_idx.size} L={nL} "
            f"fold={merge_verdict}", tp)
        if merge_verdict:
            lab_uf.union(s, big)


def _grow_until_viable_or_touch(
    n: int,
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    is_s: np.ndarray,
    is_big: np.ndarray,
    min_cluster_size: int,
) -> bool:
    """Single-linkage event sweep: True = fold the blob (an s-seeded
    component touches the big cluster's interior before any s-seeded
    component reaches ``min_cluster_size`` mass), False = keep the split.

    Exact Kruskal: edges ascend in weight through a union-find carrying
    (mass, has_s, has_big) per root; the first event decides — no grid,
    no bisection.  Within one edge both events can land together (the
    union brings a big-interior node AND crosses the mass bar); touch
    wins, matching the exact algorithm where the subtree dies at the
    merge height it reaches the neighbour.
    """
    finite = np.isfinite(w)
    src, dst, w = src[finite], dst[finite], w[finite]
    if w.size == 0:
        return False
    order = np.argsort(w, kind="stable")
    src, dst = src[order].tolist(), dst[order].tolist()

    parent = list(range(n))
    mass = [1] * n
    has_s = is_s.tolist()
    has_big = is_big.tolist()

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(src, dst):
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        if mass[ra] < mass[rb]:
            ra, rb = rb, ra
        parent[rb] = ra
        mass[ra] += mass[rb]
        hs = has_s[ra] or has_s[rb]
        hb = has_big[ra] or has_big[rb]
        has_s[ra], has_big[ra] = hs, hb
        if hs and hb:
            return True                     # touch first: fold
        if hs and mass[ra] >= min_cluster_size:
            return False                    # viable first: keep
    return False


def _cluster_mv_device(
    flat_dev,
    n: int,
    h: int,
    w: int,
    eps: float,
    min_samples: int,
    min_cluster_size: int,
    budget: int,
) -> np.ndarray:
    """Device-resident multi-view clustering fast path.

    The feature map never round-trips to the host: subsample gather, kNN
    (approx_min_k blocks), mutual-reachability MST (rank Boruvka) and the
    1-NN noise/backfill assignments (Pallas nn1 kernel) all run on the
    accelerator; only the MST edges, the (K,) labels and the final (M,)
    assignment indices cross the device boundary.  Semantics mirror the
    host path below line for line."""
    import functools

    import jax
    import jax.numpy as jnp

    from iggt_official_tpu.ops.nn1_pallas import nn1_pallas as _nn1_kernel

    nn1_pallas = functools.partial(
        _nn1_kernel, interpret=jax.default_backend() == "cpu"
    )

    M = flat_dev.shape[0]
    if M > budget:
        rng = np.random.default_rng(0)
        sample_idx = rng.choice(M, budget, replace=False)
        rate = budget / M
        pts_dev = flat_dev[jnp.asarray(sample_idx)]
        ms = max(2, int(round(min_samples * rate)))
        mcs = max(2, int(round(min_cluster_size * rate)))
    else:
        sample_idx = None
        pts_dev = flat_dev
        ms, mcs = min_samples, min_cluster_size
    weights = np.ones(pts_dev.shape[0], np.float64)

    t0 = time.perf_counter()
    labels, mst, knn = weighted_hdbscan(
        pts_dev, weights, eps, ms, mcs, approx_ok=True, return_mst=True
    )
    _debug_t("hdbscan", t0)

    # noise -> 1-NN clustered pixel (`misc.py:135-148`)
    t0 = time.perf_counter()
    noise = labels == -1
    if noise.all():
        labels[:] = 0
    elif noise.any():
        # pad BOTH sides of the split to powers of two: the noise count
        # is data-dependent (and device-kNN tie-break jitter makes it
        # vary run to run on identical inputs), so unpadded shapes mint
        # a fresh remote-compiled nn1_pallas program nearly every run —
        # caught as a per-run drizzle of novel jit_nn1_pallas cache
        # entries by the round-5 strict preflight.  Query pads repeat
        # row 0 and are sliced off; ref pads are overwritten with a
        # huge sentinel coordinate so they never win a nearest-neighbour
        # race (exact tie-break semantics preserved).
        noise_idx = np.flatnonzero(noise)
        clus_idx = np.flatnonzero(~noise)
        qn, rn = len(noise_idx), len(clus_idx)
        qp2 = 1 << (qn - 1).bit_length()
        rp2 = 1 << (rn - 1).bit_length()
        noise_pad = np.concatenate(
            [noise_idx, np.zeros(qp2 - qn, np.int64)])
        clus_pad = np.concatenate(
            [clus_idx, np.zeros(rp2 - rn, np.int64)])
        q_dev = pts_dev[jnp.asarray(noise_pad)]
        ref_dev = pts_dev[jnp.asarray(clus_pad)]
        if rp2 > rn:
            # rn rides as a traced operand (array, not python int): a
            # static slice/literal would bake the count into the program
            # and defeat the pow2 bounding
            keep = (jnp.arange(rp2, dtype=jnp.int32)
                    < jnp.asarray(rn, jnp.int32))
            ref_dev = jnp.where(keep[:, None], ref_dev, jnp.float32(1e30))
        j = np.asarray(nn1_pallas(q_dev, ref_dev))[:qn]
        labels[noise] = labels[~noise][j]
    _debug_t("noise-reassign", t0)

    if sample_idx is None:
        return labels.reshape(n, h, w)
    # the backfill kernel is dispatched async here; the refinement's
    # host-side phases (MST candidate scan, seed mask, scipy work) run
    # while it executes, and the lazy handle materializes it only where
    # first needed (part 1) — ~0.5 s of the demo1 p50 hidden
    t0 = time.perf_counter()
    j_dev = nn1_pallas(flat_dev, pts_dev)
    _debug_t("backfill-dispatch", t0)
    memo = {}

    def j_fn():
        if "j" not in memo:
            t1 = time.perf_counter()
            j = np.asarray(j_dev).astype(np.int64)
            j[sample_idx] = np.arange(pts_dev.shape[0])
            memo["j"] = j
            _debug_t("backfill-materialize", t1)
        return memo["j"]

    labels = _boundary_merge_full_density(
        flat_dev, pts_dev, labels, j_fn, eps, min_samples,
        min_cluster_size, mst=mst, knn=knn,
    )
    return labels[j_fn()].reshape(n, h, w)


def _cluster_mv_host(
    flat: np.ndarray,
    n: int,
    h: int,
    w: int,
    eps: float,
    min_samples: int,
    min_cluster_size: int,
    budget: int,
    exact: bool,
) -> np.ndarray:
    """Host multi-view clustering (the spec path `_cluster_mv_device`
    mirrors)."""
    M = flat.shape[0]
    if M > budget and not exact:
        rng = np.random.default_rng(0)
        sample_idx = rng.choice(M, budget, replace=False)
        rate = budget / M
        pts = flat[sample_idx]
        ms = max(2, int(round(min_samples * rate)))
        mcs = max(2, int(round(min_cluster_size * rate)))
    else:
        sample_idx = None
        pts = flat
        ms, mcs = min_samples, min_cluster_size
    weights = np.ones(pts.shape[0], np.float64)

    labels, mst, knn = weighted_hdbscan(
        pts, weights, eps, ms, mcs, approx_ok=not exact, return_mst=True
    )

    # noise -> 1-NN clustered pixel (`misc.py:135-148`)
    noise = labels == -1
    if noise.all():
        labels[:] = 0
    elif noise.any():
        labels[noise] = labels[~noise][_nn1(pts[~noise], pts[noise])]

    if sample_idx is None:
        return labels.reshape(n, h, w)
    j_all = np.empty(M, np.int64)
    j_all[sample_idx] = np.arange(pts.shape[0])
    rest = np.ones(M, bool)
    rest[sample_idx] = False
    j_all[rest] = _nn1(pts, flat[rest])
    labels = _boundary_merge_full_density(
        flat, pts, labels, j_all, eps, min_samples, min_cluster_size,
        mst=mst, knn=knn,
    )
    return labels[j_all].reshape(n, h, w)


def cluster_features_to_masks_mv(
    feature_map,
    apply_colormap: bool = False,
    eps: float = 0.06,
    min_samples: int = 100,
    min_cluster_size: int = 500,
    exact: bool = False,
    **_ignored,
) -> Union[np.ndarray, Tuple[np.ndarray, np.ndarray]]:
    """Joint multi-view clustering (`misc.py:81-170` semantics).

    ``feature_map`` may be numpy or a device array — on an accelerator
    the whole pipeline runs device-resident (`_cluster_mv_device`).
    ``exact=True`` disables the subsampling workload bound and runs the
    weighted HDBSCAN over every pixel — the reference algorithm at full
    density (verified to match sklearn on identical inputs); use for
    parity-critical evaluation, minutes at demo scale."""
    n, h, w, c = feature_map.shape
    M = n * h * w

    # Workload bound: grid quantization compresses poorly in 8-D, so large
    # inputs are handled by HDBSCAN-on-a-uniform-subsample with the density
    # parameters scaled by the sampling rate (uniform thinning at rate r
    # scales every neighbourhood count by r, preserving the density
    # hierarchy in expectation); non-sampled pixels are 1-NN-assigned —
    # the same mechanism the reference already uses for noise pixels.
    budget = 150_000
    use_device = False
    if not exact and M >= 32_768 and _accelerator_available():
        from iggt_official_tpu import native

        use_device = native.available()

    if use_device:
        import jax.numpy as jnp

        flat_dev = jnp.asarray(feature_map).reshape(-1, c).astype(
            jnp.float32
        )
        masks = _cluster_mv_device(
            flat_dev, n, h, w, eps, min_samples, min_cluster_size, budget
        )
    else:
        flat = np.asarray(feature_map).reshape(-1, c).astype(np.float32)
        masks = _cluster_mv_host(
            flat, n, h, w, eps, min_samples, min_cluster_size, budget,
            exact,
        )
    if not apply_colormap:
        return masks
    return masks, colorize_masks(masks)


def cluster_features_to_masks(
    feature_map: np.ndarray,
    method: str = "dbscan",
    apply_colormap: bool = False,
    n_clusters: int = 5,
    eps: float = 0.06,
    min_samples: int = 100,
    min_cluster_size: int = 500,
) -> Union[np.ndarray, Tuple[np.ndarray, np.ndarray]]:
    """Per-view variant (`misc.py:174-269`)."""
    feature_map = np.asarray(feature_map)
    n, h, w, c = feature_map.shape
    masks = np.zeros((n, h, w), np.int64)
    for i in range(n):
        flat = feature_map[i].reshape(-1, c).astype(np.float32)
        if method == "kmeans":
            from sklearn.cluster import MiniBatchKMeans

            labels = MiniBatchKMeans(
                n_clusters=n_clusters, n_init="auto"
            ).fit_predict(flat)
        elif method == "dbscan":
            labels = cluster_features_to_masks_mv(
                feature_map[i : i + 1],
                eps=eps,
                min_samples=min_samples,
                min_cluster_size=min_cluster_size,
            ).reshape(-1)
        else:
            raise ValueError(f"unknown method {method}")
        masks[i] = labels.reshape(h, w)
    if not apply_colormap:
        return masks
    return masks, colorize_masks(masks)


def colorize_masks(masks: np.ndarray) -> np.ndarray:
    """Jet colormap, label colors consistent across views
    (`misc.py:151-170`).  -1 renders black."""
    from matplotlib import colormaps

    unique = np.unique(masks)
    unique = unique[unique != -1]
    n_colors = len(unique)
    cmap = colormaps.get_cmap("jet")
    ts = (
        np.arange(n_colors) / (n_colors - 1)
        if n_colors > 1
        else np.full(max(n_colors, 1), 0.5)
    )
    colors = (np.asarray([cmap(t)[:3] for t in ts]) * 255).astype(np.uint8)
    # dense LUT over the label range; -1 (noise) renders black
    lut = np.zeros((int(unique.max()) + 2 if n_colors else 2, 3), np.uint8)
    lut[unique + 1] = colors
    return lut[masks + 1]
