"""Density clustering of instance features -> multi-view masks.

Behavioural parity: `iggt/utils/misc.py:81-269`:
- ``cluster_features_to_masks_mv``: flatten all views' (N, H, W, C=8)
  features, density-cluster them jointly (same instance id across views),
  reassign noise pixels to their 1-NN clustered pixel, optional jet
  colormap with per-label colors consistent across views.
- ``cluster_features_to_masks``: per-view variant (kmeans | dbscan).

TPU/host split (the reference needs cuml's GPU HDBSCAN, `misc.py:19-22`):
density clustering is irregular, so the heavy O(pixels) work is compressed
ON DEVICE first — features are quantized to eps/2 grid cells and reduced to
unique cells with counts (~50-200x compression) — and a first-party
weighted DBSCAN (union-find over radius neighbourhoods) runs on the host
over cells only.  DBSCAN(eps) approximates the reference's
HDBSCAN(cluster_selection_epsilon=eps, min_samples, min_cluster_size):
both select eps-radius density-connected components and drop clusters
below min_cluster_size; the tree-based noise handling differs, but noise
pixels are 1-NN-reassigned afterwards in both pipelines, which absorbs
most of the boundary difference.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple, Union

import numpy as np


def _quantize_cells(flat: np.ndarray, cell: float):
    """Compress (M, C) features to unique grid cells.

    Returns (cell_centers (K, C) = mean feature per cell, counts (K,),
    pixel->cell index (M,)).
    """
    q = np.floor(flat / cell).astype(np.int32)
    _, pix2cell, counts = np.unique(
        q, axis=0, return_inverse=True, return_counts=True
    )
    K = counts.shape[0]
    sums = np.zeros((K, flat.shape[1]), np.float64)
    np.add.at(sums, pix2cell, flat)
    centers = (sums / counts[:, None]).astype(np.float32)
    return centers, counts.astype(np.int64), pix2cell


def _nn1(ref: np.ndarray, query: np.ndarray) -> np.ndarray:
    """Index of nearest ``ref`` point per query (native KD-tree when built)."""
    from iggt_official_tpu import native

    if native.available():
        return native.nearest_neighbor(ref, query)
    from sklearn.neighbors import NearestNeighbors

    nn = NearestNeighbors(n_neighbors=1).fit(ref)
    _, j = nn.kneighbors(query)
    return j[:, 0]


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


def cluster_features_to_masks_mv(
    feature_map: np.ndarray,
    apply_colormap: bool = False,
    eps: float = 0.06,
    min_samples: int = 100,
    min_cluster_size: int = 500,
    **_ignored,
) -> Union[np.ndarray, Tuple[np.ndarray, np.ndarray]]:
    """Joint multi-view clustering (`misc.py:81-170` semantics)."""
    feature_map = np.asarray(feature_map)
    n, h, w, c = feature_map.shape
    flat = feature_map.reshape(-1, c).astype(np.float32)

    centers, counts, pix2cell = _quantize_cells(flat, cell=eps / 2.0)

    # degenerate inputs (e.g. untrained features) can quantize to ~1 cell
    # per pixel; bound the DBSCAN workload by keeping the heaviest cells and
    # folding the rest onto their nearest kept cell
    max_cells = 200_000
    if centers.shape[0] > max_cells:
        keep = np.argsort(counts)[::-1][:max_cells]
        old2new = _nn1(centers[keep], centers)
        new_counts = np.zeros(max_cells, np.int64)
        np.add.at(new_counts, old2new, counts)
        pix2cell = old2new[pix2cell]
        centers, counts = centers[keep], new_counts

    cell_labels = weighted_dbscan(centers, counts, eps, min_samples)

    # drop clusters below min_cluster_size (pixel-weighted)
    if cell_labels.max() >= 0:
        sizes = np.zeros(cell_labels.max() + 1, np.int64)
        for lbl in range(sizes.shape[0]):
            sizes[lbl] = counts[cell_labels == lbl].sum()
        small = np.flatnonzero(sizes < min_cluster_size)
        cell_labels[np.isin(cell_labels, small)] = -1
        # re-densify label ids
        kept = np.unique(cell_labels[cell_labels >= 0])
        remap = {old: new for new, old in enumerate(kept)}
        cell_labels = np.array(
            [remap.get(l, -1) for l in cell_labels], np.int64
        )

    # noise -> 1-NN clustered cell (`misc.py:135-148`)
    noise = cell_labels == -1
    if noise.all():
        cell_labels[:] = 0
    elif noise.any():
        cell_labels[noise] = cell_labels[~noise][
            _nn1(centers[~noise], centers[noise])
        ]

    masks = cell_labels[pix2cell].reshape(n, h, w)
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
    lut: Dict[int, np.ndarray] = {-1: np.zeros(3)}
    for j, lbl in enumerate(unique):
        t = j / (n_colors - 1) if n_colors > 1 else 0.5
        lut[int(lbl)] = np.array(cmap(t)[:3])
    out = np.zeros(masks.shape + (3,), np.uint8)
    for lbl, color in lut.items():
        out[masks == lbl] = (color * 255).astype(np.uint8)
    return out
