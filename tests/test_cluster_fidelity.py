"""Fidelity of the weighted-HDBSCAN replacement vs real (sklearn) HDBSCAN.

The reference clusters 8-D instance features with cuml/hdbscan
(`iggt/utils/misc.py:124-129`: cluster_selection_epsilon=eps, min_samples,
min_cluster_size, allow_single_cluster=False) followed by 1-NN noise
reassignment (`misc.py:135-148`).  Our pipeline runs a first-party
weighted HDBSCAN on the raw pixels (uniform subsample + density-scaled
parameters above 150k pixels, ops/cluster.py).  These tests score
Hungarian-matched mIoU between the two
pipelines on realistic synthetic scenes: spatially-coherent Voronoi
instances, L2-normalized 8-D features with boundary blending — including
regimes where plain DBSCAN provably diverges (cluster chaining).
"""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from iggt_official_tpu.ops.cluster import cluster_features_to_masks_mv

EPS, MIN_SAMPLES, MIN_CLUSTER = 0.06, 100, 500  # demo presets (`demo.py:63-83`)


def synth_scene(rng, n_views=2, h=112, w=112, n_inst=10, sigma=0.03,
                min_sep=0.25):
    """Voronoi instance layout per view; shared cluster centers on S^7."""
    centers = []
    while len(centers) < n_inst:
        c = rng.normal(0, 1, 8)
        c /= np.linalg.norm(c)
        if all(np.linalg.norm(c - o) > min_sep for o in centers):
            centers.append(c)
    centers = np.array(centers)
    feats = np.zeros((n_views, h, w, 8), np.float32)
    for v in range(n_views):
        seeds = rng.uniform(0, 1, (n_inst, 2)) * [h, w]
        yy, xx = np.mgrid[0:h, 0:w]
        d = (yy[..., None] - seeds[:, 0]) ** 2 + (xx[..., None] - seeds[:, 1]) ** 2
        lab = d.argmin(-1)
        f = centers[lab] + rng.normal(0, sigma, (h, w, 8))
        # soft boundaries: blend features toward the 2nd-nearest instance
        second = np.argsort(d, -1)[..., 1]
        d1 = np.take_along_axis(d, lab[..., None], -1)[..., 0]
        d2 = np.take_along_axis(d, second[..., None], -1)[..., 0]
        alpha = np.clip(
            0.5 * (1 - (d2 - d1) / (0.1 * (h * w) ** 0.5) ** 2), 0, 0.5
        )
        f = (1 - alpha[..., None]) * f + alpha[..., None] * centers[second]
        feats[v] = f / np.linalg.norm(f, axis=-1, keepdims=True)
    return feats


def sklearn_hdbscan_pipeline(feats):
    """The reference pipeline on raw pixels (sklearn stands in for cuml)."""
    from sklearn.cluster import HDBSCAN
    from sklearn.neighbors import NearestNeighbors

    n, h, w, c = feats.shape
    ap = feats.reshape(-1, c).astype(np.float64)
    hc = HDBSCAN(
        cluster_selection_epsilon=EPS,
        min_samples=MIN_SAMPLES,
        min_cluster_size=MIN_CLUSTER,
        allow_single_cluster=False,
        copy=True,
    ).fit(ap)
    lab = hc.labels_
    inv = lab == -1
    if inv.sum() and not inv.all():
        nb = NearestNeighbors(n_neighbors=1).fit(ap[~inv])
        _, idx = nb.kneighbors(ap[inv])
        lab[inv] = lab[~inv][idx[:, 0]]
    return lab.reshape(n, h, w)


def matched_miou(a, b):
    la, lb = np.unique(a), np.unique(b)
    iou = np.zeros((len(la), len(lb)))
    for i, x in enumerate(la):
        ma = a == x
        for j, y in enumerate(lb):
            mb = b == y
            inter = (ma & mb).sum()
            iou[i, j] = inter / (ma.sum() + mb.sum() - inter)
    ri, ci = linear_sum_assignment(-iou)
    return iou[ri, ci].sum() / max(len(la), len(lb))


@pytest.mark.parametrize(
    "name,kwargs",
    [
        ("separated", dict(n_inst=7, sigma=0.015)),
        # clusters ~3x eps apart with blended boundaries: plain DBSCAN
        # chains these into one blob (measured mIoU 0.19); HDBSCAN splits
        ("close", dict(min_sep=0.13, sigma=0.04)),
        ("many", dict(n_inst=18, sigma=0.02)),
    ],
)
def test_hdbscan_fidelity(name, kwargs):
    rng = np.random.default_rng(1)
    feats = synth_scene(rng, **kwargs)
    ref = sklearn_hdbscan_pipeline(feats)
    mine = cluster_features_to_masks_mv(
        feats, eps=EPS, min_samples=MIN_SAMPLES, min_cluster_size=MIN_CLUSTER
    )
    assert ref.max() == mine.max(), (
        f"[{name}] cluster count {mine.max()+1} vs hdbscan {ref.max()+1}"
    )
    miou = matched_miou(ref, mine)
    assert miou >= 0.97, f"[{name}] matched mIoU {miou:.4f} < 0.97"


@pytest.mark.slow
def test_weighted_hdbscan_matches_sklearn_at_scale():
    """Algorithm fidelity at demo scale: on an IDENTICAL 150k subsample
    with the density-scaled parameters, our weighted HDBSCAN must
    reproduce sklearn's HDBSCAN labels (measured: both 13 clusters,
    identical 11.76% noise on this scene).

    Note on the pipeline-level subsampling itself: uniform thinning is not
    exactly HDBSCAN-invariant — on this adversarial heavily-blended scene,
    full-density sklearn merges to 4 clusters (12 true instances; 55 min
    runtime) while the thinned run splits to 13.  In the separated regime
    representative of trained instance features, full-density and
    subsampled answers agree (see PERF.md measurements).
    """
    from sklearn.cluster import HDBSCAN

    from iggt_official_tpu.ops.cluster import weighted_hdbscan

    rng = np.random.default_rng(3)
    feats = synth_scene(
        rng, n_views=4, h=336, w=504, n_inst=12, sigma=0.025, min_sep=0.18
    )
    flat = feats.reshape(-1, 8).astype(np.float32)
    M = flat.shape[0]
    idx = np.random.default_rng(0).choice(M, 150_000, replace=False)
    pts = flat[idx]
    rate = 150_000 / M
    ms = max(2, round(MIN_SAMPLES * rate))
    mcs = max(2, round(MIN_CLUSTER * rate))

    ref = HDBSCAN(
        cluster_selection_epsilon=EPS,
        min_samples=ms,
        min_cluster_size=mcs,
        allow_single_cluster=False,
        copy=True,
    ).fit(pts.astype(np.float64)).labels_
    mine = weighted_hdbscan(pts, np.ones(len(pts)), EPS, ms, mcs)

    assert ref.max() == mine.max(), (ref.max() + 1, mine.max() + 1)
    assert abs((ref == -1).mean() - (mine == -1).mean()) < 0.01
    # cluster-level agreement via Hungarian-matched mIoU on labels
    miou = matched_miou(ref[None, None], mine[None, None])
    assert miou >= 0.95, f"subsample label mIoU {miou:.4f}"
