"""Subsample-policy lab: iterate clustering policies against cached scenes.

VERDICT r3 task 6: the default uniform-subsample clustering diverges from
exact full-density HDBSCAN on demo7/demo9 (matched mIoU 0.740/0.803) —
the mushy-boundary regime where near-``eps`` cluster separations flip
under the sampling variance of the density-scaled parameters.  Iterating
policies through the full app pipeline costs a chip forward + an exact
run (110-154 s) per attempt; this lab decouples them:

  --extract   one chip pass per scene: forward + kNN smoothing, smoothed
              features + world points cached to ``--cache`` as npz.
  --exact     one host pass per scene: exact full-density weighted
              HDBSCAN labels cached next to the features.
  --policy P  evaluate policy P host-only from the caches and print the
              per-scene matched mIoU vs the exact labels.

Policies are defined in POLICIES below; the winner graduates into
`ops/cluster.py` and the refreshed `exact_clustering_deltas.json`.
Caches live outside the repo tree (default /tmp) — they are measurement
artifacts, not sources.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import os.path as op
import sys
import time

import numpy as np

sys.path.insert(0, op.join(op.dirname(op.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

PRESET = dict(eps=0.06, min_samples=100, min_cluster_size=500)
BUDGET = 150_000


def matched_miou(a, b):
    from scipy.optimize import linear_sum_assignment

    la, lb = np.unique(a), np.unique(b)
    iou = np.zeros((len(la), len(lb)))
    for i, x in enumerate(la):
        ma = a == x
        for j, y in enumerate(lb):
            mb = b == y
            inter = (ma & mb).sum()
            iou[i, j] = inter / (ma.sum() + mb.sum() - inter)
    ri, ci = linear_sum_assignment(-iou)
    return float(iou[ri, ci].sum() / max(len(la), len(lb)))


def extract(scenes_root: str, cache: str, only=None) -> None:
    import jax.numpy as jnp

    from iggt_official_tpu.app.demo import IGGTProcessor
    from iggt_official_tpu.ops.knn import knn_smooth_features

    proc = IGGTProcessor()
    cc = proc.runtime.clustering
    os.makedirs(cache, exist_ok=True)
    for scene in sorted(glob.glob(os.path.join(scenes_root, "*"))):
        name = os.path.basename(scene.rstrip(os.sep))
        if only and name not in only:
            continue
        if not os.path.isdir(os.path.join(scene, "images")):
            continue
        out = os.path.join(cache, f"{name}.npz")
        if os.path.exists(out):
            print("cached", name)
            continue
        preds = proc._run_inference(scene)
        feat = jnp.asarray(preds["part_feat"][0])
        feat = feat / jnp.maximum(
            jnp.linalg.norm(feat, axis=-1, keepdims=True), 1e-12
        )
        smoothed = knn_smooth_features(
            jnp.asarray(preds["world_points"][0]), feat, k=cc.knn_k
        )
        np.savez(out, smoothed=np.asarray(smoothed))
        print("extracted", name, np.asarray(smoothed).shape, flush=True)


def compute_exact(cache: str, only=None) -> None:
    from iggt_official_tpu.ops.cluster import cluster_features_to_masks_mv

    for path in sorted(glob.glob(os.path.join(cache, "*.npz"))):
        name = op.splitext(op.basename(path))[0]
        if only and name not in only:
            continue
        out = path.replace(".npz", "_exact.npy")
        if os.path.exists(out):
            print("cached", name)
            continue
        smoothed = np.load(path)["smoothed"]
        t0 = time.perf_counter()
        m = cluster_features_to_masks_mv(
            smoothed, apply_colormap=False, exact=True, **PRESET
        )
        np.save(out, m)
        print(f"exact {name}: {time.perf_counter()-t0:.1f}s "
              f"{len(np.unique(m[m>=0]))} clusters", flush=True)


# ----------------------------------------------------------------------
# policies: (flat (M, C) f32) -> (M,) labels
# ----------------------------------------------------------------------

def _host_subsample(flat, budget=BUDGET, seed=0, eps=None, ms=None, mcs=None,
                    weighted=False):
    """The host pipeline with knobs exposed (mirrors _cluster_mv_host)."""
    from iggt_official_tpu.ops.cluster import _nn1, weighted_hdbscan

    eps = PRESET["eps"] if eps is None else eps
    min_samples = PRESET["min_samples"] if ms is None else ms
    min_cluster_size = PRESET["min_cluster_size"] if mcs is None else mcs
    M = flat.shape[0]
    if M > budget:
        rng = np.random.default_rng(seed)
        sample_idx = rng.choice(M, budget, replace=False)
        pts = flat[sample_idx]
        if weighted:
            # every pixel assigned to its nearest sample -> sample weight;
            # parameters stay UNSCALED (weights carry the true mass)
            j_all = _nn1(pts, flat)
            w = np.bincount(j_all, minlength=budget).astype(np.float64)
            labels = weighted_hdbscan(
                pts, w, eps, min_samples, min_cluster_size
            )
            noise = labels == -1
            if noise.all():
                labels[:] = 0
            elif noise.any():
                labels[noise] = labels[~noise][_nn1(pts[~noise], pts[noise])]
            return labels[j_all]
        rate = budget / M
        msx = max(2, int(round(min_samples * rate)))
        mcsx = max(2, int(round(min_cluster_size * rate)))
    else:
        sample_idx = None
        pts = flat
        msx, mcsx = min_samples, min_cluster_size
    w = np.ones(pts.shape[0], np.float64)
    labels = weighted_hdbscan(pts, w, eps, msx, mcsx, approx_ok=True)
    noise = labels == -1
    if noise.all():
        labels[:] = 0
    elif noise.any():
        labels[noise] = labels[~noise][_nn1(pts[~noise], pts[noise])]
    if sample_idx is None:
        return labels
    all_labels = np.empty(M, np.int64)
    all_labels[sample_idx] = labels
    rest = np.ones(M, bool)
    rest[sample_idx] = False
    all_labels[rest] = labels[_nn1(pts, flat[rest])]
    return all_labels


def _production_host(flat):
    """The real host pipeline (`_cluster_mv_host`), incl. any refinement
    passes wired into ops/cluster.py — the policy that actually ships."""
    from iggt_official_tpu.ops.cluster import _cluster_mv_host

    M = flat.shape[0]
    return _cluster_mv_host(
        flat, 1, 1, M, PRESET["eps"], PRESET["min_samples"],
        PRESET["min_cluster_size"], BUDGET, False,
    ).reshape(-1)


POLICIES = {
    "current": lambda flat: _host_subsample(flat),
    "production": _production_host,
    "seed1": lambda flat: _host_subsample(flat, seed=1),
    "seed2": lambda flat: _host_subsample(flat, seed=2),
    "budget300k": lambda flat: _host_subsample(flat, budget=300_000),
    "weighted": lambda flat: _host_subsample(flat, weighted=True),
    "weighted300k": lambda flat: _host_subsample(
        flat, budget=300_000, weighted=True),
}


def run_policy(cache: str, policy: str, only=None) -> None:
    fn = POLICIES[policy]
    rows = {}
    for path in sorted(glob.glob(os.path.join(cache, "*.npz"))):
        name = op.splitext(op.basename(path))[0]
        if only and name not in only:
            continue
        exact_path = path.replace(".npz", "_exact.npy")
        if not os.path.exists(exact_path):
            continue
        smoothed = np.load(path)["smoothed"]
        m_ex = np.load(exact_path).reshape(-1)
        flat = smoothed.reshape(-1, smoothed.shape[-1]).astype(np.float32)
        t0 = time.perf_counter()
        labels = fn(flat)
        dt = time.perf_counter() - t0
        rows[name] = {
            "miou_vs_exact": round(matched_miou(m_ex, labels), 4),
            "clusters": int(len(np.unique(labels[labels >= 0]))),
            "clusters_exact": int(len(np.unique(m_ex[m_ex >= 0]))),
            "t_s": round(dt, 1),
        }
        print(policy, name, rows[name], flush=True)
    if rows:
        mious = [r["miou_vs_exact"] for r in rows.values()]
        print(json.dumps({
            "policy": policy,
            "mean": round(float(np.mean(mious)), 4),
            "min": round(float(np.min(mious)), 4),
        }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", default="/tmp/subsample_lab")
    ap.add_argument("--scenes_root", default="/root/reference/iggt_demo")
    ap.add_argument("--extract", action="store_true")
    ap.add_argument("--exact", action="store_true")
    ap.add_argument("--policy", default=None)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None
    if args.extract:
        extract(args.scenes_root, args.cache, only)
    if args.exact:
        compute_exact(args.cache, only)
    if args.policy:
        for p in args.policy.split(","):
            run_policy(args.cache, p, only)
