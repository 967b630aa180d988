"""Isolate the Morton-window smoothing approximation's end-to-end cost.

VERDICT r2 item 8: the Morton-window kNN smoothing (`ops/knn.py::
knn_smooth_features`) has measured recall@20 = 0.93 (p10 0.80) at 300k
points, but its effect on the final instance masks was never isolated.
This script runs the mask pipeline on a demo-scale structured room scene
(the adversarial geometry from tests/test_postproc.py::
test_knn_smoothing_recall_at_scale) three ways — exact-graph smoothing
(`knn_smooth_features_exact`, reference semantics verbatim), Morton-window
smoothing, and no smoothing — clusters each, and reports Hungarian-matched
mIoU of each variant's masks vs the exact-smoothing masks and vs ground
truth.  The result decides the default (PERF.md "smoothing approximation"
section).

Run:  python benchmarks/measure_smoothing.py [n_points]
Writes benchmarks/smoothing_deltas.json.
"""

from __future__ import annotations

import json
import os.path as op
import sys
import time

import numpy as np

sys.path.insert(0, op.join(op.dirname(op.abspath(__file__)), ".."))


def room_scene(rng, n):
    """Structured room: floor + 2 thin walls + 10 poles + clutter."""
    m = n // 5
    parts = [
        np.stack([rng.uniform(0, 6, m), rng.uniform(0, 6, m),
                  np.abs(rng.normal(0, .01, m))], 1),
        np.stack([np.abs(rng.normal(0, .01, m)), rng.uniform(0, 6, m),
                  rng.uniform(0, 3, m)], 1),
        np.stack([rng.uniform(0, 6, m), np.abs(rng.normal(0, .01, m)),
                  rng.uniform(0, 3, m)], 1),
    ]
    kk = m // 10
    poles = []
    for _ in range(10):
        cx, cy = rng.uniform(1, 5, 2)
        poles.append(np.stack([cx + rng.normal(0, .01, kk),
                               cy + rng.normal(0, .01, kk),
                               rng.uniform(0, 2.5, kk)], 1))
    parts.append(np.concatenate(poles))
    parts.append(rng.uniform(0, 6, (m, 3)) * [1, 1, 0.5])
    pts = np.concatenate(parts).astype(np.float32)
    rng.shuffle(pts)
    return pts[:n]


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


def main():
    import jax.numpy as jnp

    from iggt_official_tpu.ops.cluster import cluster_features_to_masks_mv
    from iggt_official_tpu.ops.knn import (
        knn_smooth_features,
        knn_smooth_features_exact,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_536_000
    rng = np.random.default_rng(0)
    pts = room_scene(rng, n)

    # instance-like features: 12 instances with px-scale boundaries +
    # sensor noise (trained part features are L2-normed 8-D)
    n_inst = 12
    centers = rng.normal(0, 1, (n_inst, 8))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    gt = (
        (pts[:, 0] // 1.0).astype(int) * 3 + (pts[:, 2] // 1.1).astype(int)
    ) % n_inst
    fts = (centers[gt] + rng.normal(0, 0.12, (n, 8))).astype(np.float32)
    fts /= np.linalg.norm(fts, axis=1, keepdims=True).clip(1e-9)

    # fold into a multi-view layout the pipeline expects
    h = w = int(np.sqrt(n // 6))
    m = 6 * h * w
    pts_mv = pts[:m].reshape(6, h, w, 3)
    fts_mv = fts[:m].reshape(6, h, w, 8)
    gt_mv = gt[:m].reshape(6, h, w)

    def normed(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True).clip(1e-9)

    variants = {}
    t0 = time.perf_counter()
    variants["exact"] = normed(
        knn_smooth_features_exact(pts_mv, fts_mv, k=20)
    )
    t_exact = time.perf_counter() - t0
    t0 = time.perf_counter()
    variants["morton"] = normed(np.asarray(
        knn_smooth_features(jnp.asarray(pts_mv), jnp.asarray(fts_mv), k=20)
    ))
    t_morton = time.perf_counter() - t0
    variants["none"] = normed(fts_mv)

    masks = {}
    times = {"smooth_exact_s": t_exact, "smooth_morton_s": t_morton}
    for name, feat in variants.items():
        t0 = time.perf_counter()
        masks[name] = cluster_features_to_masks_mv(
            feat, apply_colormap=False,
            eps=0.06, min_samples=100, min_cluster_size=500,
        )
        times[f"cluster_{name}_s"] = time.perf_counter() - t0

    out = {
        "n_points": int(m),
        "n_instances_gt": int(n_inst),
        "times_s": {k: round(v, 2) for k, v in times.items()},
        "n_clusters": {
            k: int(len(np.unique(v[v >= 0]))) for k, v in masks.items()
        },
        "miou_vs_exact_smoothing": {
            k: matched_miou(masks["exact"], v)
            for k, v in masks.items() if k != "exact"
        },
        "miou_vs_gt": {
            k: matched_miou(gt_mv, v) for k, v in masks.items()
        },
    }
    path = op.join(op.dirname(op.abspath(__file__)), "smoothing_deltas.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
