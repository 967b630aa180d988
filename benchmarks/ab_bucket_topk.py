"""On-chip A/B: bucket_topk_pallas vs approx_min_k core-kNN (VERDICT r4 #2).

Round 3 swapped `ops/cluster.py`'s device core-kNN to the new
`bucket_topk_pallas` kernel without ever compiling it on hardware; the
swap was reverted.  This harness settles it on the chip, at the real
clustering operating point: the seed-0 150k subsample of a demo scene's
smoothed features (from the subsample_policy_lab cache — run
`subsample_policy_lab.py --extract` first), k=64.

Measures, for each of {approx_min_k blocks (current default),
bucket_topk_pallas (candidate), exact top_k blocks (reference)}:
  - warm wall time of the kNN phase (device arrays in, device arrays out)
  - recall@64 vs the exact graph
  - END-TO-END cluster labels through mreach_mst_device +
    condensed-tree labelling, matched mIoU vs the exact-graph labels
plus the backfill phase (nn1_pallas vs brute_knn k=1) at full M x 150k.

Writes benchmarks/bucket_topk_ab.json; the verdict (keep or drop the
kernel) goes to PERF.md.
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as op
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, op.join(op.dirname(op.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def _sync(*arrs):
    for a in arrs:
        np.asarray(a.ravel()[:1])


def timeit(fn, runs=5, warmup=1):
    for _ in range(warmup):
        out = fn()
    _sync(*[o for o in out if hasattr(o, "ravel")])
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn()
        _sync(*[o for o in out if hasattr(o, "ravel")])
        times.append(time.perf_counter() - t0)
    return statistics.median(times), out


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
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", default="/tmp/subsample_lab")
    ap.add_argument("--scene", default="demo6")
    ap.add_argument("--budget", type=int, default=150_000)
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    import jax.numpy as jnp

    from iggt_official_tpu.ops.cluster import _labels_from_edges
    from iggt_official_tpu.ops.cluster_device import mreach_mst_device
    from iggt_official_tpu.ops.knn import brute_knn
    from iggt_official_tpu.ops.nn1_pallas import bucket_topk_pallas, nn1_pallas

    path = op.join(args.cache, f"{args.scene}.npz")
    smoothed = np.load(path)["smoothed"]
    flat = smoothed.reshape(-1, smoothed.shape[-1]).astype(np.float32)
    M = flat.shape[0]
    rng = np.random.default_rng(0)
    sample_idx = rng.choice(M, args.budget, replace=False)
    pts_np = flat[sample_idx]
    pts = jnp.asarray(pts_np)
    rate = args.budget / M
    ms = max(2, int(round(100 * rate)))
    mcs = max(2, int(round(500 * rate)))
    k = max(64, ms + 1)
    print(f"{args.scene}: M={M}, budget={args.budget}, k={k}, ms={ms}")

    results = {"scene": args.scene, "M": M, "k": k}

    # --- exact reference graph -------------------------------------------
    t_exact, (d_ex, i_ex) = timeit(
        lambda: brute_knn(pts, pts, k, approx=False, out_device=True),
        runs=args.runs,
    )
    i_ex_np = np.asarray(i_ex)
    print(f"exact top_k blocks      : {t_exact:.3f}s")

    def recall(i_test):
        hits = 0
        it = np.asarray(i_test)
        for q in range(0, args.budget, 9973):  # stride probe, ~15 rows/1k
            hits += len(np.intersect1d(it[q], i_ex_np[q])) / k
        n = len(range(0, args.budget, 9973))
        return hits / n

    def labels_from(d_dev, i_dev):
        edge_a, edge_b, edge_d, core = mreach_mst_device(d_dev, i_dev, ms)
        w = np.ones(args.budget, np.float64)
        return _labels_from_edges(
            edge_a, edge_b, edge_d, w, core, 0.06, mcs, False
        )

    lab_ex = labels_from(d_ex, i_ex)

    for name, fn in [
        ("approx_min_k", lambda: brute_knn(
            pts, pts, k, approx=True, out_device=True)),
        ("bucket_topk", lambda: bucket_topk_pallas(pts, pts, k)),
    ]:
        try:
            t, (d, i) = timeit(fn, runs=args.runs)
            rec = recall(i)
            lab = labels_from(d, i)
            miou = matched_miou(lab_ex, lab)
            results[name] = {
                "t_s": round(t, 3), "recall": round(rec, 4),
                "labels_miou_vs_exact_graph": round(miou, 4),
                "clusters": int(len(np.unique(lab[lab >= 0]))),
            }
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(name, results[name], flush=True)
    results["exact_topk"] = {
        "t_s": round(t_exact, 3),
        "clusters": int(len(np.unique(lab_ex[lab_ex >= 0]))),
    }

    # --- backfill phase: 1-NN of all M pixels against the subsample -------
    flat_dev = jnp.asarray(flat)
    t_nn1, _ = timeit(lambda: (nn1_pallas(flat_dev, pts),), runs=3)
    t_bf, _ = timeit(
        lambda: brute_knn(pts, flat_dev, 1, out_device=True), runs=3
    )
    results["backfill_nn1_pallas_s"] = round(t_nn1, 3)
    results["backfill_brute_k1_s"] = round(t_bf, 3)
    print("backfill nn1_pallas", t_nn1, "brute k=1", t_bf)

    out_path = op.join(op.dirname(op.abspath(__file__)), "bucket_topk_ab.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
