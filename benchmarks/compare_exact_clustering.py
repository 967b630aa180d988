"""Default (subsampled) vs exact (full-density) clustering on real scenes.

VERDICT r2 weak #4: the default pipeline subsamples above 150k px with
density-scaled parameters; its fidelity vs the reference's full-density
HDBSCAN on real scenes rested on an argument.  This script runs the app
pipeline twice over every scene under --scenes_root (once default, once
--exact_clustering semantics) with IDENTICAL forwards (one forward per
scene, masks recomputed from the same smoothed features), then reports the
Hungarian-matched mIoU between the two mask sets and both wall times.

Run on the TPU host:
    python benchmarks/compare_exact_clustering.py \
        [--scenes_root /root/reference/iggt_demo] [--max_scenes N]
Writes benchmarks/exact_clustering_deltas.json.
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
    parser = argparse.ArgumentParser()
    parser.add_argument("--scenes_root",
                        default="/root/reference/iggt_demo")
    parser.add_argument("--max_scenes", type=int, default=None)
    parser.add_argument("--only", default=None,
                        help="comma-separated scene basenames to run")
    parser.add_argument("--model_path", default=None)
    parser.add_argument(
        "--exact_cache", default=None,
        help="directory of <scene>_exact.npy files (the subsample-policy "
        "lab's cache) to reuse instead of recomputing the exact run; "
        "valid because both pipelines share the deterministic random-"
        "weight forward + smoothing (same seed)")
    args = parser.parse_args()

    import jax.numpy as jnp

    from iggt_official_tpu.app.demo import IGGTProcessor
    from iggt_official_tpu.ops.cluster import cluster_features_to_masks_mv
    from iggt_official_tpu.ops.knn import knn_smooth_features

    proc = IGGTProcessor(args.model_path)
    cc = proc.runtime.clustering

    scene_dirs = sorted(
        d for d in glob.glob(os.path.join(args.scenes_root, "*"))
        if os.path.isdir(os.path.join(d, "images"))
    )
    if args.only:
        keep = set(args.only.split(","))
        scene_dirs = [d for d in scene_dirs
                      if os.path.basename(d.rstrip(os.sep)) in keep]
    if args.max_scenes:
        scene_dirs = scene_dirs[: args.max_scenes]

    per_scene = {}
    for scene in scene_dirs:
        name = os.path.basename(scene.rstrip(os.sep))
        try:
            preds = proc._run_inference(scene)
            feat = jnp.asarray(preds["part_feat"][0])
            feat = feat / jnp.maximum(
                jnp.linalg.norm(feat, axis=-1, keepdims=True), 1e-12
            )
            # one smoothing, two clusterings — isolates the clustering
            # policy
            smoothed = knn_smooth_features(
                jnp.asarray(preds["world_points"][0]), feat, k=cc.knn_k
            )

            def run_default():
                return cluster_features_to_masks_mv(
                    smoothed, apply_colormap=False, eps=cc.eps,
                    min_samples=cc.min_samples,
                    min_cluster_size=cc.min_cluster_size, exact=False,
                )

            run_default()  # warmup: first call pays remote Mosaic compiles
            t0 = time.perf_counter()
            m_def = run_default()
            t_def = time.perf_counter() - t0
            cache_hit = (
                op.join(args.exact_cache, f"{name}_exact.npy")
                if args.exact_cache else None
            )
            if cache_hit and op.exists(cache_hit):
                m_ex = np.load(cache_hit).reshape(np.asarray(m_def).shape)
                t_ex = None
            else:
                t0 = time.perf_counter()
                m_ex = cluster_features_to_masks_mv(
                    np.asarray(smoothed), apply_colormap=False, eps=cc.eps,
                    min_samples=cc.min_samples,
                    min_cluster_size=cc.min_cluster_size, exact=True,
                )
                t_ex = round(time.perf_counter() - t0, 2)
            per_scene[name] = {
                "n_px": int(np.prod(m_def.shape)),
                "clusters_default": int(len(np.unique(m_def[m_def >= 0]))),
                "clusters_exact": int(len(np.unique(m_ex[m_ex >= 0]))),
                "matched_miou": matched_miou(m_ex, m_def),
                "t_default_warm_s": round(t_def, 2),
                "t_exact_s": t_ex,
            }
        except Exception as e:  # record, keep measuring the other scenes
            import traceback

            traceback.print_exc()
            per_scene[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(name, per_scene[name], flush=True)

    path = op.join(op.dirname(op.abspath(__file__)),
                   "exact_clustering_deltas.json")
    if op.exists(path):  # merge partial runs (per-scene --only reruns)
        with open(path) as f:
            merged = json.load(f).get("per_scene", {})
        merged.update(per_scene)
        per_scene = merged
    mious = [v["matched_miou"] for v in per_scene.values()
             if "matched_miou" in v]
    out = {
        "weights": args.model_path or "random",
        "preset": "large",
        "per_scene": per_scene,
        "mean_matched_miou": round(float(np.mean(mious)), 4),
        "min_matched_miou": round(float(np.min(mious)), 4),
    }
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "per_scene"}))


if __name__ == "__main__":
    main()
