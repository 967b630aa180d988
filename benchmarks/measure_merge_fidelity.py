"""Token-merge (global_merge_r) fidelity at 6-10 views on real scenes.

VERDICT r4 #6: `global_merge_r` is the one +10%-class throughput lever
inside the accuracy window, but its fidelity evidence stopped at 3 views
(PERF.md fast-mode table: depth-safe, masks hold, feature drift grows
with view count).  This measures the drift where it matters — the
demo-scale 6-view (demo9) and 10-view (demo6) scenes — against the
unmerged forward with IDENTICAL weights (random; mask fidelity compares
merged-vs-unmerged pipelines, which isolates the merge exactly like the
exact-clustering harness isolates subsampling):

  - instance masks: Hungarian-matched mIoU merged vs unmerged;
  - depth: mean |rel| error vs unmerged;
  - part features: mean cosine similarity;
  - forward wall time per r (median of 3, warm).

Usage: python benchmarks/measure_merge_fidelity.py [--rs 1024,2048]
Writes benchmarks/merge_fidelity.json.
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rs", default="1024,2048")
    ap.add_argument("--scenes", default="demo9,demo6")
    args = ap.parse_args()
    rs = [int(x) for x in args.rs.split(",")]

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from iggt_official_tpu.app.demo import IGGTProcessor
    from iggt_official_tpu.config import RuntimeConfig
    from iggt_official_tpu.ops.cluster import cluster_features_to_masks_mv
    from iggt_official_tpu.ops.knn import knn_smooth_features

    out = {"scenes": {}}
    for scene in args.scenes.split(","):
        scene_dir = f"/root/reference/iggt_demo/{scene}"
        per_r = {}
        base = None
        for r in [0] + rs:
            proc = IGGTProcessor(runtime=RuntimeConfig(global_merge_r=r))
            preds = proc._run_inference(scene_dir)      # warm/compile
            t_runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                preds = proc._run_inference(scene_dir)
                np.asarray(preds["depth"][..., :1, :1, 0])
                t_runs.append(time.perf_counter() - t0)
            t_fwd = statistics.median(t_runs)

            feat = jnp.asarray(preds["part_feat"][0])
            feat = feat / jnp.maximum(
                jnp.linalg.norm(feat, axis=-1, keepdims=True), 1e-12)
            cc = proc.runtime.clustering
            smoothed = knn_smooth_features(
                jnp.asarray(preds["world_points"][0]), feat, k=cc.knn_k)
            masks = np.asarray(cluster_features_to_masks_mv(
                smoothed, apply_colormap=False, eps=cc.eps,
                min_samples=cc.min_samples,
                min_cluster_size=cc.min_cluster_size))
            depth = np.asarray(preds["depth"][0, ..., 0])
            feat_np = np.asarray(feat)

            if r == 0:
                base = (masks, depth, feat_np)
                per_r["0"] = {"t_forward_s": round(t_fwd, 3),
                              "clusters": int(len(np.unique(masks)))}
            else:
                m0, d0, f0 = base
                cos = float(np.mean(np.sum(feat_np * f0, axis=-1)))
                rel = float(np.mean(np.abs(depth - d0)
                                    / np.maximum(np.abs(d0), 1e-6)))
                per_r[str(r)] = {
                    "t_forward_s": round(t_fwd, 3),
                    "speedup_vs_r0": round(
                        per_r["0"]["t_forward_s"] / t_fwd, 3),
                    "clusters": int(len(np.unique(masks))),
                    "mask_miou_vs_r0": round(
                        matched_miou(m0.reshape(-1), masks.reshape(-1)), 4),
                    "depth_mean_rel_err": round(rel, 5),
                    "feat_mean_cos": round(cos, 4),
                }
            print(scene, "r=", r, per_r[str(r)], flush=True)
        out["scenes"][scene] = per_r

    out["note"] = ("random weights; fidelity is merged-vs-unmerged with "
                   "identical weights/seeds, isolating the merge. Forward "
                   "times include the host image pipeline (same for all "
                   "r), so speedups are end-to-end, not kernel-only.")
    with open(op.join(op.dirname(op.abspath(__file__)),
                      "merge_fidelity.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
