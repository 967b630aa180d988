"""Batch scene evaluation: run the full pipeline over many scene dirs.

Covers BASELINE.json configs 1-2: every scene under --scenes_root (e.g. the
reference's `iggt_demo/demo1..9`) goes through inference + clustering/KNN/
PCA post-processing + export; per-scene evaluation reports (when GT exists)
are aggregated into `summary.json` with mean depth/pose metrics and
throughput (views/sec including post-processing).

Usage:
    python -m iggt_official_tpu.app.batch_eval \
        --scenes_root /root/reference/iggt_demo --save_dir out [...]
"""

from __future__ import annotations

import argparse
import glob
import json
import logging
import os
import time
from typing import Any, Dict, List

import numpy as np

logger = logging.getLogger(__name__)


def aggregate_summaries(summaries: List[Dict[str, Any]]) -> Dict[str, Any]:
    agg: Dict[str, Any] = {}
    depth_keys = ["absrel", "inliers103", "mae", "rmse", "delta_1"]
    pose_keys = ["translation_error", "rotation_error"]
    depth_vals = {k: [] for k in depth_keys}
    pose_vals = {k: [] for k in pose_keys}
    for s in summaries:
        for k in depth_keys:
            v = s.get("depth", {}).get(k)
            if v is not None and np.isfinite(v):
                depth_vals[k].append(v)
        for k in pose_keys:
            v = s.get("pose", {}).get(k)
            if v is not None and np.isfinite(v):
                pose_vals[k].append(v)
    agg["depth"] = {k: float(np.mean(v)) for k, v in depth_vals.items() if v}
    agg["pose"] = {k: float(np.mean(v)) for k, v in pose_vals.items() if v}
    return agg


def main() -> None:
    from iggt_official_tpu.app.demo import CLUSTERING_PRESETS, IGGTProcessor
    from iggt_official_tpu.config import RuntimeConfig

    parser = argparse.ArgumentParser(description="IGGT TPU batch evaluation")
    parser.add_argument("--scenes_root", required=True,
                        help="directory of scene dirs (each with images/)")
    parser.add_argument("--save_dir", required=True)
    parser.add_argument("--model_path", default=None)
    parser.add_argument("--preset", default="large",
                        choices=list(CLUSTERING_PRESETS))
    parser.add_argument("--image_size", type=int, nargs=2, default=(504, 336),
                        metavar=("W", "H"))
    parser.add_argument("--exact_clustering", action="store_true",
                        help="full-density HDBSCAN (the reference algorithm "
                             "verbatim; slow — for fidelity evaluation runs)")
    parser.add_argument("--ckpt", default=None,
                        help="torch .pth checkpoint (alias of --model_path; "
                             "converted via utils/torch_convert)")
    parser.add_argument("--gate", action="store_true",
                        help="BASELINE acceptance gate: compare every scene "
                             "against --golden_root/<scene>/predictions.npz "
                             "(the reference demo's saved outputs, "
                             "demo.py:611-615); exit 1 if any scene is "
                             "outside the 1%% window")
    parser.add_argument("--golden_root", default=None,
                        help="directory of the reference run's per-scene "
                             "output dirs (required with --gate)")
    args = parser.parse_args()
    if args.ckpt:
        args.model_path = args.ckpt
    if args.gate and not args.golden_root:
        parser.error("--gate requires --golden_root")

    logging.basicConfig(level=logging.INFO)
    import dataclasses

    runtime = RuntimeConfig(
        image_size=tuple(args.image_size),
        clustering=dataclasses.replace(
            CLUSTERING_PRESETS[args.preset], exact=args.exact_clustering
        ),
    )
    processor = IGGTProcessor(args.model_path, runtime=runtime)

    scene_dirs = sorted(
        d for d in glob.glob(os.path.join(args.scenes_root, "*"))
        if os.path.isdir(os.path.join(d, "images"))
    )
    if not scene_dirs:
        raise FileNotFoundError(f"no scenes with images/ under {args.scenes_root}")

    summaries: List[Dict] = []
    gate_preds: Dict[str, Dict[str, np.ndarray]] = {}
    total_views = 0
    t0 = time.time()
    # software pipeline: scene i+1's GT load + device forward run on a
    # worker thread while scene i post-processes (device clustering) and
    # exports (host IO) — device work interleaves on the accelerator
    # queue, host work overlaps fully (the reference runs scenes strictly
    # serially, `demo.py:660-691`)
    from concurrent.futures import ThreadPoolExecutor

    def fetch(scene):
        return processor._load_gt_data(scene), processor._run_inference(scene)

    with ThreadPoolExecutor(max_workers=1) as ex:
        fut = ex.submit(fetch, scene_dirs[0])
        for i, scene in enumerate(scene_dirs):
            name = os.path.basename(scene.rstrip(os.sep))
            logger.info("processing scene %s", name)
            gt_data, preds = fut.result()
            if i + 1 < len(scene_dirs):
                fut = ex.submit(fetch, scene_dirs[i + 1])
            out_dir = os.path.join(args.save_dir, name)
            results = processor.process_scene(
                scene, out_dir, preds=preds, gt_data=gt_data
            )
            total_views += results["predictions"]["depth"].shape[0]
            if args.gate:
                gate_preds[name] = results["predictions"]
            if "evaluation" in results:
                summaries.append(results["evaluation"]["summary"])
    elapsed = time.time() - t0

    summary = {
        "num_scenes": len(scene_dirs),
        "num_views": total_views,
        "total_seconds": elapsed,
        "views_per_sec_end_to_end": total_views / elapsed,
        "metrics": aggregate_summaries(summaries),
    }
    os.makedirs(args.save_dir, exist_ok=True)
    with open(os.path.join(args.save_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))

    if args.gate:
        from iggt_official_tpu.eval.gate import run_gate

        table, ok = run_gate(
            gate_preds, args.golden_root,
            save_path=os.path.join(args.save_dir, "gate.json"),
        )
        print(table)
        if not ok:
            raise SystemExit(1)


if __name__ == "__main__":
    main()
