"""Fast-mode accuracy deltas vs the fp32-island parity mode (PERF.md).

Regenerates the artifact VERDICT r2 item 10 asked to check in
(benchmarks/fastmode_deltas.json): on the demo1 scene, run the forward in
parity numerics (fp32 weight storage, fp32 islands) and in each fast mode,
then report depth AbsRel delta, pose max-abs diff, and Hungarian-matched
mask mIoU vs the parity masks.

Weights are random unless --model_path is given, which makes the mask
deltas *numeric perturbation* measurements of the same computation graph
(pessimistic for trained features, whose margins are larger) — re-validate
with trained weights when available.

Run on the TPU host:  python benchmarks/measure_fastmode.py
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as op
import sys

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


def run_mode(model_path, scene, bf16_storage=False, head_dtype=None,
             merge_r=0):
    import jax
    import jax.numpy as jnp

    from iggt_official_tpu.app.demo import IGGTProcessor
    from iggt_official_tpu.config import ModelConfig, RuntimeConfig
    import dataclasses

    cfg = ModelConfig()
    if head_dtype:
        cfg = dataclasses.replace(cfg, head_dtype=head_dtype)
    runtime = RuntimeConfig(global_merge_r=merge_r)
    proc = IGGTProcessor(model_path, model_cfg=cfg, runtime=runtime)
    if bf16_storage:
        proc.params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a,
            proc.params,
        )
    preds = proc._post_process(proc._run_inference(scene))
    return {
        "depth": preds["depth"][..., 0],
        "pose_enc": preds["pose_enc"],
        "masks": preds["instance_masks"],
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", default=None)
    parser.add_argument("--scene", default="/root/reference/iggt_demo/demo1")
    args = parser.parse_args()

    parity = run_mode(args.model_path, args.scene)

    def deltas(fast):
        d0, d1 = parity["depth"], fast["depth"]
        absrel_delta = float(
            np.mean(np.abs(d1 - d0) / np.abs(d0).clip(1e-6))
        )
        pose_max = float(np.max(np.abs(
            fast["pose_enc"] - parity["pose_enc"]
        )))
        return {
            "depth_absrel_delta": round(absrel_delta, 5),
            "pose_max_diff": round(pose_max, 4),
            "mask_miou_vs_parity": round(
                matched_miou(parity["masks"], fast["masks"]), 4
            ),
        }

    out = {
        "scene": args.scene,
        "weights": args.model_path or "random",
        "bf16_storage": deltas(
            run_mode(args.model_path, args.scene, bf16_storage=True)
        ),
        "head_dtype_bf16": deltas(
            run_mode(args.model_path, args.scene, head_dtype="bfloat16")
        ),
        "global_merge_r64": deltas(
            run_mode(args.model_path, args.scene, merge_r=64)
        ),
    }
    path = op.join(op.dirname(op.abspath(__file__)), "fastmode_deltas.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
