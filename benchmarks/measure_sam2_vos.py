"""SAM2 VOS propagation FPS + peak HBM per hiera size preset.

VERDICT r3 task 9: the Hiera-L preset exists (`sam2/config.py`) and the
BASELINE configs name SAM2-Hiera-L grounding explicitly, but only the
B+ operating point was measured (16 FPS at 512 px, tunnel-bound).  This
bench builds the requested preset with random weights (propagation
latency is weight-agnostic), uploads a synthetic 512 px video once, adds
one point prompt, and measures:

  - streaming FPS via `propagate_in_video` (per-frame sync — the
    interactive operating point, comparable across rounds), and
  - batch FPS via `propagate_in_video_batch` (whole video in one
    lax.scan dispatch — the offline operating point), and
  - device peak HBM from `memory_stats()` when the backend exposes it.

Usage: python benchmarks/measure_sam2_vos.py --size hiera_l --frames 25
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as op
import sys
import time

import numpy as np

sys.path.insert(0, op.join(op.dirname(op.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="hiera_l")
    ap.add_argument("--frames", type=int, default=25)
    ap.add_argument("--image_size", type=int, default=None)
    args = ap.parse_args()

    import jax

    from iggt_official_tpu.sam2.build import build_sam2
    from iggt_official_tpu.sam2.config import SAM2_PRESETS
    from iggt_official_tpu.sam2.video_predictor import SAM2VideoPredictor

    cfg = SAM2_PRESETS[args.size]()
    if args.image_size:
        import dataclasses

        cfg = dataclasses.replace(cfg, image_size=args.image_size)
    print(f"building {args.size} at {cfg.image_size}px ...", flush=True)
    t0 = time.perf_counter()
    model, variables = build_sam2(cfg)
    print(f"built in {time.perf_counter()-t0:.1f}s", flush=True)

    dev = jax.local_devices()[0]

    def hbm_gib():
        stats = getattr(dev, "memory_stats", lambda: None)()
        if not stats:
            return None
        key = ("peak_bytes_in_use" if "peak_bytes_in_use" in stats
               else "bytes_in_use")
        return round(stats[key] / 2**30, 2)

    rng = np.random.default_rng(0)
    frames = [
        rng.integers(0, 255, (cfg.image_size, cfg.image_size, 3),
                     dtype=np.uint8)
        for _ in range(args.frames)
    ]

    pred = SAM2VideoPredictor(model, variables)
    state = pred.init_state(frames)
    pred.add_new_points_or_box(
        state, frame_idx=0, obj_id=1,
        points=np.array([[cfg.image_size / 2, cfg.image_size / 2]]),
        labels=np.array([1]),
    )

    # warm-up pass compiles every propagate shape
    t0 = time.perf_counter()
    for _ in pred.propagate_in_video(state):
        pass
    print(f"warm-up propagate (compiles): {time.perf_counter()-t0:.1f}s",
          flush=True)

    # timed streaming pass on a fresh non-cond store
    for obj in state["obj_ids"]:
        pred._obj_store(state, obj, "non_cond_frame_outputs").clear()
    t0 = time.perf_counter()
    n = 0
    for _fidx, _ids, masks in pred.propagate_in_video(state):
        np.asarray(masks[..., :1, :1])  # per-frame sync
        n += 1
    stream_dt = time.perf_counter() - t0
    stream_fps = n / stream_dt

    # batch (single lax.scan) pass
    batch_fps = None
    if hasattr(pred, "propagate_in_video_batch"):
        for obj in state["obj_ids"]:
            pred._obj_store(state, obj, "non_cond_frame_outputs").clear()
        outs = list(pred.propagate_in_video_batch(state))  # compile
        for obj in state["obj_ids"]:
            pred._obj_store(state, obj, "non_cond_frame_outputs").clear()
        t0 = time.perf_counter()
        outs = list(pred.propagate_in_video_batch(state))
        np.asarray(outs[-1][2][..., :1, :1])
        batch_fps = len(outs) / (time.perf_counter() - t0)

    row = {
        "size": args.size,
        "image_size": cfg.image_size,
        "frames": args.frames,
        "stream_fps": round(stream_fps, 2),
        "batch_fps": round(batch_fps, 2) if batch_fps else None,
        "peak_hbm_gib": hbm_gib(),
    }
    print(json.dumps(row))


if __name__ == "__main__":
    main()
