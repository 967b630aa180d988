"""SAM2 video-propagation throughput benchmark.

Behavioural parity: `sam2/benchmark.py:43-86` — warmup then timed
propagation over a frame stack, reporting total time and FPS.  Frames are
synthetic unless a directory of images is given.

Usage: python -m iggt_official_tpu.sam2.benchmark [--frames N] [--size S]
"""

from __future__ import annotations

import argparse
import glob
import time
from typing import List, Optional

import numpy as np


def load_frames(
    video_dir: Optional[str], num_frames: int, size: int
) -> List[np.ndarray]:
    if video_dir:
        paths = sorted(glob.glob(f"{video_dir}/*"))[:num_frames]
        from PIL import Image

        return [np.asarray(Image.open(p).convert("RGB")) for p in paths]
    rng = np.random.default_rng(0)
    return [
        rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        for _ in range(num_frames)
    ]


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--video_dir", default=None)
    parser.add_argument("--frames", type=int, default=25)
    parser.add_argument("--size", type=int, default=512)
    parser.add_argument("--image_size", type=int, default=512,
                        help="model resolution (1024 = full SAM2)")
    parser.add_argument("--tiny", action="store_true",
                        help="use the tiny test config")
    parser.add_argument("--preset", default="l",
                        choices=["t", "s", "b+", "l"],
                        help="hiera size preset (sam2.1 generation)")
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument(
        "--streaming", action="store_true",
        help="per-frame streaming loop instead of the whole-video scan",
    )
    args = parser.parse_args()

    from iggt_official_tpu.sam2.build import build_sam2_video_predictor
    from iggt_official_tpu.sam2.config import (
        SAM2Config,
        sam2_hiera_b_plus,
        sam2_hiera_l,
        sam2_hiera_s,
        sam2_hiera_t,
    )

    cfg = {
        "t": sam2_hiera_t, "s": sam2_hiera_s,
        "b+": sam2_hiera_b_plus, "l": sam2_hiera_l,
    }[args.preset]()
    if args.tiny:
        cfg = cfg.scaled(image_size=args.image_size)
    else:
        import dataclasses

        cfg = dataclasses.replace(cfg, image_size=args.image_size)
    predictor = build_sam2_video_predictor(cfg)

    frames = load_frames(args.video_dir, args.frames, args.size)
    state = predictor.init_state(frames)
    predictor.add_new_points_or_box(
        state, frame_idx=0, obj_id=1,
        points=np.array([[frames[0].shape[1] / 2, frames[0].shape[0] / 2]]),
        labels=np.array([1]),
    )

    propagate = (
        predictor.propagate_in_video
        if args.streaming
        else predictor.propagate_in_video_batch
    )

    # warmup (compiles the per-frame / whole-video programs)
    for i, _ in enumerate(propagate(state)):
        if args.streaming and i >= args.warmup:
            break

    predictor.reset_state(state)
    predictor.add_new_points_or_box(
        state, frame_idx=0, obj_id=1,
        points=np.array([[frames[0].shape[1] / 2, frames[0].shape[0] / 2]]),
        labels=np.array([1]),
    )
    t0 = time.perf_counter()
    count = 0
    for _, _, masks in propagate(state):
        # force this frame's compute to finish (small host fetch rather
        # than the full mask: measures stream latency, not the tunnel's
        # transfer bandwidth)
        np.asarray(masks[..., ::64, ::64])
        count += 1
    dt = time.perf_counter() - t0
    print(f"Total Time: {dt:.2f}s over {count} frames")
    print(f"FPS: {count / dt:.2f}")


if __name__ == "__main__":
    main()
