"""Per-stage breakdown of the bench.py p50 scene-latency path (demo1).

Times each stage of IGGTProcessor._run_inference + _post_process with a
device sync (small host fetch — block_until_ready returns early through
the remote-TPU tunnel) after every stage, so the per-stage walls add up to
the end-to-end p50 the driver sees.  Run with the chip otherwise idle.

Usage:  python benchmarks/measure_p50_breakdown.py [--runs 3]
"""

from __future__ import annotations

import argparse
import os
import os.path as op
import sys
import time

import numpy as np

sys.path.insert(0, op.join(op.dirname(op.abspath(__file__)), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

SCENE = "/root/reference/iggt_demo/demo1"


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--runs", type=int, default=3)
    parser.add_argument("--scene", default=SCENE)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from iggt_official_tpu.app.demo import IGGTProcessor
    from iggt_official_tpu.geometry import (
        pose_encoding_to_extri_intri,
        unproject_depth_map_to_point_map,
    )
    from iggt_official_tpu.ops.cluster import cluster_features_to_masks_mv
    from iggt_official_tpu.ops.knn import knn_smooth_features
    from iggt_official_tpu.ops.pca import apply_pca_colormap
    from iggt_official_tpu.utils.images import load_and_preprocess_images

    proc = IGGTProcessor()

    def sync(x):
        # slice ON DEVICE before fetching: np.asarray on the full leaf
        # would download it through the ~35 MB/s tunnel and inflate the
        # stage wall by the transfer time
        leaf = jax.tree.leaves(x)[0]
        return np.asarray(leaf.ravel()[:1])

    import glob as _glob

    image_paths = sorted(_glob.glob(os.path.join(args.scene, "images", "*")))
    W, H = proc.runtime.image_size

    def one_scene(record):
        t = time.perf_counter()

        def lap(name):
            nonlocal t
            now = time.perf_counter()
            record.setdefault(name, []).append(now - t)
            t = now

        images = load_and_preprocess_images(
            image_paths, mode="resize", resize_target_size=(W, H)
        )
        lap("image_load")
        out = proc._forward(proc.params, jnp.asarray(images[None]))
        sync(out["depth"])
        lap("forward")
        S, Hh, Ww = images.shape[:3]
        extri, intri = pose_encoding_to_extri_intri(
            jnp.asarray(out["pose_enc"]), (Hh, Ww)
        )
        wpfd = unproject_depth_map_to_point_map(
            out["depth"][0], extri[0], intri[0]
        )
        sync(wpfd)
        lap("pose+unproject")
        feat = out["part_feat"][0]
        feat = feat / jnp.maximum(
            jnp.linalg.norm(feat, axis=-1, keepdims=True), 1e-12
        )
        pca = apply_pca_colormap(feat)
        sync(pca)
        lap("pca")
        smoothed = knn_smooth_features(
            out["world_points"][0], feat, k=proc.runtime.clustering.knn_k
        )
        sync(smoothed)
        lap("knn_smooth")
        cc = proc.runtime.clustering
        masks, colored = cluster_features_to_masks_mv(
            smoothed, apply_colormap=True, eps=cc.eps,
            min_samples=cc.min_samples, min_cluster_size=cc.min_cluster_size,
        )
        lap("cluster")
        # the final bulk fetch bench.py's one_scene pays (two corner slices)
        np.asarray(wpfd[..., :1, :1, :])
        np.asarray(pca[..., :1, :1, :])
        lap("final_drain")

    warm: dict = {}
    one_scene(warm)  # compile
    record: dict = {}
    for _ in range(args.runs):
        one_scene(record)
    total = 0.0
    for name, vals in record.items():
        med = sorted(vals)[len(vals) // 2]
        total += med
        print(f"{name:>14}: {med:7.3f} s   (runs: "
              + " ".join(f"{v:.3f}" for v in vals) + ")")
    print(f"{'TOTAL':>14}: {total:7.3f} s")


if __name__ == "__main__":
    main()
