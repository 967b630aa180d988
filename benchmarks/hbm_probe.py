"""Stage-by-stage HBM accounting for the scene pipeline (debug tool).

Usage: python benchmarks/hbm_probe.py [scene_dir]
Prints bytes_in_use / peak after each stage of the demo post-process on
the target scene — used to localize the 10-view device-clustering OOM.
"""

from __future__ import annotations

import os
import os.path as op
import sys

import numpy as np

sys.path.insert(0, op.join(op.dirname(op.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def mem(tag):
    import jax

    try:
        s = jax.devices()[0].memory_stats()
        print(
            f"[{tag:28s}] in_use={s.get('bytes_in_use', 0)/2**30:6.2f} GiB "
            f"peak={s.get('peak_bytes_in_use', 0)/2**30:6.2f} GiB "
            f"limit={s.get('bytes_limit', 0)/2**30:6.2f} GiB",
            flush=True,
        )
    except Exception as e:
        print(f"[{tag}] memory_stats unavailable: {e}", flush=True)


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/iggt_demo/demo6"
    import jax
    import jax.numpy as jnp

    from iggt_official_tpu.app.demo import IGGTProcessor
    from iggt_official_tpu.ops.cluster import cluster_features_to_masks_mv
    from iggt_official_tpu.ops.knn import knn_smooth_features

    mem("startup")
    proc = IGGTProcessor()
    mem("params resident")
    preds = proc._run_inference(scene)
    jax.block_until_ready(preds["part_feat"])
    np.asarray(preds["depth"][..., :1, :1, :])
    mem("after forward")

    feat = jnp.asarray(preds["part_feat"][0])
    feat = feat / jnp.maximum(
        jnp.linalg.norm(feat, axis=-1, keepdims=True), 1e-12
    )
    wp = jnp.asarray(preds["world_points"][0])
    cc = proc.runtime.clustering
    smoothed = knn_smooth_features(wp, feat, k=cc.knn_k)
    jax.block_until_ready(smoothed)
    mem("after smoothing")

    masks = cluster_features_to_masks_mv(
        smoothed, apply_colormap=False, eps=cc.eps,
        min_samples=cc.min_samples, min_cluster_size=cc.min_cluster_size,
    )
    mem("after clustering")
    print("clusters:", len(np.unique(masks[masks >= 0])))


if __name__ == "__main__":
    main()
