"""Benchmark: flagship IGGT forward throughput on the local accelerator.

Measures views/sec for the BASELINE.json operating point — an 8-view scene
at 518 px, bf16 trunk + fp32 heads, full ViT-L/14 model — and prints ONE
JSON line:  {"metric", "value", "unit", "vs_baseline", "extra"}.

``extra.p50_scene_latency_s`` is the second BASELINE.json metric: median
end-to-end scene time (image load -> forward -> pose decode/unprojection ->
KNN smoothing -> clustering) over repeated runs of the demo1 scene at the
reference demo operating point (504x336), via the real app pipeline
(`app/demo.py` IGGTProcessor, random weights — latency is weight-agnostic
except for clustering, which is bounded by the subsample budget).

The reference repo publishes no numbers (BASELINE.md), so ``vs_baseline``
is measured against a locally recorded anchor — the round-1 first working
build (BENCH_ANCHOR.json, 8.09 views/s on this chip), NOT the reference
GPU: the first run writes the anchor and reports 1.0; later runs report
the ratio to it, tracking progress across rounds.

``--views N`` switches to the long-sequence operating point (BASELINE
configs[4], 32-64-view InsScene-15K-style reconstruction at 504x336) and
reports views/s at that length instead; the default (no args) is the
driver-visible 8-view @ 518 px number.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# persist compiled executables across runs (first whole-model compile of the
# session is minutes; cached reruns are seconds)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

ANCHOR_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_ANCHOR.json")


def _wait_for_accelerator(max_wait_s: float = 900.0) -> None:
    """A killed-mid-compile process wedges the remote-TPU tunnel for
    ~10-20 min; probe it in fresh subprocesses (backend init failure is
    cached per process) until it answers, so a bench launched during the
    wedge recovers instead of dying at jax.devices()."""
    import subprocess
    import sys

    probe = (
        "import jax, numpy as np;"
        "print(int(np.asarray(jax.numpy.ones((8, 128))).sum()))"
    )
    t0 = time.time()
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe],
                capture_output=True, timeout=120, text=True,
            )
            if r.returncode == 0 and "1024" in r.stdout:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() - t0 > max_wait_s:
            return  # let the real run surface the error
        time.sleep(30)


def main() -> None:
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--views", type=int, default=None,
                        help="long-sequence mode: views/s at N views, 504x336")
    parser.add_argument("--runs", type=int, default=5)
    args = parser.parse_args()

    _wait_for_accelerator()

    import jax
    import jax.numpy as jnp

    # the env var alone is too late on this image: sitecustomize imports
    # jax (to register the axon plugin) before this script runs, so the
    # config key must be set in-process
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from iggt_official_tpu.config import ModelConfig
    from iggt_official_tpu.models.vggt import IGGT

    if args.views:
        # BASELINE configs[4] long-sequence operating point (demo res)
        B, S, W, H = 1, args.views, 504, 336
    else:
        B, S, H, W = 1, 8, 518, 518
    cfg = ModelConfig()
    model = IGGT(cfg)

    rng = np.random.default_rng(0)
    images = jax.device_put(
        jnp.asarray(rng.uniform(0, 1, (B, S, H, W, 3)).astype(np.float32))
    )
    # init on a small stack (params are input-size independent) so the
    # init-time forward fits HBM alongside the fp32 master weights
    init_images = jnp.asarray(
        rng.uniform(0, 1, (1, 2, 126, 126, 3)).astype(np.float32)
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), init_images)
    # store weights bf16 for the throughput bench (halves HBM; fp32 islands
    # upcast at compute time)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )

    from iggt_official_tpu.ops.flash_attention import attention

    # fused_ln stays OFF: the Pallas fused LayerNorm measured a repeatable
    # -1.2% end-to-end here (11.09 vs 11.22 views/s — it un-fuses the LN
    # chain from XLA's neighbouring epilogues; PERF.md "fused LayerNorm")
    fwd = jax.jit(lambda p, x: model.apply(p, x, attn_fn=attention))

    def sync(o):
        # NB: jax.block_until_ready returns without waiting through the
        # remote-TPU tunnel; a small host fetch drains the dispatch queue
        return np.asarray(o["depth"][:, :, :2, :2, 0])

    # warmup (compile + 1 steady-state run)
    sync(fwd(params, images))
    sync(fwd(params, images))

    runs = args.runs
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fwd(params, images)
    sync(out)
    dt = time.perf_counter() - t0
    views_per_sec = B * S * runs / dt

    if args.views:
        # long-sequence mode: report and exit (no anchor / p50 — those
        # belong to the driver-visible 8-view operating point)
        peak = None
        try:
            ms = jax.devices()[0].memory_stats()
            peak = round(ms.get("peak_bytes_in_use", 0) / 2**30, 2)
        except Exception:
            pass  # memory_stats returns None through the axon tunnel
        hbm = {}
        try:
            # compile-time accounting works even when runtime stats don't
            ma = fwd.lower(params, images).compile().memory_analysis()
            hbm = {
                "xla_temp_gib": round(ma.temp_size_in_bytes / 2**30, 2),
                "xla_args_gib": round(
                    ma.argument_size_in_bytes / 2**30, 2),
                "xla_out_gib": round(ma.output_size_in_bytes / 2**30, 2),
            }
        except Exception:
            pass
        print(json.dumps({
            "metric": f"views_per_sec_{S}view_504x336",
            "value": round(views_per_sec, 4),
            "unit": "views/s",
            "vs_baseline": None,
            "extra": {"peak_hbm_gib": peak, **hbm},
        }))
        return

    if os.path.exists(ANCHOR_PATH):
        with open(ANCHOR_PATH) as f:
            anchor = json.load(f)["views_per_sec"]
    else:
        anchor = views_per_sec
        with open(ANCHOR_PATH, "w") as f:
            json.dump(
                {
                    "views_per_sec": anchor,
                    "config": "IGGT ViT-L/14, 8 views @ 518px, bf16 trunk",
                    "device": str(jax.devices()[0]),
                },
                f,
            )

    # free the throughput run's buffers before the 10-view smoke (images,
    # activations); params are re-created inside the smoke's processor
    del images, out
    smoke = postproc_scale_smoke()

    p50 = scene_latency_p50()

    print(
        json.dumps(
            {
                "metric": "views_per_sec_8view_518px",
                "value": round(views_per_sec, 4),
                "unit": "views/s",
                "vs_baseline": round(views_per_sec / anchor, 4),
                "extra": {"p50_scene_latency_s": p50, **smoke},
            }
        )
    )


def postproc_scale_smoke(views: int = 10, h: int = 336, w: int = 504):
    """Compile + run the demo post-processing hot ops at 10-view scale
    (M=1.69M px, the demo6 regime) with synthetic data.

    Round 3 shipped a knn_smooth_features rewrite whose compile-time
    tile-padding blowup was invisible to the 3-view p50 until the driver
    ran it; this guard (a) asserts the smoothing executable's XLA temp
    budget at scale and (b) actually executes smoothing + clustering once,
    so any scale regression turns the whole bench red instead of hiding.
    """
    import jax
    import jax.numpy as jnp

    from iggt_official_tpu.ops.cluster import cluster_features_to_masks_mv
    from iggt_official_tpu.ops.knn import knn_smooth_features

    rng = np.random.default_rng(1)
    # a handful of feature blobs + spatially coherent points: enough
    # structure that clustering exercises its full pipeline (subsample,
    # HDBSCAN, 1-NN backfill) rather than degenerating to all-noise
    centers = rng.uniform(-1, 1, (6, 8)).astype(np.float32)
    blob = rng.integers(0, 6, views * h * w)
    fts_np = (centers[blob] + rng.normal(0, 0.05, (views * h * w, 8))
              ).astype(np.float32).reshape(views, h, w, 8)
    pts_np = (rng.normal(0, 1, (views, h, w, 3)).astype(np.float32)
              + blob.reshape(views, h, w, 1).astype(np.float32))

    pts = jax.device_put(jnp.asarray(pts_np))
    fts = jax.device_put(jnp.asarray(fts_np))

    # (a) compile-memory guard: the r03 failure mode was ~5 GiB of padded
    # s32 temps at COMPILE time; a healthy build measures ~1.5 GiB here
    temp_gib = None
    try:
        ma = (knn_smooth_features.lower(pts, fts, k=20)
              .compile().memory_analysis())
        temp_gib = ma.temp_size_in_bytes / 2**30
    except Exception:
        pass  # memory_analysis unsupported on some backends — run anyway
    if temp_gib is not None and temp_gib > 6.0:
        raise RuntimeError(
            f"knn_smooth_features temp budget blown at 10-view scale: "
            f"{temp_gib:.2f} GiB XLA temps (budget 6.0). Check for "
            f"lane-padded (1, M) intermediates (see round-3 postmortem)."
        )

    # (b) execute once at scale
    t0 = time.perf_counter()
    smoothed = knn_smooth_features(pts, fts, k=20)
    np.asarray(smoothed[..., :1, :1, :])  # drain through the tunnel
    t_smooth = time.perf_counter() - t0

    t0 = time.perf_counter()
    masks = cluster_features_to_masks_mv(smoothed, apply_colormap=False)
    masks = np.asarray(masks)
    t_cluster = time.perf_counter() - t0
    if masks.shape != (views, h, w):
        raise RuntimeError(f"clustering smoke bad shape {masks.shape}")

    return {
        "smoke10_smooth_s": round(t_smooth, 3),
        "smoke10_cluster_s": round(t_cluster, 3),
        "smoke10_smooth_temp_gib": (
            round(temp_gib, 2) if temp_gib is not None else None),
    }


def scene_latency_p50(runs: int = 5):
    """Median end-to-end scene latency on the demo1 scene (s), or None if
    the scene images are unavailable."""
    scene = "/root/reference/iggt_demo/demo1"
    if not os.path.isdir(os.path.join(scene, "images")):
        return None
    import statistics

    from iggt_official_tpu.app.demo import IGGTProcessor

    proc = IGGTProcessor()  # random weights; latency is weight-agnostic

    def one_scene():
        preds = proc._post_process(proc._run_inference(scene))
        # predictions are device-resident; drain the remaining async work
        # (instance_masks already synced — the cluster labels come back to
        # the host — but the unprojection/PCA outputs may still be in
        # flight, and block_until_ready returns early through the tunnel)
        for k in ("world_points_from_depth", "part_feat_pca"):
            np.asarray(preds[k][..., :1, :1, :])
        return preds

    # warmup compiles the scene-shaped forward + postproc kernels
    one_scene()
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        one_scene()
        times.append(time.perf_counter() - t0)
    return round(statistics.median(times), 3)


if __name__ == "__main__":
    main()
