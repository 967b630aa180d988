"""Benchmark: flagship IGGT forward throughput on the local accelerator.

Measures views/sec for the BASELINE.json operating point — an 8-view scene
at 518 px, bf16 trunk + fp32 heads, full ViT-L/14 model — and prints the
JSON line  {"metric", "value", "unit", "vs_baseline", "extra"}.

Un-losable by design (round-4 postmortem: the driver timed out inside the
post-processing smoke and the already-measured views/s evaporated):

- the headline line is printed (flushed) THE MOMENT the throughput loop
  finishes, before any auxiliary measurement runs;
- the auxiliary stages — ``scene_latency_p50`` (median end-to-end demo1
  scene time through the real app pipeline) and ``postproc_scale_smoke``
  (10-view post-processing guard) — each run in their OWN SUBPROCESS under
  a hard timeout, so a wedged remote compile kills the stage, not the
  bench;
- a final enriched line re-prints the same headline value with whatever
  extras completed; stages that timed out appear as ``"<stage>":
  "timeout"`` with ``"degraded": true``.  Exit code is 0 once the headline
  exists.

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
import signal
import subprocess
import sys
import tempfile
import time

import numpy as np

# persist compiled executables across runs (first whole-model compile of the
# session is minutes; cached reruns are seconds)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

ANCHOR_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_ANCHOR.json")

# subprocess budgets for the auxiliary stages (seconds).  Warm-cache runs
# finish in well under a minute each; the budgets only bite when a novel
# shape hits the minutes-slow remote compile service, which is exactly the
# failure the headline must survive.
P50_TIMEOUT_S = 480
SMOKE_TIMEOUT_S = 420
STAGES = (("p50", P50_TIMEOUT_S), ("smoke", SMOKE_TIMEOUT_S))

# soft total wall budget for the whole bench, measured from process start
# (seconds).  A failed stage is retried once ONLY if the retry (plus the
# reserves of anything still queued) fits inside this budget, so the
# worst LEGAL bench stays within the 1900 s the preflight gate models
# (benchmarks/driver_sim.py --budget).  Rationale: the observed failure
# mode is a TRANSIENT — a tunnel outage wipes the remote compile
# service's Mosaic cache, one stage's Pallas re-compiles blow its budget
# once, and a later retry finds the service re-warmed.
BENCH_SOFT_BUDGET_S = 1750


def _wait_for_accelerator(max_wait_s: float = 900.0) -> None:
    """A killed-mid-compile process wedges the remote-TPU tunnel for
    ~10-20 min; probe it in fresh subprocesses (backend init failure is
    cached per process) until it answers, so a bench launched during the
    wedge recovers instead of dying at jax.devices().

    A timed-out probe is SIGINT'd and abandoned, never SIGKILLed — a
    hard kill of a process attached to the tunnel can perpetuate the
    very wedge this loop is waiting out (round-5 postmortem)."""
    probe = (
        "import jax, numpy as np;"
        "print(int(np.asarray(jax.numpy.ones((8, 128))).sum()))"
    )
    t0 = time.time()
    while True:
        out_f = tempfile.TemporaryFile(mode="w+")
        proc = subprocess.Popen(
            [sys.executable, "-c", probe],
            stdout=out_f, stderr=subprocess.DEVNULL, text=True,
        )
        try:
            # up to 240 s per probe: a degraded-but-usable tunnel was
            # measured answering a tiny op in 219 s (round-5 session 2) —
            # a 120 s probe would have declared it dead for the full
            # max_wait.  Clamped by max_wait_s so the bounded retry-path
            # waits (max_wait_s=120) never overshoot the driver budget.
            rc = proc.wait(timeout=min(240.0, max(60.0, max_wait_s)))
            out_f.seek(0)
            if rc == 0 and "1024" in out_f.read():
                return
        except subprocess.TimeoutExpired:
            try:
                proc.send_signal(signal.SIGINT)
            except OSError:
                pass
        if time.time() - t0 > max_wait_s:
            return  # let the real run surface the error
        time.sleep(30)


def _cache_entries() -> int:
    d = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    try:
        return len(os.listdir(d))
    except OSError:
        return -1


def _run_stage(stage: str, timeout_s: int) -> dict:
    """Run ``bench.py --stage <stage>`` in a subprocess, return its JSON
    result dict, or {"<stage>": "timeout"/"error"} on failure.  The
    subprocess boundary is the watchdog: a stage wedged in a remote
    compile is abandoned at the deadline without touching the parent (or
    the already-printed headline).

    On timeout the stage gets SIGINT and is ABANDONED, not SIGKILLed: a
    hard kill mid-remote-compile wedges the TPU tunnel for ~10-20 min
    (observed round 5 — the next process hangs at ``jax.devices()``),
    poisoning every subsequent stage and even the next bench run.  SIGINT
    lets the interpreter unwind and close the tunnel connection cleanly
    once the blocking remote call returns; until then the orphan keeps
    running, so the timeout dict carries its Popen under ``"_proc"`` for
    the caller to drain (never serialized — keys starting with ``_`` are
    stripped before printing)."""
    t0 = time.perf_counter()
    before = _cache_entries()
    out_f = tempfile.TemporaryFile(mode="w+")
    err_f = tempfile.TemporaryFile(mode="w+")
    # temp-file IO (not pipes): an abandoned stage must never block on a
    # full pipe nobody drains
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--stage", stage],
        stdout=out_f, stderr=err_f, text=True,
    )
    try:
        rc = proc.wait(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        try:
            proc.send_signal(signal.SIGINT)
        except OSError:
            pass
        return {stage: "timeout", f"{stage}_budget_s": timeout_s,
                "degraded": True, "_proc": proc}
    out_f.seek(0)
    err_f.seek(0)
    stdout, stderr = out_f.read(), err_f.read()
    out = {}
    for line in reversed(stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                out = json.loads(line)
                break
            except json.JSONDecodeError:
                continue
    if rc != 0 or not out:
        tail = (stderr.strip().splitlines() or [""])[-1][:200]
        return {stage: "error", f"{stage}_rc": rc,
                f"{stage}_err": tail, "degraded": True}
    out[f"{stage}_wall_s"] = round(time.perf_counter() - t0, 1)
    # compile-tail guard (VERDICT r4 task 2): auxiliary stages must
    # trigger ZERO expensive compiles on a warm cache.  Stage
    # subprocesses persist only >= 5 s compiles (see the stage config),
    # so the entry delta counts exactly the multi-minute novel-program
    # hazard and ignores the ~1 s Pallas-kernel rebuilds whose cache
    # keys are process-unstable.  The preflight gate asserts delta == 0.
    after = _cache_entries()
    if before >= 0 and after >= 0:
        out[f"{stage}_cache_entries_delta"] = after - before
    return out


def _stage_failed(res: dict, stage: str) -> bool:
    return res.get(stage) in ("timeout", "error")


def _drain_orphan(res: dict, wait_s: float) -> None:
    """Bounded wait for an abandoned stage to unwind, so it neither
    contends with nor pollutes the cache accounting of whatever runs
    next.  Strips the non-serializable ``"_proc"`` key either way."""
    proc = res.pop("_proc", None)
    if proc is None or wait_s <= 0:
        return
    try:
        proc.wait(timeout=wait_s)
    except subprocess.TimeoutExpired:
        pass


def _run_stages(t_bench0: float, stages=STAGES,
                soft_budget_s: float = BENCH_SOFT_BUDGET_S,
                run_stage=None, wait_accel=None) -> dict:
    """Run the auxiliary stages sequentially, then retry each failed one
    once if the soft total budget allows (transient-degradation rescue —
    see BENCH_SOFT_BUDGET_S).  Returns the merged extras dict; a stage
    that failed both attempts keeps its failure marker and ``degraded``.
    """
    run_stage = run_stage or _run_stage
    wait_accel = wait_accel or _wait_for_accelerator

    def remaining() -> float:
        return soft_budget_s - (time.perf_counter() - t_bench0)

    results: dict = {}
    budgets = dict(stages)
    queued = [s for s, _ in stages]
    for name, budget in stages:
        queued.remove(name)
        results[name] = run_stage(name, budget)
        # reserve the remaining stages' budgets (+slack) when draining
        reserve = sum(budgets[q] for q in queued) + 60
        _drain_orphan(results[name], remaining() - reserve)
    for name, budget in stages:
        if not _stage_failed(results[name], name):
            continue
        if remaining() < budget + 90:
            continue  # a retry would not fit the driver's budget
        wait_accel(max_wait_s=min(120.0, remaining() - budget - 60))
        retry = run_stage(name, budget)
        retry[f"{name}_retried"] = True
        _drain_orphan(retry, remaining() - 60)
        if _stage_failed(retry, name):
            results[name][f"{name}_retried"] = True
        else:
            results[name] = retry
    extra: dict = {}
    for res in results.values():
        extra.update(res)
    return {k: v for k, v in extra.items() if not k.startswith("_")}


def main() -> None:
    import argparse

    t_bench0 = time.perf_counter()
    parser = argparse.ArgumentParser()
    parser.add_argument("--views", type=int, default=None,
                        help="long-sequence mode: views/s at N views, 504x336")
    parser.add_argument("--runs", type=int, default=5)
    parser.add_argument("--stage", choices=["p50", "smoke"], default=None,
                        help="internal: run one auxiliary stage and print "
                             "its JSON result")
    args = parser.parse_args()

    if args.stage == "p50":
        # internal soft deadline: return a median of HOWEVER MANY timed
        # runs fit the stage budget (minus teardown margin) instead of
        # letting the subprocess watchdog kill a stage whose
        # compile-heavy warmup ate most of it — a p50 from fewer samples
        # beats no p50 at all
        deadline = t_bench0 + P50_TIMEOUT_S - 30
        print(json.dumps(scene_latency_p50(deadline=deadline)), flush=True)
        return
    if args.stage == "smoke":
        print(json.dumps(postproc_scale_smoke()), flush=True)
        return

    _wait_for_accelerator()

    import jax
    import jax.numpy as jnp

    # the env var alone is too late on this image: sitecustomize imports
    # jax (to register the axon plugin) before this script runs, so the
    # config key must be set in-process
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jax_cache"))
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

    headline = {
        "metric": "views_per_sec_8view_518px",
        "value": round(views_per_sec, 4),
        "unit": "views/s",
        "vs_baseline": round(views_per_sec / anchor, 4),
    }
    # the headline survives anything that happens below: print it NOW
    print(json.dumps({**headline, "extra": {"partial": True}}), flush=True)

    # free the throughput run's buffers before the auxiliary stages
    # (their subprocesses share the one-chip HBM through the tunnel)
    del images, out, params

    try:
        extra = _run_stages(t_bench0)
    except Exception as e:  # never let extras kill the bench
        extra = {"extras_error": repr(e)[:200], "degraded": True}

    print(json.dumps({**headline, "extra": extra}), flush=True)


def postproc_scale_smoke(views: int = 10, h: int = 336, w: int = 504):
    """Compile + run the demo post-processing hot ops at 10-view scale
    (M=1.69M px, the demo6 regime) with synthetic data.

    Round 3 shipped a knn_smooth_features rewrite whose compile-time
    tile-padding blowup was invisible to the 3-view p50 until the driver
    ran it; this guard (a) asserts the smoothing executable's XLA temp
    budget at scale and (b) actually executes smoothing + clustering
    once.  A failure here degrades the bench extras (the headline is
    un-losable by design) and turns the PREFLIGHT gate red —
    benchmarks/driver_sim.py fails on degraded/missing stage results.

    The synthetic scene is SPATIALLY COHERENT (blob ids are contiguous
    image regions, like real scenes), not per-pixel random: round 4 drew
    blob ids i.i.d. per pixel, which after kNN smoothing produced a
    feature-space continuum between all 6 centers — a regime no real
    scene exhibits — and sent the clustering refinement into an unbounded
    compile tail on the driver's critical path (VERDICT r4).  The memory
    scale (M=1.69M points through smoothing + clustering) is unchanged;
    that is what the guard is for.
    """
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jax_cache"))
    # stages persist only compiles >= 5 s: Pallas-bearing programs have
    # process-unstable cache keys (the serialized Mosaic payload is not
    # byte-stable), so their ~1 s service-cached rebuilds would mint a
    # new cache entry nearly every run and false-trip the zero-delta
    # compile-tail gate; >= 5 s keeps the gate sensitive to exactly the
    # hazard it exists for (the round-4 multi-minute novel compiles)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from iggt_official_tpu.ops.cluster import cluster_features_to_masks_mv
    from iggt_official_tpu.ops.knn import knn_smooth_features

    rng = np.random.default_rng(1)
    centers = rng.uniform(-1, 1, (6, 8)).astype(np.float32)
    # blob id = contiguous spatial region: per-view Voronoi partition of
    # the image plane under 6 random sites (regions, straight boundaries)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    blob = np.empty((views, h, w), np.int64)
    for v in range(views):
        sites = rng.uniform(0, 1, (6, 2)).astype(np.float32)
        d2 = ((yy[None] / h - sites[:, :1, None]) ** 2
              + (xx[None] / w - sites[:, 1:, None]) ** 2)
        blob[v] = np.argmin(d2, axis=0)
    blob = blob.reshape(-1)
    fts_np = (centers[blob] + rng.normal(0, 0.05, (views * h * w, 8))
              ).astype(np.float32).reshape(views, h, w, 8)
    # points: smooth per-view depth surface unprojected on the pixel grid
    # + per-blob world offset (objects occupy distinct depth bands), so
    # the Morton smoothing neighbourhoods are local pixels like a real
    # unprojection
    depth = 2.0 + 0.5 * np.sin(yy / 40.0)[None] + 0.3 * np.cos(xx / 55.0)[None]
    depth = depth + 0.4 * blob.reshape(views, h, w)
    pts_np = np.stack(
        [(xx[None] / w - 0.5) * depth, (yy[None] / h - 0.5) * depth, depth],
        axis=-1,
    ).astype(np.float32)
    pts_np += rng.normal(0, 0.003, pts_np.shape).astype(np.float32)

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
        "smoke10_clusters": int(len(np.unique(masks[masks >= 0]))),
        "smoke10_smooth_temp_gib": (
            round(temp_gib, 2) if temp_gib is not None else None),
    }


def scene_latency_p50(runs: int = 5, deadline: float | None = None):
    """Median end-to-end scene latency on the demo1 scene, as a dict
    ``{"p50_scene_latency_s": median, ...}``, or ``{"p50_scene_latency_s":
    None}`` if the scene images are unavailable.

    ``deadline`` (perf_counter timestamp) is a soft budget: after the
    warmup (which carries the compile cost and cannot be skipped), timed
    runs stop early once the deadline passes, and the median of the runs
    that DID complete is returned with ``p50_runs_used`` marking the
    truncation.  At least one timed run is always attempted post-warmup.
    """
    scene = "/root/reference/iggt_demo/demo1"
    if not os.path.isdir(os.path.join(scene, "images")):
        return {"p50_scene_latency_s": None}
    import statistics

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jax_cache"))
    # stages persist only compiles >= 5 s: Pallas-bearing programs have
    # process-unstable cache keys (the serialized Mosaic payload is not
    # byte-stable), so their ~1 s service-cached rebuilds would mint a
    # new cache entry nearly every run and false-trip the zero-delta
    # compile-tail gate; >= 5 s keeps the gate sensitive to exactly the
    # hazard it exists for (the round-4 multi-minute novel compiles)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

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
        if deadline is not None and time.perf_counter() > deadline:
            break
    out = {"p50_scene_latency_s": round(statistics.median(times), 3)}
    if len(times) < runs:
        out["p50_runs_used"] = len(times)
    return out


if __name__ == "__main__":
    main()
