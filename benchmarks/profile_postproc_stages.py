"""Sub-stage timing of the two dominant p50 stages (smoothing, clustering).

`benchmarks/measure_p50_breakdown.py` shows knn_smooth (~2.3 s) + cluster
(~3.0 s) dominate the demo1 p50; this breaks each into device sub-phases
at the same shapes (M=508k cloud, F=8 features, 150k cluster subsample)
with synthetic data, so the attack order is measured, not guessed.

Run on the TPU host with the chip idle:
    python benchmarks/profile_postproc_stages.py
"""

from __future__ import annotations

import argparse
import functools
import os
import os.path as op
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, op.join(op.dirname(op.abspath(__file__)), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def _sync(out):
    # one-element device-side slice + fetch: block_until_ready returns
    # early through the axon tunnel, and a full np.asarray would download
    # the whole output at ~35 MB/s — both corrupt the timing
    import jax

    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def timeit(fn, *args, runs=5, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--m", type=int, default=508_032)  # 3 views 504x336
    parser.add_argument("--runs", type=int, default=5)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from iggt_official_tpu.ops import knn as K

    M, F, k, window = args.m, 8, 20, 32
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((M, 3)), jnp.float32)
    fts = jnp.asarray(rng.standard_normal((M, F)), jnp.float32)

    # --- whole smoothing call -------------------------------------------
    t = timeit(
        functools.partial(K.knn_smooth_features, k=k, window=window),
        pts, fts, runs=args.runs,
    )
    print(f"knn_smooth_features total      : {t*1e3:8.1f} ms", flush=True)

    # --- phase A: morton codes + argsort x3 ------------------------------
    @jax.jit
    def phase_sort(pts):
        outs = []
        for rot in K._ROTATIONS:
            outs.append(jnp.argsort(K._morton_codes(pts @ jnp.asarray(rot).T)))
        return outs

    t = timeit(phase_sort, pts, runs=args.runs)
    print(f"  morton+argsort x3            : {t*1e3:8.1f} ms", flush=True)

    # --- phase B: candidate build (position gather + scatter) x3 ----------
    @jax.jit
    def phase_cand(pts):
        offsets = jnp.concatenate(
            [jnp.arange(-window, 0), jnp.arange(1, window + 1)]
        )
        rows = jnp.arange(M)[:, None]
        cand = []
        for rot in K._ROTATIONS:
            order = jnp.argsort(K._morton_codes(pts @ jnp.asarray(rot).T))
            pos = rows + offsets[None, :]
            valid = (pos >= 0) & (pos < M)
            ids = order[jnp.clip(pos, 0, M - 1)]
            gathered = jnp.full((M, offsets.shape[0]), -1, jnp.int32)
            gathered = gathered.at[order].set(
                jnp.where(valid, ids, -1).astype(jnp.int32)
            )
            cand.append(gathered)
        return jnp.concatenate(cand, axis=1)

    t_cand = timeit(phase_cand, pts, runs=args.runs)
    print(f"  + candidate build (scatter)  : {t_cand*1e3:8.1f} ms", flush=True)
    cand = phase_cand(pts)
    _sync(cand)

    # --- phase C: dedup + distances + top-k + feature mean ----------------
    block = 65536

    @jax.jit
    def phase_smooth(cand, pts, fts):
        def smooth_block(args_):
            cand_b, pts_b = args_
            cand_sorted = jnp.sort(cand_b, axis=1)
            dup = jnp.concatenate(
                [jnp.zeros((cand_b.shape[0], 1), bool),
                 cand_sorted[:, 1:] == cand_sorted[:, :-1]], axis=1)
            cand_ok = (cand_sorted >= 0) & ~dup
            safe = jnp.clip(cand_sorted, 0, M - 1)
            d2 = jnp.sum((pts[safe] - pts_b[:, None, :]) ** 2, axis=-1)
            d2 = jnp.where(cand_ok, d2, jnp.inf)
            _, nbr = jax.lax.top_k(-d2, k)
            nbr_idx = jnp.take_along_axis(safe, nbr, axis=1)
            return jnp.mean(fts[nbr_idx], axis=1)

        pad = (-M) % block
        cand_p = jnp.pad(cand, ((0, pad), (0, 0)), constant_values=-1)
        pts_p = jnp.pad(pts, ((0, pad), (0, 0)))
        out = jax.lax.map(
            smooth_block,
            (cand_p.reshape(-1, block, cand.shape[1]),
             pts_p.reshape(-1, block, 3)),
        )
        return out.reshape(-1, F)[:M]

    t = timeit(phase_smooth, cand, pts, fts, runs=args.runs)
    print(f"  dedup+dist+topk+mean         : {t*1e3:8.1f} ms", flush=True)

    # --- clustering sub-phases at subsample scale -------------------------
    from iggt_official_tpu.ops.knn import brute_knn
    from iggt_official_tpu.ops.cluster_device import (
        _boruvka_rank, mreach_mst_device,
    )

    Ksub = 150_000
    sub = jnp.asarray(rng.standard_normal((Ksub, F)), jnp.float32)

    t0 = time.perf_counter()
    d_dev, i_dev = brute_knn(sub, sub, 64, approx=True, out_device=True)
    jax.block_until_ready((d_dev, i_dev))
    print(f"cluster: brute_knn 150k k=64   : {(time.perf_counter()-t0)*1e3:8.1f} ms (cold-ish)", flush=True)
    t = timeit(lambda s: brute_knn(s, s, 64, approx=True, out_device=True),
               sub, runs=3)
    print(f"cluster: brute_knn 150k k=64   : {t*1e3:8.1f} ms", flush=True)

    from iggt_official_tpu.ops.nn1_pallas import bucket_topk_pallas

    t = timeit(lambda s: bucket_topk_pallas(s, s, 64), sub, runs=3)
    print(f"cluster: bucket_topk 150k k=64 : {t*1e3:8.1f} ms", flush=True)

    t = timeit(lambda a, b: _boruvka_rank(a, b, 10), d_dev, i_dev, runs=3)
    print(f"cluster: boruvka (device)      : {t*1e3:8.1f} ms", flush=True)

    t0 = time.perf_counter()
    edges = mreach_mst_device(d_dev, i_dev, 10)
    print(f"cluster: mst edges -> host     : {(time.perf_counter()-t0)*1e3:8.1f} ms", flush=True)

    from iggt_official_tpu.ops.cluster import _labels_from_edges

    w = np.ones(Ksub)
    t0 = time.perf_counter()
    _labels_from_edges(edges[0], edges[1], edges[2], w, edges[3], 0.3, 100,
                       False)
    print(f"cluster: host labelling        : {(time.perf_counter()-t0)*1e3:8.1f} ms", flush=True)

    # 1-NN backfill of the non-subsampled pixels (Pallas kernel, the
    # pipeline's actual path, vs the HBM-materialized XLA blocks)
    from iggt_official_tpu.ops.nn1_pallas import nn1_pallas

    q = jnp.asarray(rng.standard_normal((M - Ksub, F)), jnp.float32)
    t = timeit(lambda qq, r: nn1_pallas(qq, r), q, sub, runs=3)
    print(f"cluster: nn1_pallas   {M-Ksub:>8}: {t*1e3:8.1f} ms", flush=True)
    t = timeit(lambda r, qq: brute_knn(r, qq, 1, approx=True,
                                       out_device=True), sub, q, runs=3)
    print(f"cluster: 1-NN XLA     {M-Ksub:>8}: {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
