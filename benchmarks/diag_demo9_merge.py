"""Diagnose demo9 over-merge: which refinement pass unions what.

Replays `_cluster_mv_host`'s steps on the cached demo9 features, logging
every union made by part 1 (full-density sub-eps connectivity) and
part 2 (small-cluster viability), and maps each base subsample cluster
to its best-overlap exact cluster so wrong merges are identifiable.
"""
import os
import os.path as op
import sys
import time

import numpy as np

sys.path.insert(0, op.join(op.dirname(op.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

CACHE = "/tmp/subsample_lab"
SCENE = sys.argv[1] if len(sys.argv) > 1 else "demo9"
PRESET = dict(eps=0.06, min_samples=100, min_cluster_size=500)
BUDGET = 150_000

from iggt_official_tpu.ops import cluster as C

smoothed = np.load(op.join(CACHE, f"{SCENE}.npz"))["smoothed"]
m_ex = np.load(op.join(CACHE, f"{SCENE}_exact.npy")).reshape(-1)
flat = smoothed.reshape(-1, smoothed.shape[-1]).astype(np.float32)
M = flat.shape[0]
print(f"{SCENE}: M={M}, exact clusters={len(np.unique(m_ex[m_ex>=0]))}")

# --- base subsample labels (pre-refinement), same seed as production ---
rng = np.random.default_rng(0)
sample_idx = rng.choice(M, BUDGET, replace=False)
rate = BUDGET / M
pts = flat[sample_idx]
ms = max(2, int(round(PRESET["min_samples"] * rate)))
mcs = max(2, int(round(PRESET["min_cluster_size"] * rate)))
t0 = time.perf_counter()
labels = C.weighted_hdbscan(
    pts, np.ones(pts.shape[0], np.float64), PRESET["eps"], ms, mcs,
    approx_ok=True,
)
noise = labels == -1
if noise.any() and not noise.all():
    labels[noise] = labels[~noise][C._nn1(pts[~noise], pts[noise])]
print(f"base hdbscan: {time.perf_counter()-t0:.1f}s, "
      f"{len(np.unique(labels[labels>=0]))} clusters")

j_all = np.empty(M, np.int64)
j_all[sample_idx] = np.arange(pts.shape[0])
rest = np.ones(M, bool)
rest[sample_idx] = False
j_all[rest] = C._nn1(pts, flat[rest])
full_base = labels[j_all]

# --- map base clusters -> exact clusters by overlap --------------------
uniq = np.unique(labels[labels >= 0])
print("\nbase cluster -> exact overlap:")
for u in uniq:
    sel = full_base == u
    ex_ids, counts = np.unique(m_ex[sel], return_counts=True)
    top = np.argsort(-counts)[:3]
    frac = counts / sel.sum()
    print(f"  base {u} (size {sel.sum()}): " + ", ".join(
        f"exact {ex_ids[i]}={frac[i]:.3f}" for i in top))

# --- instrument the two passes -----------------------------------------
union_log = []
orig_union = C._UnionFind.union
def logged_union(self, a, b):
    union_log.append((int(a), int(b)))
    return orig_union(self, a, b)
C._UnionFind.union = logged_union

orig_viab = C._small_cluster_viability_merges
def logged_viab(*args, **kw):
    union_log.append(("--- part2 starts ---",))
    return orig_viab(*args, **kw)
C._small_cluster_viability_merges = logged_viab
# patch the reference inside _boundary_merge_full_density's module namespace
# (it calls the module-level name, so the monkeypatch above suffices)

t0 = time.perf_counter()
ref = C._boundary_merge_full_density(
    flat, pts, labels, j_all, PRESET["eps"], PRESET["min_samples"],
    PRESET["min_cluster_size"],
)
print(f"\nrefinement: {time.perf_counter()-t0:.1f}s")
print("union log:", union_log)
print("refined clusters:", len(np.unique(ref[ref >= 0])))

# miou after refinement
full_ref = ref[j_all]
from benchmarks.subsample_policy_lab import matched_miou
print("miou refined:", matched_miou(m_ex, full_ref))
print("miou base   :", matched_miou(m_ex, full_base))
