"""Native host runtime: C++ post-processing kernels via ctypes.

The reference's native layer is a CUDA connected-components kernel
(`sam2/csrc/connected_components.cu`) plus cuml GPU clustering
(`iggt/utils/misc.py:19-22`). Here the device side is XLA/Pallas; the
host-side irregular post-processing (union-find CCL, density clustering,
1-NN reassignment) is this C++ extension, compiled on first import with
g++ and loaded through ctypes — no pybind11.

Every entry point has a pure-Python fallback at its call site
(ops/cluster.py, ops/connected_components.py); ``available()`` reports
whether the native path is live.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "postproc.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_DIR, f"_postproc_{digest}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".tmp{os.getpid()}"
        base = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
            "-fvisibility=hidden", _SRC, "-o", tmp,
        ]
        # -march=native vectorizes the kNN leaf scans (~1.5x); retry
        # portable if the toolchain rejects it
        try:
            try:
                subprocess.run(
                    base + ["-march=native"], check=True,
                    capture_output=True, timeout=120,
                )
            except subprocess.CalledProcessError:
                subprocess.run(
                    base, check=True, capture_output=True, timeout=120
                )
            os.replace(tmp, so_path)
        except (OSError, subprocess.SubprocessError):
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None

    i64 = ctypes.c_int64
    lib.ccl2d.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), i64, i64, i64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.wdbscan.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(i64), i64, i64,
        ctypes.c_float, i64, ctypes.POINTER(i64),
    ]
    lib.nn1.argtypes = [
        ctypes.POINTER(ctypes.c_float), i64,
        ctypes.POINTER(ctypes.c_float), i64, i64, ctypes.POINTER(i64),
    ]
    f64 = ctypes.POINTER(ctypes.c_double)
    lib.hdbscan_mst_labels.argtypes = [
        ctypes.POINTER(i64), ctypes.POINTER(i64), f64, i64,
        f64, f64, i64,
        ctypes.c_double, ctypes.c_double, ctypes.c_int32,
        ctypes.POINTER(i64),
    ]
    lib.mst_from_edges.argtypes = [
        ctypes.POINTER(i64), ctypes.POINTER(i64), f64, i64, i64,
        ctypes.POINTER(i64), ctypes.POINTER(i64), f64,
    ]
    lib.mst_from_edges.restype = i64
    lib.mst_knn.argtypes = [
        f64, ctypes.POINTER(i64), f64, i64, i64,
        ctypes.POINTER(i64), ctypes.POINTER(i64), f64,
    ]
    lib.mst_knn.restype = i64
    f32 = ctypes.POINTER(ctypes.c_float)
    lib.knn_query.argtypes = [f32, i64, i64, i64, f32, ctypes.POINTER(i64)]
    lib.knn_query.restype = None
    lib.nn1_tree.argtypes = [f32, i64, f32, i64, i64, ctypes.POINTER(i64)]
    lib.nn1_tree.restype = None
    lib.knn_tree_build.argtypes = [f32, i64, i64]
    lib.knn_tree_build.restype = ctypes.c_void_p
    lib.knn_tree_free.argtypes = [ctypes.c_void_p]
    lib.knn_tree_free.restype = None
    lib.knn_tree_query.argtypes = [
        ctypes.c_void_p, f32, i64, i64, f32, ctypes.POINTER(i64)]
    lib.knn_tree_query.restype = None
    for fn in (lib.ccl2d, lib.wdbscan, lib.nn1, lib.hdbscan_mst_labels):
        fn.restype = None
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is None and not _tried:
        with _lock:
            if _lib is None and not _tried:
                _lib = _build_and_load()
                _tried = True
    return _lib


def available() -> bool:
    return _get_lib() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def connected_components(mask: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Batched 8-connectivity CCL. mask (B, H, W) bool/uint8 ->
    (labels int32 (min-linear-index+1, bg 0), areas int32)."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native postproc library unavailable")
    mask = np.ascontiguousarray(mask, np.uint8)
    b, h, w = mask.shape
    labels = np.empty((b, h, w), np.int32)
    areas = np.empty((b, h, w), np.int32)
    lib.ccl2d(
        _ptr(mask, ctypes.c_uint8), b, h, w,
        _ptr(labels, ctypes.c_int32), _ptr(areas, ctypes.c_int32),
    )
    return labels, areas


def weighted_dbscan(
    points: np.ndarray,
    weights: np.ndarray,
    eps: float,
    min_samples: int,
) -> np.ndarray:
    """Weighted DBSCAN, semantics of ops/cluster.py::weighted_dbscan."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native postproc library unavailable")
    points = np.ascontiguousarray(points, np.float32)
    weights = np.ascontiguousarray(weights, np.int64)
    n, d = points.shape
    labels = np.empty(n, np.int64)
    lib.wdbscan(
        _ptr(points, ctypes.c_float), _ptr(weights, ctypes.c_int64),
        n, d, ctypes.c_float(eps), int(min_samples),
        _ptr(labels, ctypes.c_int64),
    )
    return labels


def hdbscan_mst_labels(
    edge_a: np.ndarray,
    edge_b: np.ndarray,
    edge_d: np.ndarray,
    weights: np.ndarray,
    core: np.ndarray,
    eps: float,
    min_cluster_size: float,
    allow_single_cluster: bool = False,
) -> np.ndarray:
    """Weighted-HDBSCAN labels from mutual-reachability MST edges —
    semantics of ops/cluster.py::weighted_hdbscan past the MST step."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native postproc library unavailable")
    edge_a = np.ascontiguousarray(edge_a, np.int64)
    edge_b = np.ascontiguousarray(edge_b, np.int64)
    edge_d = np.ascontiguousarray(edge_d, np.float64)
    weights = np.ascontiguousarray(weights, np.float64)
    core = np.ascontiguousarray(core, np.float64)
    K = weights.shape[0]
    labels = np.empty(K, np.int64)
    i64, f64 = ctypes.c_int64, ctypes.c_double
    lib.hdbscan_mst_labels(
        _ptr(edge_a, i64), _ptr(edge_b, i64), _ptr(edge_d, f64),
        int(edge_a.shape[0]),
        _ptr(weights, f64), _ptr(core, f64), int(K),
        ctypes.c_double(eps), ctypes.c_double(min_cluster_size),
        ctypes.c_int32(1 if allow_single_cluster else 0),
        _ptr(labels, i64),
    )
    return labels


def mst_from_edges(
    src: np.ndarray, dst: np.ndarray, w: np.ndarray, n_vertices: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Minimum spanning forest (Boruvka) of an undirected sparse graph.

    Returns (a, b, d) edge arrays of the forest (<= n_vertices - 1 edges),
    endpoints as given (not canonicalized).  Replaces
    scipy.sparse.csgraph.minimum_spanning_tree in ops/cluster.py."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native postproc library unavailable")
    src = np.ascontiguousarray(src, np.int64)
    dst = np.ascontiguousarray(dst, np.int64)
    w = np.ascontiguousarray(w, np.float64)
    cap = max(int(n_vertices) - 1, 1)
    out_a = np.empty(cap, np.int64)
    out_b = np.empty(cap, np.int64)
    out_d = np.empty(cap, np.float64)
    i64, f64 = ctypes.c_int64, ctypes.c_double
    n = lib.mst_from_edges(
        _ptr(src, i64), _ptr(dst, i64), _ptr(w, f64),
        int(src.shape[0]), int(n_vertices),
        _ptr(out_a, i64), _ptr(out_b, i64), _ptr(out_d, f64),
    )
    return out_a[:n], out_b[:n], out_d[:n]


def mst_knn(
    knn_dist: np.ndarray, knn_idx: np.ndarray, core: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Mutual-reachability minimum spanning forest straight from (K, k)
    kNN arrays + core distances; fuses the mreach edge construction into
    the Boruvka pass (ops/cluster.py::_mreach_mst fast path)."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native postproc library unavailable")
    knn_dist = np.ascontiguousarray(knn_dist, np.float64)
    knn_idx = np.ascontiguousarray(knn_idx, np.int64)
    core = np.ascontiguousarray(core, np.float64)
    K, k = knn_idx.shape
    cap = max(K - 1, 1)
    out_a = np.empty(cap, np.int64)
    out_b = np.empty(cap, np.int64)
    out_d = np.empty(cap, np.float64)
    i64, f64 = ctypes.c_int64, ctypes.c_double
    n = lib.mst_knn(
        _ptr(knn_dist, f64), _ptr(knn_idx, i64), _ptr(core, f64),
        int(K), int(k),
        _ptr(out_a, i64), _ptr(out_b, i64), _ptr(out_d, f64),
    )
    return out_a[:n], out_b[:n], out_d[:n]


def knn_query(points: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Exact kNN of every point among ``points`` (self included), rows
    sorted ascending by (distance, index). Returns (dist f32 (n, k),
    idx i64 (n, k))."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native postproc library unavailable")
    points = np.ascontiguousarray(points, np.float32)
    n, d = points.shape
    if not 0 < k <= n:
        raise ValueError(f"k={k} out of range for n={n}")
    dist = np.empty((n, k), np.float32)
    idx = np.empty((n, k), np.int64)
    lib.knn_query(
        _ptr(points, ctypes.c_float), int(n), int(d), int(k),
        _ptr(dist, ctypes.c_float), _ptr(idx, ctypes.c_int64),
    )
    return dist, idx


class KnnTree:
    """Reusable exact-kNN tree over a fixed reference set.

    Build once (`KnnTree(ref)`), query many batches (`.query(q, k)`) —
    the clustering refinement's per-cluster-pair queries all hit the same
    ~1.7M-point full-resolution reference, and on the remote-compile XLA
    backend each distinct device query shape costs a fresh multi-minute
    compile; this host path has zero compiles and one amortized build.
    """

    def __init__(self, ref: np.ndarray):
        lib = _get_lib()
        if lib is None:
            raise RuntimeError("native postproc library unavailable")
        self._lib = lib
        # the tree memcpys the points at build (knn_tree_build), so the
        # reference array is only needed for the duration of that call —
        # no handle to it is kept.  If knn_tree_build is ever made
        # zero-copy, this MUST start storing `ref` on self.
        ref = np.ascontiguousarray(ref, np.float32)
        self.n, self.d = ref.shape
        self._handle = lib.knn_tree_build(
            _ptr(ref, ctypes.c_float), self.n, self.d
        )
        if not self._handle:
            raise RuntimeError("knn_tree_build failed (empty reference?)")

    def query(self, query: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """(dist f32 (nq, k), idx i64 (nq, k)) of the k nearest reference
        rows per query row, sorted ascending by (distance, ref index);
        k > n_ref rows pad with +inf / nearest index."""
        if self._handle is None:
            raise RuntimeError("KnnTree already closed")
        query = np.ascontiguousarray(query, np.float32)
        nq, d = query.shape
        if d != self.d:
            raise ValueError(f"query dim {d} != ref dim {self.d}")
        dist = np.empty((nq, k), np.float32)
        idx = np.empty((nq, k), np.int64)
        self._lib.knn_tree_query(
            self._handle, _ptr(query, ctypes.c_float), int(nq), int(k),
            _ptr(dist, ctypes.c_float), _ptr(idx, ctypes.c_int64),
        )
        return dist, idx

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.knn_tree_free(self._handle)
            self._handle = None

    def __enter__(self) -> "KnnTree":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def __del__(self):  # best-effort; close() is the reliable path
        try:
            self.close()
        except Exception:
            pass


def knn_query_vs(
    ref: np.ndarray, query: np.ndarray, k: int
) -> Tuple[np.ndarray, np.ndarray]:
    """One-shot kNN of ``query`` rows among ``ref`` rows (tree build +
    query + free); use KnnTree directly to amortize the build."""
    with KnnTree(ref) as tree:
        return tree.query(query, k)


def nearest_neighbor(ref: np.ndarray, query: np.ndarray) -> np.ndarray:
    """Index of the nearest ``ref`` point for every ``query`` point.

    Large batches go through the bucketed KNNTree (vectorized leaf scans);
    small ones through the plain KD-tree, whose build is cheaper."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native postproc library unavailable")
    ref = np.ascontiguousarray(ref, np.float32)
    query = np.ascontiguousarray(query, np.float32)
    n_ref, d = ref.shape
    n_query = query.shape[0]
    out = np.empty(n_query, np.int64)
    fn = lib.nn1_tree if n_query >= 4096 else lib.nn1
    fn(
        _ptr(ref, ctypes.c_float), n_ref,
        _ptr(query, ctypes.c_float), n_query, d,
        _ptr(out, ctypes.c_int64),
    )
    return out
