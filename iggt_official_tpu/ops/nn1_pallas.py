"""Fused 1-nearest-neighbour Pallas kernel (TPU).

The clustering pipeline 1-NN-assigns every non-sampled pixel to its
nearest subsample point in 8-D feature space (`iggt/utils/misc.py:135-148`
noise reassignment, generalized to the subsample backfill) — ~1.5M
queries x 150k references at demo scale.  An XLA implementation must
materialize (Q, R) distance blocks in HBM (~900 GB of traffic at that
scale); this kernel keeps each (BQ, BK) distance tile in VMEM and tracks
a running (min, argmin), so HBM traffic collapses to the inputs
(~30 GB of streamed reference re-reads).

The distance tile is computed as d2 = sum_a (q_a - r_a)^2 with D unrolled
broadcast FMAs on the VPU — exact fp32.  The MXU is deliberately not
used: the D=8 contraction would waste 120/128 of the systolic array, and
Mosaic lowers f32 `dot_general` through bf16 passes whose rounding flips
~70% of nearest-neighbour picks on unit-norm feature data (measured) —
the VPU path is both exact and within 3x of the bf16 MXU time.

Tie-break matches the host KD-tree (native/postproc.cpp::nn1_tree):
equal distances resolve to the smallest reference index.  Within a tile
the index-min over equal d2 handles it; across tiles a strict `<` keeps
the earlier block, and an equality pass keeps the smaller index.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG_I32 = np.int32(2**31 - 1)


def _nn1_kernel(q_ref, rt_ref, oi_ref, md_ref, mi_ref, *, bk: int, n_ref: int):
    ik = pl.program_id(1)
    num_kb = pl.num_programs(1)

    @pl.when(ik == 0)
    def _():
        md_ref[:] = jnp.full_like(md_ref, jnp.inf)
        mi_ref[:] = jnp.full_like(mi_ref, _BIG_I32)

    rt = rt_ref[0]                                    # (D, BK)
    q = q_ref[0]                                      # (BQ, D)
    bq = q.shape[0]
    d = jnp.zeros((bq, bk), jnp.float32)
    for a in range(q.shape[1]):
        diff = q[:, a:a + 1] - rt[a:a + 1, :]
        d = d + diff * diff

    col = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    gidx = col + ik * bk
    d = jnp.where(gidx < n_ref, d, jnp.inf)

    bmin = jnp.min(d, axis=1, keepdims=True)          # (BQ, 1)
    bidx = jnp.min(
        jnp.where(d == bmin, gidx, _BIG_I32), axis=1, keepdims=True
    )
    prev_d = md_ref[:]
    prev_i = mi_ref[:]
    take = (bmin < prev_d) | ((bmin == prev_d) & (bidx < prev_i))
    md_ref[:] = jnp.where(take, bmin, prev_d)
    mi_ref[:] = jnp.where(take, bidx, prev_i)

    @pl.when(ik == num_kb - 1)
    def _():
        oi_ref[0, 0] = mi_ref[:][:, 0]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def nn1_pallas(
    query: jax.Array,
    ref: jax.Array,
    block_q: int = 1024,
    block_k: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """Index of the nearest ``ref`` row per ``query`` row -> (Q,) int32.

    query (Q, D), ref (R, D), exact fp32; D is the (small) feature width.
    Ties resolve to the smallest reference index, matching the host
    KD-tree path.  1.54M x 150k x 8-D runs in ~1.7 s on v5e (vs ~9 s for
    HBM-materialized XLA distance blocks)."""
    Q, D = query.shape
    R = ref.shape[0]

    bq = min(block_q, _round_up(Q, 128))
    bk = min(block_k, _round_up(R, 128))
    nq_pad = _round_up(Q, bq)
    nk_pad = _round_up(R, bk)

    qp = jnp.pad(query.astype(jnp.float32), ((0, nq_pad - Q), (0, 0)))
    rt = jnp.pad(ref.astype(jnp.float32).T, ((0, 0), (0, nk_pad - R)))

    qp = qp.reshape(nq_pad // bq, bq, D)
    rt = rt.reshape(D, nk_pad // bk, bk).swapaxes(0, 1)  # (nkb, D, bk)

    out = pl.pallas_call(
        functools.partial(_nn1_kernel, bk=bk, n_ref=R),
        grid=(nq_pad // bq, nk_pad // bk),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda iq, ik: (iq, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, bk), lambda iq, ik: (ik, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq), lambda iq, ik: (iq, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq_pad // bq, 1, bq), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * Q * R * D,
            bytes_accessed=(Q * D + (nq_pad // bq) * R * D) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qp, rt)
    return out.reshape(-1)[:Q]


def _bucket_topk_kernel(
    q_ref, rt_ref, od_ref, oi_ref, bd_ref, bi_ref, *,
    bk: int, nb: int, n_ref: int,
):
    ik = pl.program_id(1)
    num_kb = pl.num_programs(1)

    @pl.when(ik == 0)
    def _():
        bd_ref[:] = jnp.full_like(bd_ref, jnp.inf)
        bi_ref[:] = jnp.full_like(bi_ref, _BIG_I32)

    rt = rt_ref[0]                                    # (D, BK)
    q = q_ref[0]                                      # (BQ, D)
    bq = q.shape[0]
    d = jnp.zeros((bq, bk), jnp.float32)
    for a in range(q.shape[1]):                       # exact VPU distances
        diff = q[:, a:a + 1] - rt[a:a + 1, :]
        d = d + diff * diff

    col = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    gidx = col + ik * bk
    d = jnp.where(gidx < n_ref, d, jnp.inf)

    # fold the (BQ, BK) tile into NB buckets (bucket of global index g is
    # g % nb — consistent across blocks because bk % nb == 0); static lane
    # slices keep Mosaic happy, and the pairwise update applies the same
    # smallest-index tie-break as the cross-block merge below
    fd = d[:, :nb]
    fi = gidx[:, :nb]
    for f in range(1, bk // nb):
        cd = d[:, f * nb:(f + 1) * nb]
        ci = gidx[:, f * nb:(f + 1) * nb]
        adv = (cd < fd) | ((cd == fd) & (ci < fi))
        fd = jnp.where(adv, cd, fd)
        fi = jnp.where(adv, ci, fi)

    prev_d = bd_ref[:]
    prev_i = bi_ref[:]
    take = (fd < prev_d) | ((fd == prev_d) & (fi < prev_i))
    bd_ref[:] = jnp.where(take, fd, prev_d)
    bi_ref[:] = jnp.where(take, fi, prev_i)

    @pl.when(ik == num_kb - 1)
    def _():
        od_ref[0] = bd_ref[:]
        oi_ref[0] = bi_ref[:]


@functools.partial(
    jax.jit, static_argnames=("k", "nb", "block_q", "block_k", "interpret")
)
def bucket_topk_pallas(
    query: jax.Array,
    ref: jax.Array,
    k: int,
    nb: int = 1024,
    block_q: int = 256,
    block_k: int = 2048,
    interpret: bool = False,
):
    """Approximate k-nearest refs per query via per-lane bucket minima.

    Streams (BQ, BK) exact-fp32 distance tiles through VMEM like
    `nn1_pallas`, but keeps a running minimum per *bucket* (bucket =
    global ref index mod ``nb``) in scratch instead of a single min, then
    takes the exact top-k over the ``nb`` bucket minima in XLA.  Replaces
    the HBM-materialized `approx_min_k` blocks for the clustering core-kNN
    (`ops/cluster.py::weighted_hdbscan` device path): traffic collapses
    from 2*Q*R*4 bytes to the streamed ref re-reads.

    Recall: a true k-NN member is lost only when a *closer* point (itself
    a k-NN member) shares its bucket — expected losses ~= C(k,2)/nb
    (~2 of 64 at nb=1024, recall ~0.97, vs the 0.95 recall target of the
    approx_min_k path it replaces), and a miss can only inflate the
    mutual-reachability weight, the same one-sided failure direction
    documented there.  Distances of returned candidates are exact;
    `d(self)=0` sorts first, preserving the self-at-column-0 layout
    `_boruvka_rank` expects.  Ties across buckets resolve by bucket
    position (not global index) in the final top-k.

    Returns (dist (Q, k) f32 ascending, idx (Q, k) i32).
    """
    Q, D = query.shape
    R = ref.shape[0]
    assert k <= nb, (k, nb)
    assert block_k % nb == 0

    bq = min(block_q, _round_up(Q, 128))
    bk = min(block_k, _round_up(R, nb))
    nq_pad = _round_up(Q, bq)
    nk_pad = _round_up(R, bk)

    qp = jnp.pad(query.astype(jnp.float32), ((0, nq_pad - Q), (0, 0)))
    rt = jnp.pad(ref.astype(jnp.float32).T, ((0, 0), (0, nk_pad - R)))

    qp = qp.reshape(nq_pad // bq, bq, D)
    rt = rt.reshape(D, nk_pad // bk, bk).swapaxes(0, 1)  # (nkb, D, bk)

    bd, bi = pl.pallas_call(
        functools.partial(_bucket_topk_kernel, bk=bk, nb=nb, n_ref=R),
        grid=(nq_pad // bq, nk_pad // bk),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda iq, ik: (iq, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, bk), lambda iq, ik: (ik, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, nb), lambda iq, ik: (iq, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, nb), lambda iq, ik: (iq, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq_pad // bq, bq, nb), jnp.float32),
            jax.ShapeDtypeStruct((nq_pad // bq, bq, nb), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, nb), jnp.float32),
            pltpu.VMEM((bq, nb), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * Q * R * D,
            bytes_accessed=(Q * D + (nq_pad // bq) * R * D) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qp, rt)

    bd = bd.reshape(nq_pad, nb)[:Q]
    bi = bi.reshape(nq_pad, nb)[:Q]
    neg, sel = jax.lax.top_k(-bd, k)                  # exact over buckets
    idx = jnp.take_along_axis(bi, sel, axis=1)
    dist = jnp.sqrt(jnp.maximum(-neg, 0.0))
    return dist, idx
