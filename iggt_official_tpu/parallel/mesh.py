"""Mesh construction + sharding specs for the IGGT trunk.

TPU-native replacement for the reference's NCCL DDP init
(`utils/dist.py:19-80`): a single-controller `jax.sharding.Mesh` with axes

    ("data", "seq")

`data` carries batch parallelism (what DDP did); `seq` shards the view axis:
frame-attention runs on (B*S, P, C) whose batch dim is sharded over both
axes (embarrassingly parallel over views, `aggregator.py:277-306`), and
global attention runs on (B, S*P, C) with the token axis sharded over
`seq` — GSPMD all-gathers k/v over ICI for the O((S*P)^2) product
(`aggregator.py:308-336`), which is the blockwise-attention layout the
32-64-view InsScene config needs.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DATA = "data"
AXIS_SEQ = "seq"


def make_mesh(
    n_data: Optional[int] = None,
    n_seq: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("data", "seq") mesh over `devices` (default: all local)."""
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if n_data is None:
        assert len(devices) % n_seq == 0, (len(devices), n_seq)
        n_data = len(devices) // n_seq
    assert n_data * n_seq <= len(devices), (n_data, n_seq, len(devices))
    grid = np.asarray(devices[: n_data * n_seq]).reshape(n_data, n_seq)
    return Mesh(grid, (AXIS_DATA, AXIS_SEQ))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """images (B, S, H, W, 3): batch over data, views over seq."""
    return NamedSharding(mesh, P(AXIS_DATA, AXIS_SEQ))


def fsdp_spec(shape: Sequence[int], n_shards: int) -> P:
    """FSDP partition spec for one parameter: shard the largest axis
    divisible by the data-axis size (the standard JAX FSDP recipe — GSPMD
    then all-gathers weights just-in-time per layer and reduce-scatters
    gradients, cutting per-device param+optimizer memory ~n_data-fold)."""
    if not shape:
        return P()
    cands = [i for i, s in enumerate(shape) if s % n_shards == 0 and s >= n_shards]
    if not cands:
        return P()
    axis = max(cands, key=lambda i: shape[i])
    spec = [None] * len(shape)
    spec[axis] = AXIS_DATA
    return P(*spec)


def fsdp_sharding(mesh: Mesh, tree) -> object:
    """NamedSharding pytree for params (or a whole TrainState): every array
    leaf sharded per :func:`fsdp_spec` over the "data" axis; non-array /
    scalar leaves replicated.  Optimizer moments follow their parameters
    automatically because optax state mirrors the param tree."""
    n = mesh.shape[AXIS_DATA]

    def leaf_sharding(x):
        shape = getattr(x, "shape", None)
        if shape is None:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, fsdp_spec(shape, n))

    return jax.tree.map(leaf_sharding, tree)


def make_token_sharder(mesh: Mesh) -> Callable:
    """Constraint hook for the Aggregator's frame/global reshapes.

    view == "frame": tokens (B*S, P, C) — flattened batch over (data, seq).
    view == "global": tokens (B, S*P, C) — batch over data, tokens over seq.
    """

    frame = NamedSharding(mesh, P((AXIS_DATA, AXIS_SEQ), None, None))
    glob = NamedSharding(mesh, P(AXIS_DATA, AXIS_SEQ, None))

    def shard(tokens: jax.Array, view: str) -> jax.Array:
        return jax.lax.with_sharding_constraint(
            tokens, frame if view == "frame" else glob
        )

    return shard
