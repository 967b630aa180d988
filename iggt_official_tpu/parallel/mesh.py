"""Mesh construction + sharding specs for the IGGT trunk.

TPU-native replacement for the reference's NCCL DDP init
(`utils/dist.py:19-80`): a single-controller `jax.sharding.Mesh` with axes

    ("data", "seq", "model")

`data` carries batch parallelism (what DDP did); `seq` shards the view axis:
frame-attention runs on (B*S, P, C) whose batch dim is sharded over both
axes (embarrassingly parallel over views, `aggregator.py:277-306`), and
global attention runs on (B, S*P, C) with the token axis sharded over
`seq` — GSPMD all-gathers k/v over ICI for the O((S*P)^2) product
(`aggregator.py:308-336`), which is the blockwise-attention layout the
32-64-view InsScene config needs.

`model` is Megatron-style tensor parallelism (no reference counterpart —
the reference trains DDP-only): attention heads are sharded over "model"
inside the shard_map attention wrappers (`parallel/attention.py`), the
output projection and MLP run column/row-parallel via the param shardings
from :func:`tp_spec` (fc1 output-sharded, fc2 input-sharded, proj
input-sharded) with GSPMD inserting the psum at each row-parallel matmul.
Activations are replicated at block boundaries, matching the Megatron
layout; the `seq` sharding composes with it (tokens stay seq-sharded
through the tp blocks).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DATA = "data"
AXIS_SEQ = "seq"
AXIS_MODEL = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_seq: int = 1,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("data", "seq", "model") mesh over `devices` (default: all
    local).  Axes of size 1 are free — every spec that names them is a
    no-op, so callers can always build the 3-axis mesh."""
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if n_data is None:
        assert len(devices) % (n_seq * n_model) == 0, (
            len(devices), n_seq, n_model,
        )
        n_data = len(devices) // (n_seq * n_model)
    n_used = n_data * n_seq * n_model
    assert n_used <= len(devices), (n_data, n_seq, n_model, len(devices))
    grid = np.asarray(devices[:n_used]).reshape(n_data, n_seq, n_model)
    return Mesh(grid, (AXIS_DATA, AXIS_SEQ, AXIS_MODEL))


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


def tp_spec(path: Sequence[str], shape: Sequence[int], n_model: int) -> Optional[P]:
    """Megatron tensor-parallel partition spec for one parameter, or None
    if the parameter has no tp sharding.

    Column-parallel (output features over "model"): `mlp/fc1` — its bias
    is sharded too (each shard adds its own slice pre-activation).
    Row-parallel (input features over "model"): `mlp/fc2`, `attn/proj` —
    GSPMD psums their partial products; biases stay replicated and are
    added after the psum.  `attn/qkv` stays replicated: its (C, 3C) output
    layout interleaves q/k/v, so head sharding is instead imposed at the
    shard_map attention boundary (`parallel/attention.py`), where GSPMD
    reshards the (B, N, 3, H, D) activation once per block.
    """
    name = "/".join(path)
    if name.endswith("mlp/fc1/kernel") and shape[-1] % n_model == 0:
        return P(*([None] * (len(shape) - 1)), AXIS_MODEL)
    if name.endswith("mlp/fc1/bias") and shape[-1] % n_model == 0:
        return P(AXIS_MODEL)
    if (
        name.endswith("mlp/fc2/kernel") or name.endswith("attn/proj/kernel")
    ) and len(shape) == 2 and shape[0] % n_model == 0:
        return P(AXIS_MODEL, None)
    return None


def state_sharding(
    mesh: Mesh, tree, tp: bool = False, fsdp: bool = False
) -> object:
    """NamedSharding pytree for params (or a whole TrainState) combining
    tensor parallelism over "model" (:func:`tp_spec`) with FSDP/ZeRO-3
    over "data" (:func:`fsdp_spec`).  When both are on, the tp axis is
    assigned first and FSDP shards the largest remaining free axis —
    the standard 2D (fsdp x tp) layout.  Optimizer moments follow their
    parameters automatically because optax state mirrors the param tree.
    """
    n_data = mesh.shape[AXIS_DATA]
    n_model = dict(mesh.shape).get(AXIS_MODEL, 1)

    def leaf_sharding(path, x):
        shape = getattr(x, "shape", None)
        if shape is None:
            return NamedSharding(mesh, P())
        keys = tuple(str(getattr(k, "key", getattr(k, "name", k))) for k in path)
        spec = list(tp_spec(keys, shape, n_model) or [None] * len(shape)) if (
            tp and n_model > 1
        ) else [None] * len(shape)
        while len(spec) < len(shape):
            spec.append(None)
        if fsdp:
            cands = [
                i
                for i, s in enumerate(shape)
                if spec[i] is None and s % n_data == 0 and s >= n_data
            ]
            if cands:
                spec[max(cands, key=lambda i: shape[i])] = AXIS_DATA
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(leaf_sharding, tree)


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
