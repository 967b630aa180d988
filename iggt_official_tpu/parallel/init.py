"""Multi-host initialization: the TPU-native replacement for DDP init.

The reference discovers ranks from env/SLURM and calls
``torch.distributed.init_process_group(backend='nccl')`` + barrier
(`utils/dist.py:19-80`, duplicate at `iggt/datasets/utils/misc.py:225-246`).
On TPU pods the single-controller equivalent is:

1. ``jax.distributed.initialize`` — one call per host process; coordinator
   address/rank discovered from the environment exactly like the reference
   (explicit env vars first, SLURM second, single-process fallback third).
2. A global ("data", "seq") mesh over ALL hosts' devices via
   ``jax.sharding.Mesh``: the data axis spans hosts (gradient psums ride
   DCN between slices / ICI within), the seq axis is kept inside a host's
   ICI domain so ring/all-gather attention collectives never cross DCN.

After initialization the rest of the package is unchanged: `pjit` over the
global mesh handles what DDP did (rank-sliced samplers use
``process_index``/``process_count`` below).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence

import numpy as np


@dataclasses.dataclass(frozen=True)
class DistributedEnv:
    """Resolved process topology (reference `utils/dist.py:19-66`)."""

    coordinator_address: Optional[str]  # None = single process
    num_processes: int
    process_id: int
    local_device_ids: Optional[Sequence[int]] = None

    @property
    def distributed(self) -> bool:
        return self.num_processes > 1


def discover_env(default_port: int = 8476) -> DistributedEnv:
    """Rank discovery with the reference's precedence: explicit env vars
    (`utils/dist.py:20-36`), then SLURM (`:37-55`), else single process
    (`:58-63`).

    Env vars (JAX-native names first, torch-style accepted):
      COORDINATOR_ADDRESS / MASTER_ADDR(:MASTER_PORT)
      NUM_PROCESSES / WORLD_SIZE;  PROCESS_ID / RANK
    """
    addr = os.environ.get("COORDINATOR_ADDRESS")
    if addr is None and os.environ.get("MASTER_ADDR"):
        port = os.environ.get("MASTER_PORT", str(default_port))
        addr = f"{os.environ['MASTER_ADDR']}:{port}"

    world = os.environ.get("NUM_PROCESSES") or os.environ.get("WORLD_SIZE")
    rank = os.environ.get("PROCESS_ID") or os.environ.get("RANK")
    if world not in (None, "") and rank not in (None, ""):
        return DistributedEnv(addr, int(world), int(rank))

    if "SLURM_PROCID" in os.environ:
        world = int(os.environ["SLURM_NPROCS"])
        rank = int(os.environ["SLURM_PROCID"])
        if addr is None:
            nodelist = os.environ.get("SLURM_JOB_NODELIST", "")
            first = _first_slurm_node(nodelist)
            if first:
                addr = f"{first}:{default_port}"
        return DistributedEnv(addr, world, rank)

    return DistributedEnv(None, 1, 0)


def _first_slurm_node(nodelist: str) -> Optional[str]:
    """First hostname of a SLURM nodelist like ``node[3-17,21]`` or
    ``a,b,c`` (reference `utils/dist.py:45-50` via util.hostlist)."""
    if not nodelist:
        return None
    head = nodelist.split(",")[0]
    if "[" in head:
        prefix, rest = head.split("[", 1)
        first = rest.rstrip("]").split(",")[0].split("-")[0]
        return prefix + first
    return head


def initialize(env: Optional[DistributedEnv] = None) -> DistributedEnv:
    """``jax.distributed.initialize`` from the discovered topology.

    Idempotent; a no-op for single-process runs (matching the reference's
    'Not using distributed mode' branch, `utils/dist.py:58-63`).  The
    implicit barrier the reference performs (`:78-80`) happens inside
    jax.distributed.initialize (all processes connect to the coordinator
    before any returns).
    """
    import jax

    env = env or discover_env()
    if not env.distributed:
        return env
    jax.distributed.initialize(
        coordinator_address=env.coordinator_address,
        num_processes=env.num_processes,
        process_id=env.process_id,
        local_device_ids=env.local_device_ids,
    )
    return env


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()


def make_global_mesh(
    n_seq: int = 1, n_model: int = 1, devices: Optional[Sequence] = None
):
    """Global ("data", "seq", "model") mesh over all hosts' devices — the
    same axis set as the single-host :func:`~parallel.mesh.make_mesh`, so
    specs written against one work on the other.

    Device order groups each host's devices contiguously along the data
    axis, and the seq x model axes divide a single host's local devices —
    model innermost (highest-bandwidth neighbours), so the per-layer tp
    collectives and the seq collectives (all-gather KV / ppermute ring)
    stay on ICI and the data-axis gradient psum is the only DCN traffic —
    the layout the scaling playbook prescribes for attention sharding.
    """
    import jax

    from iggt_official_tpu.parallel.mesh import AXIS_DATA, AXIS_MODEL, AXIS_SEQ

    if devices is None:
        devices = jax.devices()  # global across processes, host-major
    devices = list(devices)
    n_local = len([d for d in devices if d.process_index == devices[0].process_index]) or len(devices)
    assert n_local % (n_seq * n_model) == 0, (
        f"seq x model axes ({n_seq} x {n_model}) must divide local device "
        f"count ({n_local}) to stay on ICI"
    )
    assert len(devices) % (n_seq * n_model) == 0
    grid = np.asarray(devices).reshape(
        len(devices) // (n_seq * n_model), n_seq, n_model
    )
    from jax.sharding import Mesh

    return Mesh(grid, (AXIS_DATA, AXIS_SEQ, AXIS_MODEL))
