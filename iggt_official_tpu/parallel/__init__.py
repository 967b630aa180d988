"""Device-mesh construction and sharding rules.

The reference's only parallelism is NCCL DDP (`utils/dist.py:19-80`); here
scale-out is single-controller JAX over a `jax.sharding.Mesh`:

- axis "data"  — batch data parallelism (replaces DDP).
- axis "seq"   — view/sequence parallelism: frame-attention batches and the
  global-attention token axis are sharded over it; XLA inserts the
  all-gathers for the O((S*P)^2) global attention over ICI.

`make_mesh` builds the mesh, `make_token_sharder` produces the constraint
hook consumed by the Aggregator, and `iggt_official_tpu.train.step` builds
the sharded training step on top.
"""

from iggt_official_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    make_token_sharder,
    replicated,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "make_token_sharder",
    "replicated",
]
