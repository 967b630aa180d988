"""Ring attention at 96/128-view token counts on the 8-device CPU mesh.

VERDICT r3 task 10 (mesh half): the single chip covers <= 64 views at
504x336 measured (PERF.md); beyond that the ("data","seq","model") mesh
takes over via `make_ring_global_attention`.  Multi-chip hardware is not
available here, so this exercises the REAL ring collective shapes — the
per-shard ppermute rotations and online-softmax accumulation at the full
96/128-view sequence lengths (82,944 / 110,592 patch tokens) — on the
8-virtual-device CPU mesh, and records wall time + peak RSS.

Head count is reduced (--heads, default 2 of 16) to keep the 1-core CPU
host inside a usable time budget: the collective SHAPES scale with
sequence length and device count, which are kept real; per-head compute
is embarrassingly parallel and does not change the communication
pattern.  The TPU path replaces the CPU fallback's O(n_local^2) logits
buffer with the streaming flash kernel, so peak-memory numbers here are
a CPU-fallback property, not the TPU envelope.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=96)
    ap.add_argument("--heads", type=int, default=2)
    ap.add_argument("--dim", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", "cpu")

    from iggt_official_tpu.parallel.mesh import make_mesh
    from iggt_official_tpu.parallel.attention import (
        make_ring_global_attention,
    )

    P = 864  # patches per 504x336 view at /14
    N = args.views * P
    mesh = make_mesh(n_data=1, n_seq=8, n_model=1)
    ring = make_ring_global_attention(mesh)

    rng = np.random.default_rng(0)
    shape = (1, N, args.heads, args.dim)
    q = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

    t0 = time.perf_counter()
    out = ring(q, k, v)
    out.block_until_ready()
    wall = time.perf_counter() - t0

    peak_rss_gib = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20
    row = {
        "views": args.views,
        "tokens": N,
        "heads": args.heads,
        "devices": 8,
        "tokens_per_shard": N // 8,
        "wall_s": round(wall, 1),
        "peak_rss_gib": round(peak_rss_gib, 2),
        "finite": bool(jnp.isfinite(out.astype(jnp.float32)).all()),
    }
    print(json.dumps(row))


if __name__ == "__main__":
    main()
