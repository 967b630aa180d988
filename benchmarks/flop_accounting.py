"""FLOP-level accounting of the flagship 8-view forward (VERDICT r4 #6).

Throughput has been flat at ~11.2 views/s for three rounds.  This script
settles whether the residual is irreducible on this chip: it compares the
measured step time against the sum of per-bucket LOWER BOUNDS derived
from first principles (XLA's own flop/byte counts + the measured machine
ceilings: ~70 TF/s bf16 matmul peak, ~235 GB/s effective HBM bandwidth —
PERF.md "Hardware reality"), and prints where the remaining milliseconds
legally live.

Method:
- `compiled.cost_analysis()` gives XLA's total flops and bytes accessed
  for the whole jitted forward (one number each — XLA does not expose a
  per-op breakdown through this API);
- analytic flop counts for the attention stacks (the shapes are known)
  split the total into attention vs everything-else;
- each bucket's lower bound = max(flops / peak_flops, bytes / peak_bw)
  with the D=64 MXU-depth derate applied to attention (the 128x128
  systolic array runs half-depth contractions at half utilization —
  measured kernel ceiling 55 TF/s).

Writes benchmarks/flop_accounting.json.
"""

from __future__ import annotations

import json
import os
import os.path as op
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, op.join(op.dirname(op.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

PEAK_TFLOPS = 70.0          # measured bf16 matmul peak (PERF.md)
PEAK_BW_GBS = 235.0         # measured effective HBM bandwidth
ATTN_TFLOPS = 55.0          # measured flash-kernel ceiling at D=64


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from iggt_official_tpu.config import ModelConfig
    from iggt_official_tpu.models.vggt import IGGT
    from iggt_official_tpu.ops.flash_attention import attention

    B, S, H, W = 1, 8, 518, 518
    cfg = ModelConfig()
    model = IGGT(cfg)
    rng = np.random.default_rng(0)
    images = jax.device_put(jnp.asarray(
        rng.uniform(0, 1, (B, S, H, W, 3)).astype(np.float32)))
    init_images = jnp.asarray(
        rng.uniform(0, 1, (1, 2, 126, 126, 3)).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), init_images)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)
    fwd = jax.jit(lambda p, x: model.apply(p, x, attn_fn=attention))

    lowered = fwd.lower(params, images)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    total_flops = float(ca.get("flops", 0.0))
    total_bytes = float(ca.get("bytes accessed", 0.0))

    def sync(o):
        return np.asarray(o["depth"][:, :, :2, :2, 0])

    sync(fwd(params, images))
    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        out = fwd(params, images)
        sync(out)
        times.append(time.perf_counter() - t0)
    step_synced_s = statistics.median(times)
    # bench methodology: 5 pipelined dispatches, one sync — hides the
    # per-step host<->device tunnel round trip exactly like production
    # batch pipelines do
    t0 = time.perf_counter()
    for _ in range(5):
        out = fwd(params, images)
    sync(out)
    step_s = (time.perf_counter() - t0) / 5

    # ---- analytic attention flops ------------------------------------
    # tokens per view: 37x37 patches + 1 camera + num_register specials
    P = (H // 14) * (W // 14) + 1 + cfg.aggregator.num_register_tokens
    N = S * P
    heads, D = cfg.aggregator.num_heads, cfg.aggregator.embed_dim // cfg.aggregator.num_heads
    depth = cfg.aggregator.depth  # alternating frame/global pairs
    # per block: QK^T (2*N*N*D per head) + AV (same) -> 4*N^2*D*heads
    global_attn_flops = depth * 4 * N * N * D * heads
    frame_attn_flops = depth * S * 4 * P * P * D * heads
    attn_flops = global_attn_flops + frame_attn_flops
    other_flops = max(total_flops - attn_flops, 0.0)

    # ---- lower bounds ------------------------------------------------
    # The step floor is COMPUTE-side only: attention and the dense
    # matmuls serialize on the single MXU, each held to its measured
    # ceiling.  XLA's "bytes accessed" is an HLO-level operand count, not
    # HBM traffic — fused intermediates never leave VMEM — so it is an
    # UPPER bound on memory time and reported as a diagnostic, never as
    # part of the floor (dividing it by peak bandwidth exceeds the whole
    # measured step, which proves the overcount).
    t_attn_lb = attn_flops / (ATTN_TFLOPS * 1e12)
    t_other_compute_lb = other_flops / (PEAK_TFLOPS * 1e12)
    t_bw_diag = total_bytes / (PEAK_BW_GBS * 1e9)
    t_floor = t_attn_lb + t_other_compute_lb

    row = {
        "operating_point": "IGGT ViT-L/14, 8 views @ 518px, bf16 trunk",
        "measured_step_s": round(step_s, 4),
        "measured_step_synced_s": round(step_synced_s, 4),
        "views_per_sec": round(B * S / step_s, 2),
        "xla_total_tflop": round(total_flops / 1e12, 2),
        "xla_total_gb": round(total_bytes / 1e9, 2),
        "attn_tflop_analytic": round(attn_flops / 1e12, 2),
        "other_tflop": round(other_flops / 1e12, 2),
        "lower_bounds_s": {
            "attention_at_55tf": round(t_attn_lb, 4),
            "other_matmuls_at_70tf": round(t_other_compute_lb, 4),
            "step_floor_compute": round(t_floor, 4),
            "hlo_bytes_over_bw_diagnostic_s": round(t_bw_diag, 4),
        },
        "headroom_ms": round((step_s - t_floor) * 1e3, 1),
        "headroom_pct_of_step": round(100 * (step_s - t_floor) / step_s, 1),
        "machine": {"peak_tflops": PEAK_TFLOPS, "peak_bw_gbs": PEAK_BW_GBS,
                    "attn_kernel_tflops": ATTN_TFLOPS},
    }
    path = op.join(op.dirname(op.abspath(__file__)), "flop_accounting.json")
    with open(path, "w") as f:
        json.dump(row, f, indent=2)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
