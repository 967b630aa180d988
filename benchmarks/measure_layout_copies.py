"""Size the flagship step's layout-copy bucket with direct A/Bs.

Two suspects (PERF.md trace table, round 2: ~53 ms combined):

1. Flash-attention host-side layout: `to_bh` transpose (B,N,H,D)->(B*H,N,D)
   + pad-to-block + the inverse slice/transpose on the output, at the
   global-attention shape (B=1, N=8*1374, H=16, D=64, bf16).  Measured as
   (full `flash_attention`) - (bare `pallas_call` on pre-laid-out inputs).
2. Part-head window attention: SwinCA at (8, 148, 148, 256) fp32 and
   SwinSA at (8, 148, 148, 128) fp32 (the 8-view 518 px level-4x shapes,
   where 148 % 8 != 0 forces the edge-pad path the 504x336 demo res never
   takes).

Prints per-item medians; run with the chip otherwise idle.
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


def timeit(fn, *args, runs=20, warmup=2):
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
    parser.add_argument("--runs", type=int, default=20)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import importlib

    # ops/__init__ rebinds the submodule name to the jitted function, so a
    # plain `import ... as fa` would resolve to the function, not the module
    fa = importlib.import_module("iggt_official_tpu.ops.flash_attention")

    B, S, P, H, D = 1, 8, 1374, 16, 64
    N = S * P
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.bfloat16)

    full = jax.jit(lambda a, b, c: fa.flash_attention(a, b, c))
    t_full = timeit(full, q, k, v, runs=args.runs)

    # bare kernel on pre-laid-out inputs (the to_bh outputs), output left in
    # kernel layout: isolates the pallas_call itself
    bq = bk = 1024
    npad = fa._round_up(N, bq)

    def to_bh(x):
        x = jnp.swapaxes(x, 1, 2).reshape(B * H, N, D)
        return jnp.pad(x, ((0, 0), (0, npad - N), (0, 0)))

    qb, kb, vb = jax.jit(lambda a, b, c: (to_bh(a), to_bh(b), to_bh(c)))(
        q, k, v
    )
    qb, kb, vb = map(jax.block_until_ready, (qb, kb, vb))

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import math

    def bare(qb, kb, vb):
        return pl.pallas_call(
            functools.partial(
                fa._flash_kernel, bk=bk, n_keys=N,
                scale=1.0 / math.sqrt(D), has_bias=False,
            ),
            grid=(B * H, npad // bq, npad // bk),
            in_specs=[
                pl.BlockSpec((1, bq, D), lambda b, iq, ik: (b, iq, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk, D), lambda b, iq, ik: (b, ik, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk, D), lambda b, iq, ik: (b, ik, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, D), lambda b, iq, ik: (b, iq, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B * H, npad, D), qb.dtype),
            scratch_shapes=[
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, 1), jnp.float32),
                pltpu.VMEM((bq, D), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(qb, kb, vb)

    t_bare = timeit(jax.jit(bare), qb, kb, vb, runs=args.runs)
    print(f"flash full (incl. layout): {t_full*1e3:8.3f} ms")
    print(f"flash bare pallas_call   : {t_bare*1e3:8.3f} ms")
    print(f"layout overhead per call : {(t_full-t_bare)*1e3:8.3f} ms "
          f"(x24 blocks = {(t_full-t_bare)*24*1e3:.1f} ms/step)")

    # --- part-head window attention at the bench shapes -------------------
    from iggt_official_tpu.heads.window_attn import SwinCA, SwinSA

    Hm = Wm = 148
    xs = jnp.asarray(rng.standard_normal((S, Hm, Wm, 256)), jnp.float32)
    ks = jnp.asarray(rng.standard_normal((S, Hm, Wm, 256)), jnp.float32)
    ca = SwinCA(embed_dim=256, out_chans=256, num_heads=4, window_size=8)
    pca = jax.jit(ca.init)(jax.random.PRNGKey(0), xs, ks, ks)
    f_ca = jax.jit(lambda p, a, b: ca.apply(p, a, b, b))
    t_ca = timeit(f_ca, pca, xs, ks, runs=args.runs)
    print(f"SwinCA (8,148,148,256) fp32: {t_ca*1e3:8.3f} ms")

    xs2 = jnp.asarray(rng.standard_normal((S, Hm, Wm, 128)), jnp.float32)
    sa = SwinSA(embed_dim=128, out_chans=128, num_heads=4, window_size=8)
    psa = jax.jit(sa.init)(jax.random.PRNGKey(0), xs2)
    f_sa = jax.jit(lambda p, a: sa.apply(p, a))
    t_sa = timeit(f_sa, psa, xs2, runs=args.runs)
    print(f"SwinSA (8,148,148,128) fp32: {t_sa*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
