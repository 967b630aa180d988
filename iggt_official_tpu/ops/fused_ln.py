"""One-pass Pallas LayerNorm for the fp32 precision islands.

The trunk keeps LayerNorms in fp32 regardless of the bf16 residual stream
(reference torch-autocast behaviour, `iggt/layers/block.py:47,58`).  Under
XLA that lowers to convert->reduce->normalize fusion chains that cost
~1.35 ms per LN at the 8-view flagship shape — ~6x off the HBM roofline,
65 ms of a 720 ms step across the 96 trunk LNs.  This kernel reads each
row block once, computes mean/variance/normalize in fp32 VMEM registers,
and writes the downcast result — one HBM pass in, one out.

Inference-path only (no custom_vjp; the training step keeps nn.LayerNorm),
gated by ``ModelConfig.fused_ln``.
"""

from __future__ import annotations

import functools
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _ln_kernel(x_ref, g_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("eps", "out_dtype", "block_rows", "interpret")
)
def fused_layernorm(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    eps: float = 1e-5,
    out_dtype=None,
    block_rows: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """LayerNorm over the last axis, fp32 internals, single HBM pass.

    ``out_dtype`` defaults to ``x.dtype`` (the caller's residual dtype) —
    the downcast the Block applies after nn.LayerNorm is folded in.
    """
    shape = x.shape
    d = shape[-1]
    n = x.size // d
    xr = x.reshape(n, d)
    out_dtype = out_dtype or x.dtype
    rows = min(block_rows, n)
    grid = (pl.cdiv(n, rows),)
    y = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, d), lambda i: (i, 0)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((rows, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, d), out_dtype),
        interpret=interpret,
    )(xr, gamma, beta)
    return y.reshape(shape)


class FusedLN(nn.Module):
    """Drop-in for ``nn.LayerNorm(dtype=f32)(x).astype(out_dtype)`` with
    identical param names/shapes ("scale", "bias"); converters and
    checkpoints are unaffected."""

    eps: float = 1e-5
    out_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        return fused_layernorm(
            x, scale, bias, eps=self.eps,
            out_dtype=self.out_dtype or x.dtype,
            interpret=jax.default_backend() == "cpu",
        )
