"""Transformer primitives: MLP, LayerScale, qk-norm MHA, pre-norm Block.

Behavioural parity:
- `Attention`: `iggt/layers/attention.py:21-77` (fused SDPA path, optional
  per-head-dim LayerNorm qk-norm, optional 2D RoPE on q/k).
- `Block`: `iggt/layers/block.py:27-107` (pre-norm, LayerScale residuals).
- `Mlp`: `iggt/layers/mlp.py` (fc1 -> GELU -> fc2).
- `SwiGLUFFN(Fused)`: `iggt/layers/swiglu_ffn.py` (w12 -> silu-gate -> w3).

TPU design notes:
- Q/K/V layout is (B, N, heads, head_dim); attention runs either as an XLA
  einsum-softmax (reference path) or a Pallas flash kernel
  (`iggt_official_tpu/ops/flash_attention.py`), selected per call.
- Compute dtype is configurable (bf16 trunk); LayerNorms and RoPE stay fp32,
  mirroring the reference autocast behaviour (`demo.py:191-195`).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from iggt_official_tpu.layers.rope import (
    Rope2DTables,
    apply_rope_2d,
    pack_rope_tables,
)

Dtype = jnp.dtype


class HeadLayerNorm(nn.Module):
    """fp32 LayerNorm over head_dim with nn.LayerNorm-compatible params.

    Calling with ``None`` returns the (scale, bias) params so the fused
    attention kernel can apply the identical normalization in-kernel
    (`ops/flash_attention.py:_ln_rope_block`); calling with an array applies
    the same fast-variance fp32 LN the XLA path uses.
    """

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Optional[jax.Array]):
        scale = self.param("scale", nn.initializers.ones, (self.dim,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,),
                          jnp.float32)
        if x is None:
            return scale, bias
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0
        )
        return (xf - mu) * jax.lax.rsqrt(var + self.eps) * scale + bias


def gelu_exact(x: jax.Array) -> jax.Array:
    """erf-based GELU (torch nn.GELU default; flax defaults to tanh approx)."""
    return nn.gelu(x, approximate=False)


def sdpa_xla(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Reference-path scaled-dot-product attention.

    q, k, v: (B, N, H, D) -> (B, N, H, D).  Softmax in fp32 for stability
    (matches torch SDPA numerics under autocast closely enough for parity).
    """
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


class Mlp(nn.Module):
    """fc1 -> act -> fc2 (`iggt/layers/mlp.py`)."""

    hidden_features: int
    out_features: Optional[int] = None
    bias: bool = True
    act: Callable = gelu_exact
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out_features = self.out_features or x.shape[-1]
        x = nn.Dense(self.hidden_features, use_bias=self.bias, dtype=self.dtype,
                     name="fc1")(x)
        x = self.act(x)
        x = nn.Dense(out_features, use_bias=self.bias, dtype=self.dtype,
                     name="fc2")(x)
        return x


class SwiGLUFFN(nn.Module):
    """w12 -> silu(x1)*x2 -> w3 (`iggt/layers/swiglu_ffn.py`, fused variant).

    Hidden sizing matches SwiGLUFFNFused: hidden = (2/3 * mlp_hidden + 7) // 8 * 8.
    """

    hidden_features: int
    bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out_features = x.shape[-1]
        hidden = (int(self.hidden_features * 2 / 3) + 7) // 8 * 8
        x12 = nn.Dense(2 * hidden, use_bias=self.bias, dtype=self.dtype,
                       name="w12")(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return nn.Dense(out_features, use_bias=self.bias, dtype=self.dtype,
                        name="w3")(nn.silu(x1) * x2)


class LayerScale(nn.Module):
    """Learnable per-channel residual scale (`iggt/layers/layer_scale.py`)."""

    dim: int
    init_values: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_values), (self.dim,)
        )
        return x * gamma.astype(x.dtype)


class Attention(nn.Module):
    """MHA with optional qk-norm (LayerNorm over head_dim) and 2D RoPE.

    Parity target: `iggt/layers/attention.py:21-77`.  RoPE tables are passed
    in (precomputed once per forward); `attn_fn` lets callers swap in the
    Pallas flash kernel.
    """

    dim: int
    num_heads: int
    qkv_bias: bool = True
    proj_bias: bool = True
    qk_norm: bool = False
    dtype: Dtype = jnp.float32
    # injected attention implementation (XLA softmax / Pallas flash / sharded);
    # a module attribute rather than a call arg so blocks stay remat-friendly
    attn_fn: Callable = sdpa_xla

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        rope: Optional[Rope2DTables] = None,
    ) -> jax.Array:
        B, N, C = x.shape
        head_dim = self.dim // self.num_heads

        qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        q_ln = k_ln = None
        if self.qk_norm:
            # LayerNorm over head_dim, affine, fp32 (torch autocast behaviour)
            q_ln = HeadLayerNorm(head_dim, name="q_norm")
            k_ln = HeadLayerNorm(head_dim, name="k_norm")

        if getattr(self.attn_fn, "supports_fused_qk_prep", False) and (
            rope is not None or self.qk_norm
        ):
            # hand raw q/k to the kernel: the fp32 LN + rotation run on the
            # VMEM-resident blocks, skipping the XLA pre-pass HBM round trip
            norm_params = None
            if self.qk_norm:
                gq, bq = q_ln(None)
                gk, bk = k_ln(None)
                norm_params = (gq, bq, gk, bk)
            cos = sin = None
            if rope is not None:
                cos, sin = pack_rope_tables(rope)
            out = self.attn_fn(
                q, k, v, rope_cos=cos, rope_sin=sin,
                qk_norm_params=norm_params,
            )
        else:
            if self.qk_norm:
                q = q_ln(q).astype(self.dtype)
                k = k_ln(k).astype(self.dtype)
            if rope is not None:
                q = apply_rope_2d(q, rope)
                k = apply_rope_2d(k, rope)
            out = self.attn_fn(q, k, v)
        out = out.reshape(B, N, C)
        return nn.Dense(self.dim, use_bias=self.proj_bias, dtype=self.dtype,
                        name="proj")(out)


class CrossAttention(nn.Module):
    """croco-style cross-attention: q from `query`, k/v from a context map.

    Parity target: `iggt/heads/block.py:190-244` (``CrossAttention`` /
    ``MemEffCrossAttention`` without rope/qk-norm, the configuration used by
    the Part head's pyramid-feature injections, `iggt/heads/part_head.py:68-84`).
    """

    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32
    # fused-attention implementation; the default dispatcher picks the Pallas
    # flash kernel on TPU at long sequences (the Part head's level-2x
    # injection attends over 74x74 maps, where materializing the fp32 logits
    # costs gigabytes of HBM traffic) and exact XLA softmax elsewhere
    attn_fn: Optional[Callable] = None

    @nn.compact
    def __call__(
        self, query: jax.Array, key: jax.Array, value: jax.Array
    ) -> jax.Array:
        B, Nq, C = query.shape
        hd = self.dim // self.num_heads
        q = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                     name="projq")(query).reshape(B, Nq, self.num_heads, hd)
        k = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                     name="projk")(key).reshape(B, -1, self.num_heads, hd)
        v = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                     name="projv")(value).reshape(B, -1, self.num_heads, hd)
        if self.attn_fn is None:
            from iggt_official_tpu.ops.flash_attention import attention as attn_fn
        else:
            attn_fn = self.attn_fn
        out = attn_fn(q, k, v).reshape(B, Nq, C)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class Block(nn.Module):
    """Pre-norm transformer block with LayerScale residuals.

    Parity target: `iggt/layers/block.py:27-107` (inference path; drop-path
    is identity at eval and stochastic depth is not used by the shipped
    checkpoints' inference).
    """

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    proj_bias: bool = True
    ffn_bias: bool = True
    init_values: Optional[float] = None
    qk_norm: bool = False
    ffn_layer: str = "mlp"  # "mlp" | "swiglu"
    dtype: Dtype = jnp.float32
    # torch nn.LayerNorm default; the DINOv2 ViT overrides to 1e-6
    ln_eps: float = 1e-5
    attn_fn: Callable = sdpa_xla
    # single-HBM-pass Pallas LayerNorm for the fp32 islands (inference
    # paths; the kernel has no custom_vjp so training keeps nn.LayerNorm)
    fused_ln: bool = False

    def _pre_norm(self, x: jax.Array, name: str) -> jax.Array:
        if self.fused_ln:
            from iggt_official_tpu.ops.fused_ln import FusedLN

            return FusedLN(eps=self.ln_eps, out_dtype=self.dtype,
                           name=name)(x)
        return nn.LayerNorm(
            epsilon=self.ln_eps, dtype=jnp.float32, name=name
        )(x).astype(self.dtype)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        rope: Optional[Rope2DTables] = None,
    ) -> jax.Array:
        attn_out = Attention(
            dim=self.dim, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            proj_bias=self.proj_bias, qk_norm=self.qk_norm, dtype=self.dtype,
            attn_fn=self.attn_fn, name="attn",
        )(
            self._pre_norm(x, "norm1"),
            rope=rope,
        )
        if self.init_values is not None:
            attn_out = LayerScale(self.dim, self.init_values, name="ls1")(attn_out)
        x = x + attn_out

        if self.ffn_layer == "mlp":
            ffn = Mlp(hidden_features=int(self.dim * self.mlp_ratio),
                      bias=self.ffn_bias, dtype=self.dtype, name="mlp")
        elif self.ffn_layer == "swiglu":
            ffn = SwiGLUFFN(hidden_features=int(self.dim * self.mlp_ratio),
                            bias=self.ffn_bias, dtype=self.dtype, name="mlp")
        else:
            raise ValueError(f"unknown ffn_layer {self.ffn_layer}")

        mlp_out = ffn(self._pre_norm(x, "norm2"))
        if self.init_values is not None:
            mlp_out = LayerScale(self.dim, self.init_values, name="ls2")(mlp_out)
        return x + mlp_out
