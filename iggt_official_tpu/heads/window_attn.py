"""HAT-style window attention used by the Part head.

Behavioural parity: `iggt/heads/window_sa.py:26-545`.
- ``SwinSA``: window *self*-attention wrapper — HAB block (plain windowed
  MHA + channel-attention conv branch scaled by 0.01 + MLP) inside a
  conv-residual body, then conv 64 -> out_chans tail.
- ``SwinCA``: overlapping-window *cross*-attention wrapper — OCAB block
  (query windows ws x ws, key/value overlapping windows
  (ws + ws*overlap_ratio)^2 with a relative-position bias) in the same body.

Reference quirks replicated or documented:
- HAB passes its relative-position index into ``MemEffAttention`` as the
  (unused) ``xpos`` argument (`window_sa.py:217`, `heads/block.py:151`), so
  the windowed self-attention has NO positional bias.  We match that: plain
  window attention.
- The reference's OCAB permutes q to NCHW *before* ``window_partition``
  (`window_sa.py:280-287`), which scrambles query windows across the channel
  dim — a deviation from upstream HAT that happens to keep shapes legal.
  The released checkpoint was *trained* with that scramble, so OCAB's
  default ``q_window_mode="reference"`` replicates it op-for-op (required
  for converted-weight parity; see tests/test_heads.py SwinCA/PartHead
  parity tests).  ``q_window_mode="hat"`` gives the spatially-correct
  upstream-HAT semantics for from-scratch training.
- ``shift_size`` is always 0 in the shipped config, so the shifted-window
  mask machinery (`window_sa.py:401-415`) is not needed at inference; we
  keep windows unshifted.

TPU design notes: window partition is pure reshape/transpose; attention over
(B*nw, 64, C) windows is a single batched MXU matmul.  Non-multiple-of-ws
inputs are symmetric-padded then cropped (the reference would simply crash).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from iggt_official_tpu.layers.blocks import Mlp, gelu_exact
from iggt_official_tpu.ops.conv import Conv2d


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """(B, H, W, C) -> (B*nh*nw, ws*ws, C) row-major windows."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, C)


def window_reverse(windows: jax.Array, ws: int, H: int, W: int) -> jax.Array:
    """(B*nh*nw, ws*ws, C) -> (B, H, W, C)."""
    C = windows.shape[-1]
    B = windows.shape[0] // ((H // ws) * (W // ws))
    x = windows.reshape(B, H // ws, W // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def scrambled_q_partition(q: jax.Array, ws: int) -> jax.Array:
    """The reference OCAB's q-window partition, op-for-op
    (`window_sa.py:280-287`).

    The reference permutes q to NCHW and then applies the NHWC
    ``window_partition`` followed by a flat ``.view(-1, ws*ws, C)``: windows
    are cut over the (C, H) dims with W acting as channels, and the final
    reshape reinterprets the buffer.  Spatially meaningless but exactly what
    the released checkpoint was trained with.  Requires C % ws == 0 and
    H % ws == 0 (the reference crashes otherwise).

    q: (B, H, W, C) -> (B*H*W/ws^2, ws*ws, C).
    """
    B, H, W, C = q.shape
    assert C % ws == 0 and H % ws == 0, (
        f"reference OCAB q-partition needs C({C}) and H({H}) % ws({ws}) == 0"
    )
    x = q.transpose(0, 3, 1, 2)  # NCHW, as the reference's permute(0,3,1,2)
    # reference window_partition applied verbatim to the NCHW tensor:
    x = x.reshape(B, C // ws, ws, H // ws, ws, W)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, W)
    # reference's final flat view(-1, ws*ws, C) buffer reinterpretation
    return x.reshape(-1, ws * ws, C)


def extract_overlapping_windows(x: jax.Array, ws: int, ows: int) -> jax.Array:
    """Overlapping ows x ows windows at stride ws (torch nn.Unfold parity).

    x: (B, H, W, C) with H, W multiples of ws -> (B*nh*nw, ows*ows, C).
    Equivalent to `window_sa.py:256-257,289-291` (pad (ows-ws)//2, stride ws).
    """
    B, H, W, C = x.shape
    p = (ows - ws) // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    nh, nw = H // ws, W // ws
    row_idx = (jnp.arange(nh) * ws)[:, None] + jnp.arange(ows)[None, :]
    col_idx = (jnp.arange(nw) * ws)[:, None] + jnp.arange(ows)[None, :]
    wins = xp[:, row_idx]            # (B, nh, ows, W+2p, C)
    wins = wins[:, :, :, col_idx]    # (B, nh, ows, nw, ows, C)
    wins = wins.transpose(0, 1, 3, 2, 4, 5)
    return wins.reshape(B * nh * nw, ows * ows, C)


def rpi_window_sa(ws: int) -> np.ndarray:
    """Relative-position index for ws x ws self-attn (`window_sa.py:388-399`)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def rpi_window_oca(ws: int, ows: int) -> np.ndarray:
    """Relative-position index: ws x ws queries vs ows x ows keys
    (`window_sa.py:500-523`)."""
    co = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    ce = np.stack(np.meshgrid(np.arange(ows), np.arange(ows), indexing="ij"))
    fo = co.reshape(2, -1)
    fe = ce.reshape(2, -1)
    rel = fe[:, None, :] - fo[:, :, None]  # (2, ws*ws, ows*ows)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += ws - ows + 1
    rel[:, :, 1] += ws - ows + 1
    rel[:, :, 0] *= ws + ows - 1
    return rel.sum(-1)


class WindowAttention(nn.Module):
    """Windowed MHA with a relative-position-bias table
    (`window_sa.py:83-121`).  x: (B_, N, C); bias index rpi: (N, N).

    NOTE: parity artifact only — the shipped model does NOT route HAB
    through this class (the reference computes the rpi bias but its
    checkpoint path never adds it, so HAB inlines bias-free attention);
    wiring this into HAB would BREAK converted-checkpoint parity."""

    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, rpi: jax.Array) -> jax.Array:
        B_, N, C = x.shape
        x = x.astype(self.dtype)
        hd = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(B_, N, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, self.num_heads),
        )
        bias = table[rpi.reshape(-1)].reshape(N, N, -1).transpose(2, 0, 1)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * hd**-0.5 + bias[None]
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B_, N, C)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class ChannelAttention(nn.Module):
    """Squeeze-excite channel gate (`window_sa.py:26-38`), NHWC."""

    features: int
    squeeze_factor: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = jnp.mean(x, axis=(-3, -2), keepdims=True)
        y = Conv2d(self.features // self.squeeze_factor, 1, dtype=self.dtype,
                   name="fc1")(y)
        y = nn.relu(y)
        y = Conv2d(self.features, 1, dtype=self.dtype, name="fc2")(y)
        return x * jax.nn.sigmoid(y)


class CAB(nn.Module):
    """Conv-attention branch of HAB (`window_sa.py:40-51`)."""

    features: int
    compress_ratio: int = 3
    squeeze_factor: int = 30
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = Conv2d(self.features // self.compress_ratio, 3, padding=1,
                   dtype=self.dtype, name="conv1")(x)
        y = gelu_exact(y)
        y = Conv2d(self.features, 3, padding=1, dtype=self.dtype,
                   name="conv2")(y)
        return ChannelAttention(self.features, self.squeeze_factor,
                                dtype=self.dtype, name="ca")(y)


def _pad_to_multiple(x: jax.Array, ws: int) -> Tuple[jax.Array, Tuple[int, int]]:
    H, W = x.shape[1], x.shape[2]
    ph = (-H) % ws
    pw = (-W) % ws
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    return x, (H, W)


class HAB(nn.Module):
    """Hybrid attention block (`window_sa.py:163-227`), NHWC in/out.

    Plain (bias-free) window self-attention + CAB conv branch * conv_scale
    + MLP, with pre-norms.  No shift (shipped config uses shift_size=0).
    """

    dim: int
    num_heads: int
    window_size: int = 8
    conv_scale: float = 0.01
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        x = x.astype(self.dtype)
        shortcut = x
        # pre-norms stay fp32 (precision island), outputs in compute dtype
        xn = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                          name="norm1")(x).astype(self.dtype)
        conv_x = CAB(self.dim, dtype=self.dtype, name="conv_block")(xn)

        xw, (H0, W0) = _pad_to_multiple(xn, self.window_size)
        Hp, Wp = xw.shape[1], xw.shape[2]
        wins = window_partition(xw, self.window_size)

        hd = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, use_bias=True, dtype=self.dtype,
                       name="attn_qkv")(wins)
        qkv = qkv.reshape(wins.shape[0], wins.shape[1], 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * hd**-0.5
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        attn = attn.reshape(wins.shape[0], wins.shape[1], C)
        attn = nn.Dense(self.dim, dtype=self.dtype, name="attn_proj")(attn)
        attn = window_reverse(attn, self.window_size, Hp, Wp)[:, :H0, :W0]

        x = shortcut + attn + conv_x * self.conv_scale
        x = x + Mlp(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                    name="mlp")(
            nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="norm2")(x).astype(self.dtype)
        )
        return x


class OCAB(nn.Module):
    """Overlapping-window cross-attention block (`window_sa.py:229-319`).

    Queries from ws x ws windows of x; keys/values from overlapping
    ows x ows windows of k/v (ows = ws + ws*overlap_ratio), with a learned
    relative-position bias.  All three inputs share one pre-norm, matching
    the reference's reuse of ``norm1`` (`window_sa.py:276-278`).

    ``q_window_mode``: "reference" (default) replicates the checkpoint's
    channel-scrambled q partition (`window_sa.py:280-287`); "hat" uses the
    spatially-correct upstream-HAT partition.
    """

    dim: int
    num_heads: int
    window_size: int = 8
    overlap_ratio: float = 0.5
    mlp_ratio: float = 2.0
    q_window_mode: str = "reference"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        ws = self.window_size
        ows = int(ws * self.overlap_ratio) + ws
        x = x.astype(self.dtype)
        shortcut = x

        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")
        xn = norm1(x).astype(self.dtype)
        kn = norm1(k).astype(self.dtype)
        vn = norm1(v).astype(self.dtype)

        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(xn)
        kk = nn.Dense(self.dim, dtype=self.dtype, name="k")(kn)
        vv = nn.Dense(self.dim, dtype=self.dtype, name="v")(vn)

        q, (H0, W0) = _pad_to_multiple(q, ws)
        kk, _ = _pad_to_multiple(kk, ws)
        vv, _ = _pad_to_multiple(vv, ws)
        Hp, Wp = q.shape[1], q.shape[2]

        if self.q_window_mode == "reference":
            qw = scrambled_q_partition(q, ws)              # (BN, ws*ws, C)
        else:
            qw = window_partition(q, ws)                   # (BN, ws*ws, C)
        kw = extract_overlapping_windows(kk, ws, ows)      # (BN, ows*ows, C)
        vw = extract_overlapping_windows(vv, ws, ows)

        hd = self.dim // self.num_heads
        BN, nq = qw.shape[0], qw.shape[1]
        nk = kw.shape[1]
        qh = qw.reshape(BN, nq, self.num_heads, hd)
        kh = kw.reshape(BN, nk, self.num_heads, hd)
        vh = vw.reshape(BN, nk, self.num_heads, hd)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((ws + ows - 1) ** 2, self.num_heads),
        )
        rpi = jnp.asarray(rpi_window_oca(ws, ows))
        bias = table[rpi.reshape(-1)].reshape(nq, nk, -1).transpose(2, 0, 1)

        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * hd**-0.5 + bias[None]
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(BN, nq, C)
        attn = window_reverse(attn, ws, Hp, Wp)[:, :H0, :W0]

        x = nn.Dense(self.dim, dtype=self.dtype, name="proj")(attn) + shortcut
        x = x + Mlp(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                    name="mlp")(
            nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="norm2")(x).astype(self.dtype)
        )
        return x


class SwinSA(nn.Module):
    """Window self-attention body + conv tail (`window_sa.py:321-435`).

    (B, H, W, C=embed_dim) -> (B, H, W, out_chans).
    """

    embed_dim: int
    out_chans: int
    num_heads: int = 4
    window_size: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        x = x.astype(self.dtype)
        feats = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="patch_norm")(
            x.reshape(B, H * W, C)
        ).reshape(B, H, W, C).astype(self.dtype)
        feats = HAB(
            self.embed_dim, self.num_heads, self.window_size,
            dtype=self.dtype, name="atten_block"
        )(feats)
        feats = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(
            feats.reshape(B, H * W, C)
        ).reshape(B, H, W, C).astype(self.dtype)
        x = Conv2d(self.embed_dim, 3, padding=1, dtype=self.dtype,
                   name="conv_after_body")(feats) + x
        x = Conv2d(64, 3, padding=1, dtype=self.dtype,
                   name="conv_before_upsample")(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        return Conv2d(self.out_chans, 3, padding=1, dtype=self.dtype,
                      name="conv_last")(x)


class SwinCA(nn.Module):
    """Overlapping-window cross-attention body + conv tail
    (`window_sa.py:439-545`).  (x, k, v) each (B, H, W, embed_dim)."""

    embed_dim: int
    out_chans: int
    num_heads: int = 4
    window_size: int = 8
    overlap_ratio: float = 0.5
    # SwinCA passes its own default mlp_ratio=4 down to OCAB
    # (`window_sa.py:448,484`), overriding OCAB's standalone default of 2.
    mlp_ratio: float = 4.0
    q_window_mode: str = "reference"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        x = x.astype(self.dtype)
        pn = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="patch_norm")

        def embed(t):
            return pn(t.reshape(B, H * W, C)).reshape(B, H, W, C).astype(
                self.dtype
            )

        feats = OCAB(
            self.embed_dim,
            self.num_heads,
            self.window_size,
            self.overlap_ratio,
            self.mlp_ratio,
            q_window_mode=self.q_window_mode,
            dtype=self.dtype,
            name="atten_block",
        )(embed(x), embed(k), embed(v))
        feats = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(
            feats.reshape(B, H * W, C)
        ).reshape(B, H, W, C).astype(self.dtype)
        x = Conv2d(self.embed_dim, 3, padding=1, dtype=self.dtype,
                   name="conv_after_body")(feats) + x
        x = Conv2d(64, 3, padding=1, dtype=self.dtype,
                   name="conv_before_upsample")(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        return Conv2d(self.out_chans, 3, padding=1, dtype=self.dtype,
                      name="conv_last")(x)
