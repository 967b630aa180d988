"""Iterative camera-pose regression head.

Behavioural parity: `iggt/heads/camera_head.py:19-162`.  The head takes the
frame-wise camera tokens from the *last* aggregated layer, and runs
``num_iterations`` rounds of DiT-style AdaLN modulation + a 4-block
transformer trunk + an MLP delta on the 9-D ``absT_quaR_FoV`` encoding.

TPU design notes:
- The refinement loop has a data-dependent first step (learned empty pose vs
  previous estimate), so it is unrolled as a Python loop under jit; the
  trunk weights are shared across iterations so XLA deduplicates the
  compiled block body.
- The whole head runs in float32 (the reference disables autocast around all
  heads, `iggt/models/vggt.py:189`).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
from flax import linen as nn

from iggt_official_tpu.config import CameraHeadConfig
from iggt_official_tpu.heads.act import activate_pose
from iggt_official_tpu.layers.blocks import Block, Mlp


def modulate(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    """DiT-style modulation (`camera_head.py:157-162`)."""
    return x * (1 + scale) + shift


class CameraHead(nn.Module):
    """Predict per-frame 9-D camera encodings by iterative refinement."""

    cfg: CameraHeadConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array) -> List[jax.Array]:
        """tokens: last aggregated layer, (B, S, P, C).  Returns a list of
        ``num_iterations`` activated pose encodings, each (B, S, 9)."""
        cfg = self.cfg
        # camera token = token 0 of every frame (`camera_head.py:99`)
        pose_tokens = tokens[:, :, 0].astype(jnp.float32)
        B, S, C = pose_tokens.shape

        token_norm = nn.LayerNorm(epsilon=1e-5, name="token_norm")
        trunk_norm = nn.LayerNorm(epsilon=1e-5, name="trunk_norm")
        adaln_norm = nn.LayerNorm(
            epsilon=1e-6, use_bias=False, use_scale=False, name="adaln_norm"
        )
        embed_pose = nn.Dense(cfg.dim_in, name="embed_pose")
        modulation = nn.Dense(3 * cfg.dim_in, name="poseLN_modulation")
        pose_branch = Mlp(
            hidden_features=cfg.dim_in // 2,
            out_features=cfg.target_dim,
            name="pose_branch",
        )
        trunk = [
            Block(
                dim=cfg.dim_in,
                num_heads=cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio,
                init_values=cfg.init_values,
                name=f"trunk_{i}",
            )
            for i in range(cfg.trunk_depth)
        ]
        empty_pose = self.param(
            "empty_pose_tokens", nn.initializers.zeros, (1, 1, cfg.target_dim)
        )

        pose_tokens = token_norm(pose_tokens)

        pred: jax.Array | None = None
        out: List[jax.Array] = []
        for _ in range(cfg.num_iterations):
            if pred is None:
                module_input = embed_pose(
                    jnp.broadcast_to(empty_pose, (B, S, cfg.target_dim))
                )
            else:
                module_input = embed_pose(jax.lax.stop_gradient(pred))

            shift, scale, gate = jnp.split(
                modulation(nn.silu(module_input)), 3, axis=-1
            )
            x = gate * modulate(adaln_norm(pose_tokens), shift, scale)
            x = x + pose_tokens
            for blk in trunk:
                x = blk(x)
            delta = pose_branch(trunk_norm(x))
            pred = delta if pred is None else pred + delta
            out.append(
                activate_pose(
                    pred,
                    trans_act=cfg.trans_act,
                    quat_act=cfg.quat_act,
                    fl_act=cfg.fl_act,
                )
            )
        return out
