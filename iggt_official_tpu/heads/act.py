"""Output activations for pose and dense heads.

Behavioural parity: `iggt/heads/head_act.py:12-125`.  Dense maps here are
channels-last (B, H, W, C) — the TPU-native layout — whereas the reference
permutes from NCHW internally (`head_act.py:73-76`).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def inverse_log_transform(y: jax.Array) -> jax.Array:
    """sign(y) * expm1(|y|)  (`head_act.py:113-125`)."""
    return jnp.sign(y) * jnp.expm1(jnp.abs(y))


def base_pose_act(pose_enc: jax.Array, act_type: str = "linear") -> jax.Array:
    """`head_act.py:39-60`."""
    if act_type == "linear":
        return pose_enc
    if act_type == "inv_log":
        return inverse_log_transform(pose_enc)
    if act_type == "exp":
        return jnp.exp(pose_enc)
    if act_type == "relu":
        return jax.nn.relu(pose_enc)
    raise ValueError(f"Unknown act_type: {act_type}")


def activate_pose(
    pred_pose_enc: jax.Array,
    trans_act: str = "linear",
    quat_act: str = "linear",
    fl_act: str = "linear",
) -> jax.Array:
    """Per-component activation of the 9-D pose encoding (`head_act.py:12-36`)."""
    T = base_pose_act(pred_pose_enc[..., :3], trans_act)
    quat = base_pose_act(pred_pose_enc[..., 3:7], quat_act)
    fl = base_pose_act(pred_pose_enc[..., 7:], fl_act)
    return jnp.concatenate([T, quat, fl], axis=-1)


def activate_head(
    fmap: jax.Array,
    activation: str = "norm_exp",
    conf_activation: str = "expp1",
) -> Tuple[jax.Array, jax.Array]:
    """Split a (B, H, W, C) map into activated values + confidence.

    The last channel is confidence; the rest are the value channels.
    Matches `head_act.py:63-111` (which receives NCHW and permutes).
    """
    xyz = fmap[..., :-1]
    conf = fmap[..., -1]

    if activation == "norm_exp":
        d = jnp.maximum(jnp.linalg.norm(xyz, axis=-1, keepdims=True), 1e-8)
        pts3d = xyz / d * jnp.expm1(d)
    elif activation == "norm":
        pts3d = xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    elif activation == "exp":
        pts3d = jnp.exp(xyz)
    elif activation == "relu":
        pts3d = jax.nn.relu(xyz)
    elif activation == "inv_log":
        pts3d = inverse_log_transform(xyz)
    elif activation == "xy_inv_log":
        xy, z = xyz[..., :2], xyz[..., 2:3]
        z = inverse_log_transform(z)
        pts3d = jnp.concatenate([xy * z, z], axis=-1)
    elif activation == "sigmoid":
        pts3d = jax.nn.sigmoid(xyz)
    elif activation == "linear":
        pts3d = xyz
    else:
        raise ValueError(f"Unknown activation: {activation}")

    if conf_activation == "expp1":
        conf_out = 1 + jnp.exp(conf)
    elif conf_activation == "expp0":
        conf_out = jnp.exp(conf)
    elif conf_activation == "sigmoid":
        conf_out = jax.nn.sigmoid(conf)
    else:
        raise ValueError(f"Unknown conf_activation: {conf_activation}")

    return pts3d, conf_out
