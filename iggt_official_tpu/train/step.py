"""Sharded training step: AdamW + layer decay + cosine warmup over a mesh.

TPU-native replacement for the reference's training utilities
(`iggt/datasets/utils/misc.py`):
- ``NativeScalerWithGradNormCount`` (AMP GradScaler, `:249-276`)  ->  not
  needed: the trunk runs bf16 natively, grads/optimizer state stay fp32.
- ViT layer-decay param groups (`:391-450`)  ->  `layer_decay_mask` scaling
  per-depth learning rates through an optax multi-transform-free scaling
  tree.
- cosine + warmup LR (`:451-476`)  ->  `make_schedule`.
- DDP all-reduce (`:334-343`)  ->  implicit: gradients of replicated params
  under pjit are psum'd by GSPMD.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from iggt_official_tpu.parallel.mesh import (
    AXIS_DATA,
    AXIS_SEQ,
    batch_sharding,
    make_token_sharder,
    replicated,
)
from iggt_official_tpu.train.losses import total_loss


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            tx=tx,
        )

    def apply_gradients(self, grads):
        updates, opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=opt_state,
        )


def make_schedule(
    base_lr: float = 1e-4,
    warmup_steps: int = 1000,
    total_steps: int = 100_000,
    min_lr: float = 1e-6,
) -> optax.Schedule:
    """Linear warmup + cosine decay (`datasets/utils/misc.py:451-476`).

    Warmup starts at ``min_lr`` (not 0) so the very first optimizer step is
    not a silent no-op."""
    return optax.warmup_cosine_decay_schedule(
        init_value=min_lr,
        peak_value=base_lr,
        warmup_steps=warmup_steps,
        decay_steps=total_steps,
        end_value=min_lr,
    )


_BLOCK_RE = re.compile(r"(?:frame|global)_blocks_(\d+)|(?<!\w)blocks_(\d+)")


def _layer_id(path: Tuple[str, ...], num_layers: int) -> int:
    """ViT layer id for layer decay (`datasets/utils/misc.py:391-450`):
    embeddings -> 0, block i -> i+1, everything else -> num_layers."""
    name = "/".join(path)
    if "patch_embed" in name and "blocks" not in name:
        return 0
    m = _BLOCK_RE.search(name)
    if m:
        return int(m.group(1) or m.group(2)) + 1
    if "aggregator" in name:
        return 0 if ("token" in name or "pos_embed" in name) else num_layers
    return num_layers


def layer_decay_scales(params, decay: float = 0.9, num_layers: int = 24):
    """Per-leaf multiplicative LR scale tree."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def scale_for(path):
        keys = tuple(
            k.key if hasattr(k, "key") else str(k) for k in path
        )
        lid = _layer_id(keys, num_layers)
        return decay ** (num_layers - lid)

    scales = {jax.tree_util.keystr(p): scale_for(p) for p, _ in flat}
    return jax.tree_util.tree_map_with_path(
        lambda p, _: scales[jax.tree_util.keystr(p)], params
    )


def _no_decay(path: Tuple, leaf) -> bool:
    """bias / norm / token params are excluded from weight decay."""
    name = "/".join(str(getattr(k, "key", k)) for k in path).lower()
    return (
        leaf.ndim <= 1
        or "token" in name
        or "pos_embed" in name
        or name.endswith("gamma")
    )


def make_optimizer(
    params,
    base_lr: float = 1e-4,
    weight_decay: float = 0.05,
    layer_decay: Optional[float] = None,
    num_layers: int = 24,
    warmup_steps: int = 1000,
    total_steps: int = 100_000,
    grad_clip: float = 1.0,
) -> optax.GradientTransformation:
    schedule = make_schedule(base_lr, warmup_steps, total_steps)
    wd_mask = jax.tree_util.tree_map_with_path(
        lambda p, x: not _no_decay(p, x), params
    )
    chain = [
        optax.clip_by_global_norm(grad_clip),
        optax.scale_by_adam(b1=0.9, b2=0.95),
        optax.add_decayed_weights(weight_decay, mask=wd_mask),
    ]
    if layer_decay is not None:
        scales = layer_decay_scales(params, layer_decay, num_layers)
        chain.append(
            optax.GradientTransformation(
                init=lambda _: optax.EmptyState(),
                update=lambda u, s, p=None: (
                    jax.tree.map(lambda g, m: g * m, u, scales),
                    s,
                ),
            )
        )
    chain.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*chain)


def make_train_step(
    model,
    mesh: Optional[Mesh] = None,
    loss_weights: Optional[Dict[str, float]] = None,
    fsdp: bool = False,
    example_state: Optional[TrainState] = None,
) -> Callable:
    """Build the (optionally pjit-sharded) train step.

    batch dict: images (B,S,H,W,3) + any of pose_enc (B,S,9),
    depth (B,S,H,W,1), world_points (B,S,H,W,3), valid_mask (B,S,H,W),
    instance_ids (B,S,H,W).  Batch is sharded (data, seq).

    ``fsdp=False``: params and optimizer state are replicated; GSPMD psums
    the gradients (the DDP equivalent) and all-gathers global-attention
    k/v over "seq".

    ``fsdp=True`` (requires ``example_state`` for leaf shapes): params and
    optimizer moments are sharded over the "data" axis per
    :func:`~iggt_official_tpu.parallel.mesh.fsdp_spec`; GSPMD all-gathers
    weights just-in-time per layer and reduce-scatters gradients, cutting
    per-device parameter+optimizer memory ~n_data-fold (ZeRO-3
    equivalent, no reference counterpart — the reference trains DDP-only,
    `utils/dist.py:19-80`).

    When the mesh's "model" axis is >1, Megatron tensor parallelism is
    additionally active (also requires ``example_state``): MLP fc1 runs
    column-parallel and fc2/attn-proj row-parallel over "model" per
    :func:`~iggt_official_tpu.parallel.mesh.tp_spec` (GSPMD inserts the
    row-parallel psums), composing with the shard_map head split in the
    attention wrappers and, when ``fsdp=True``, with the data-axis ZeRO-3
    sharding (the 2D fsdp x tp layout of
    :func:`~iggt_official_tpu.parallel.mesh.state_sharding`).
    """
    shard_fn = make_token_sharder(mesh) if mesh is not None else None
    if mesh is not None:
        # explicit shard_map attention: GSPMD cannot partition the Pallas
        # flash custom call, so the frame blocks run batch-sharded local
        # attention and the global blocks all-gather K/V over "seq"
        from iggt_official_tpu.parallel.attention import make_mesh_attention_fns

        frame_attn, global_attn = make_mesh_attention_fns(mesh)
    else:
        frame_attn = global_attn = None

    def step(state: TrainState, batch: Dict[str, jax.Array]):
        def loss_fn(params):
            kwargs = {}
            if frame_attn is not None:
                kwargs = dict(attn_fn=frame_attn, global_attn_fn=global_attn)
            preds = model.apply(
                {"params": params},
                batch["images"],
                remat=True,
                shard_fn=shard_fn,
                **kwargs,
            )
            return total_loss(preds, batch, loss_weights)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    from iggt_official_tpu.parallel.mesh import AXIS_MODEL

    tp = dict(mesh.shape).get(AXIS_MODEL, 1) > 1
    if fsdp or tp:
        assert example_state is not None, (
            "fsdp=True / model-axis>1 needs example_state"
        )
        from iggt_official_tpu.parallel.mesh import state_sharding

        state_shardings = state_sharding(mesh, example_state, tp=tp, fsdp=fsdp)
        return jax.jit(
            step,
            in_shardings=(state_shardings, batch_sharding(mesh)),
            out_shardings=(state_shardings, replicated(mesh)),
            donate_argnums=(0,),
        )

    # pytree-prefix shardings: state fully replicated (grads psum'd by
    # GSPMD — the DDP equivalent), every batch tensor (data, seq)-sharded
    return jax.jit(
        step,
        in_shardings=(replicated(mesh), batch_sharding(mesh)),
        donate_argnums=(0,),
    )
