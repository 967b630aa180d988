"""Full training loop: data -> sharded step -> telemetry -> checkpoints.

The reference ships training utilities but no loop (`README.md:37-42`
TODO); this is the assembled TPU-native trainer: optimizer with layer
decay + warmup-cosine, the pjit train step over a ("data", "seq") mesh,
MetricLogger telemetry, and periodic orbax checkpointing with resume
(covering `iggt/datasets/utils/misc.py:295-333`'s save/load_model roles).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Iterable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from iggt_official_tpu.parallel.mesh import batch_sharding, make_mesh
from iggt_official_tpu.train.step import TrainState, make_optimizer, make_train_step
from iggt_official_tpu.utils.logging import MetricLogger


def train(
    model,
    batches: Iterable[Dict[str, np.ndarray]],
    num_steps: int,
    *,
    init_batch: Optional[Dict[str, np.ndarray]] = None,
    mesh=None,
    base_lr: float = 1e-4,
    weight_decay: float = 0.05,
    layer_decay: Optional[float] = 0.9,
    num_layers: int = 24,
    warmup_steps: int = 1000,
    grad_clip: float = 1.0,
    fsdp: bool = False,
    loss_weights: Optional[Dict[str, float]] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 1000,
    resume: bool = True,
    log_every: int = 50,
    rng_seed: int = 0,
    print_fn=print,
) -> TrainState:
    """Run `num_steps` of training; returns the final TrainState."""
    batches = iter(batches)
    if init_batch is None:
        init_batch = next(batches)

    params = model.init(
        jax.random.PRNGKey(rng_seed), jnp.asarray(init_batch["images"])
    )["params"]
    tx = make_optimizer(
        params,
        base_lr=base_lr,
        weight_decay=weight_decay,
        layer_decay=layer_decay,
        num_layers=num_layers,
        warmup_steps=warmup_steps,
        total_steps=num_steps,
        grad_clip=grad_clip,
    )
    state = TrainState.create(params, tx)

    start_step = 0
    if checkpoint_dir and resume:
        latest = _latest_checkpoint(checkpoint_dir)
        if latest is not None:
            from iggt_official_tpu.utils.checkpoint import load_checkpoint

            restored = load_checkpoint(
                latest, target={"params": state.params,
                                "opt_state": state.opt_state,
                                "step": state.step},
            )
            state = state.replace(**restored)
            start_step = int(state.step)
            print_fn(f"resumed from {latest} at step {start_step}")

    from iggt_official_tpu.parallel.mesh import AXIS_MODEL

    tp = mesh is not None and dict(mesh.shape).get(AXIS_MODEL, 1) > 1
    if mesh is not None and (fsdp or tp):
        # shard params + optimizer moments: "data" axis when fsdp (ZeRO-3
        # equivalent), tp_spec over "model" when the mesh has a tp axis
        from iggt_official_tpu.parallel.mesh import state_sharding

        state = jax.device_put(
            state, state_sharding(mesh, state, tp=tp, fsdp=fsdp)
        )
        step_fn = make_train_step(
            model, mesh=mesh, loss_weights=loss_weights, fsdp=fsdp,
            example_state=state,
        )
    else:
        step_fn = make_train_step(model, mesh=mesh, loss_weights=loss_weights)
    sharding = batch_sharding(mesh) if mesh is not None else None

    logger = MetricLogger(print_fn=print_fn)
    for step_idx in range(start_step, num_steps):
        batch = init_batch if step_idx == start_step and start_step == 0 else next(batches)
        if sharding is not None:
            batch = {k: jax.device_put(v, sharding) for k, v in batch.items()}
        state, metrics = step_fn(state, batch)
        logger.update(**{k: float(v) for k, v in metrics.items()})
        if step_idx % log_every == 0:
            print_fn(f"step {step_idx}: {logger}")
        if (
            checkpoint_dir
            and (step_idx + 1) % checkpoint_every == 0
        ):
            _save(checkpoint_dir, step_idx + 1, state)
    if checkpoint_dir:
        _save(checkpoint_dir, num_steps, state)
    return state


def _save(checkpoint_dir: str, step: int, state: TrainState) -> None:
    from iggt_official_tpu.utils.checkpoint import save_checkpoint

    os.makedirs(checkpoint_dir, exist_ok=True)
    path = os.path.join(checkpoint_dir, f"step_{step:08d}")
    save_checkpoint(
        path,
        {"params": state.params, "opt_state": state.opt_state,
         "step": state.step},
    )


def _latest_checkpoint(checkpoint_dir: str) -> Optional[str]:
    if not os.path.isdir(checkpoint_dir):
        return None
    steps = [
        d for d in os.listdir(checkpoint_dir) if d.startswith("step_")
    ]
    if not steps:
        return None
    return os.path.join(checkpoint_dir, sorted(steps)[-1])
