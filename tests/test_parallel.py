"""Mesh sharding + sharded train step on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from iggt_official_tpu.config import ModelConfig
from iggt_official_tpu.models.vggt import IGGT, VGGT
from iggt_official_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    make_token_sharder,
)
from iggt_official_tpu.train.step import TrainState, make_optimizer, make_train_step


@pytest.fixture(scope="module")
def mesh(cpu_devices):
    assert len(cpu_devices) >= 8, "conftest must force 8 CPU devices"
    return make_mesh(n_data=2, n_seq=4, devices=cpu_devices[:8])


def _tiny_model(trunk_dtype="bfloat16"):
    import dataclasses

    cfg = ModelConfig().scaled(
        embed_dim=32, depth=2, num_heads=2, img_size=28, patch_embed="conv"
    )
    cfg = dataclasses.replace(cfg, trunk_dtype=trunk_dtype)
    return IGGT(cfg), cfg


def test_sharded_forward_matches_single_device(mesh):
    # fp32 trunk: isolates collective correctness from bf16 reduction noise
    # (the camera head's 4 recursive refinement iterations amplify any
    # input perturbation, so bf16 would need uselessly loose tolerances)
    model, cfg = _tiny_model(trunk_dtype="float32")
    rng = np.random.default_rng(0)
    B, S, H, W = 2, 4, 28, 28
    images = rng.uniform(0, 1, (B, S, H, W, 3)).astype(np.float32)

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(images))
    ref = model.apply(params, jnp.asarray(images))

    shard_fn = make_token_sharder(mesh)
    sharded_images = jax.device_put(images, batch_sharding(mesh))
    out = jax.jit(lambda p, x: model.apply(p, x, shard_fn=shard_fn))(
        params, sharded_images
    )
    # collectives reorder reductions; through the bf16 trunk that gives
    # ~1e-3-level drift, not bitwise equality
    for k in ["depth", "world_points", "pose_enc", "part_feat"]:
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(ref[k]), rtol=5e-3, atol=2e-3
        )


def test_sharded_train_step(mesh):
    model, cfg = _tiny_model()
    rng = np.random.default_rng(1)
    B, S, H, W = 2, 4, 28, 28
    batch = {
        "images": rng.uniform(0, 1, (B, S, H, W, 3)).astype(np.float32),
        "pose_enc": rng.normal(0, 1, (B, S, 9)).astype(np.float32),
        "depth": rng.uniform(0.5, 2, (B, S, H, W, 1)).astype(np.float32),
        "world_points": rng.normal(0, 1, (B, S, H, W, 3)).astype(np.float32),
        "valid_mask": np.ones((B, S, H, W), np.float32),
        "instance_ids": rng.integers(0, 4, (B, S, H, W)).astype(np.int32),
    }
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(batch["images"]))[
        "params"
    ]
    tx = make_optimizer(params, layer_decay=0.9, num_layers=cfg.aggregator.depth)
    state = TrainState.create(params, tx)

    step = make_train_step(model, mesh=mesh)
    sharded = {k: jax.device_put(v, batch_sharding(mesh)) for k, v in batch.items()}
    # host snapshot first: the step donates the state's buffers
    params_before = jax.tree.map(np.asarray, state.params)
    new_state, metrics = step(state, sharded)
    assert int(new_state.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    # params actually changed
    delta = jax.tree.reduce(
        lambda a, b: a + float(np.abs(b).sum()),
        jax.tree.map(lambda a, b: np.asarray(a) - b, new_state.params, params_before),
        0.0,
    )
    assert delta > 0

    # --- FSDP variant: params + optimizer moments sharded over "data" ---
    from iggt_official_tpu.parallel.mesh import fsdp_sharding

    params2 = jax.tree.map(jnp.asarray, params_before)
    state2 = TrainState.create(params2, tx)
    state2 = jax.device_put(state2, fsdp_sharding(mesh, state2))
    # at least one large leaf must actually be sharded over the data axis
    leaves = [x for x in jax.tree.leaves(state2.params) if x.size >= 64]
    assert any(
        not x.sharding.is_fully_replicated for x in leaves
    ), "fsdp_sharding left every large param replicated"

    fsdp_step = make_train_step(
        model, mesh=mesh, fsdp=True, example_state=state2
    )
    new_state2, metrics2 = fsdp_step(state2, sharded)
    assert int(new_state2.step) == 1
    # sharded-state updates must match the replicated (DDP-equivalent)
    # step up to collective reduction-order noise through the bf16 trunk
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=2e-3
        ),
        new_state2.params,
        new_state.params,
    )


def test_graft_entry_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_ring_attention_matches_all_gather(mesh):
    """The ppermute ring global attention computes the same softmax as the
    all-gather-KV baseline (online-softmax across ring steps)."""
    from iggt_official_tpu.parallel.attention import (
        make_global_attention,
        make_ring_global_attention,
    )

    rng = np.random.default_rng(7)
    B, N, H, D = 2, 64, 4, 16  # N divisible by n_seq=4
    q = jnp.asarray(rng.normal(0, 1, (B, N, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (B, N, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (B, N, H, D)).astype(np.float32))

    gather_fn = make_global_attention(mesh)
    ring_fn = make_ring_global_attention(mesh)
    ref = jax.jit(gather_fn)(q, k, v)
    out = jax.jit(ring_fn)(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_shard_map_attention_matches_local(mesh):
    """The explicit shard_map frame/global attention wrappers (the path
    multi-chip TPU needs, since GSPMD can't partition the Pallas call)
    match the unsharded forward."""
    import jax.numpy as jnp

    from iggt_official_tpu.parallel.attention import make_mesh_attention_fns

    model, cfg = _tiny_model(trunk_dtype="float32")
    rng = np.random.default_rng(5)
    B, S, H, W = 2, 4, 28, 28
    images = rng.uniform(0, 1, (B, S, H, W, 3)).astype(np.float32)

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(images))
    ref = model.apply(params, jnp.asarray(images))

    frame_fn, global_fn = make_mesh_attention_fns(mesh)
    sharded_images = jax.device_put(images, batch_sharding(mesh))
    out = jax.jit(
        lambda p, x: model.apply(
            p, x, attn_fn=frame_fn, global_attn_fn=global_fn,
            shard_fn=make_token_sharder(mesh),
        )
    )(params, sharded_images)
    for k in ["depth", "world_points", "part_feat"]:
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(ref[k]), rtol=5e-3, atol=2e-3
        )


def test_train_loop_fsdp(mesh, tmp_path):
    """train(fsdp=True) wires the ZeRO-3 step end to end: state sharded
    over "data" before the first step, checkpoints written, loss finite."""
    from iggt_official_tpu.train.loop import train

    model, cfg = _tiny_model()
    rng = np.random.default_rng(3)
    B, S, H, W = 2, 4, 28, 28

    def batches():
        while True:
            yield {
                "images": rng.uniform(0, 1, (B, S, H, W, 3)).astype(np.float32),
                "pose_enc": rng.normal(0, 1, (B, S, 9)).astype(np.float32),
                "depth": rng.uniform(0.5, 2, (B, S, H, W, 1)).astype(np.float32),
                "world_points": rng.normal(0, 1, (B, S, H, W, 3)).astype(np.float32),
                "valid_mask": np.ones((B, S, H, W), np.float32),
                "instance_ids": rng.integers(0, 4, (B, S, H, W)).astype(np.int32),
            }

    logs = []
    state = train(
        model, batches(), num_steps=2, mesh=mesh, fsdp=True,
        num_layers=cfg.aggregator.depth, warmup_steps=1, log_every=1,
        checkpoint_dir=str(tmp_path / "ck"), checkpoint_every=1,
        print_fn=logs.append,
    )
    assert int(state.step) == 2
    leaves = [x for x in jax.tree.leaves(state.params) if x.size >= 64]
    assert any(not x.sharding.is_fully_replicated for x in leaves)
    assert any("loss/total" in l for l in logs)


def test_train_step_tp_matches_replicated(cpu_devices):
    """Tensor parallelism over "model" (tp_spec column/row-parallel MLP +
    shard_map head split) takes the same step as the replicated DDP
    equivalent, and actually shards the MLP kernels over "model"."""
    from iggt_official_tpu.parallel.mesh import AXIS_MODEL, state_sharding

    tp_mesh = make_mesh(n_data=2, n_seq=2, n_model=2, devices=cpu_devices[:8])
    model, cfg = _tiny_model(trunk_dtype="float32")
    rng = np.random.default_rng(11)
    B, S, H, W = 2, 4, 28, 28
    batch = {
        "images": rng.uniform(0, 1, (B, S, H, W, 3)).astype(np.float32),
        "pose_enc": rng.normal(0, 1, (B, S, 9)).astype(np.float32),
        "depth": rng.uniform(0.5, 2, (B, S, H, W, 1)).astype(np.float32),
        "world_points": rng.normal(0, 1, (B, S, H, W, 3)).astype(np.float32),
        "valid_mask": np.ones((B, S, H, W), np.float32),
        "instance_ids": rng.integers(0, 4, (B, S, H, W)).astype(np.int32),
    }
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(batch["images"]))[
        "params"
    ]
    # host copies: both train steps donate their state, so each TrainState
    # needs fresh device buffers (jnp.asarray of a live jax array is a
    # no-op and would alias the buffers the first step deletes)
    params = jax.tree.map(np.asarray, params)
    tx = make_optimizer(params, layer_decay=0.9, num_layers=cfg.aggregator.depth)

    # reference: replicated step on a 2-axis-equivalent mesh (model=1)
    ref_mesh = make_mesh(n_data=2, n_seq=4, devices=cpu_devices[:8])
    state_ref = TrainState.create(jax.tree.map(jnp.asarray, params), tx)
    ref_step = make_train_step(model, mesh=ref_mesh)
    sharded_ref = {
        k: jax.device_put(v, batch_sharding(ref_mesh)) for k, v in batch.items()
    }
    new_ref, _ = ref_step(state_ref, sharded_ref)

    # tp step: make_train_step wires state_sharding(tp=True) itself
    state_tp = TrainState.create(jax.tree.map(jnp.asarray, params), tx)
    shardings = state_sharding(tp_mesh, state_tp, tp=True, fsdp=False)
    state_tp = jax.device_put(state_tp, shardings)
    # the fc1 kernels must be sharded over the model axis
    tp_sharded = [
        s.spec
        for s in jax.tree.leaves(shardings)
        if any(AXIS_MODEL in (ax if isinstance(ax, tuple) else (ax,))
               for ax in s.spec if ax is not None)
    ]
    assert tp_sharded, "state_sharding(tp=True) sharded nothing over 'model'"

    tp_step = make_train_step(model, mesh=tp_mesh, example_state=state_tp)
    sharded_tp = {
        k: jax.device_put(v, batch_sharding(tp_mesh)) for k, v in batch.items()
    }
    new_tp, metrics = tp_step(state_tp, sharded_tp)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=2e-3
        ),
        new_tp.params,
        new_ref.params,
    )


def test_head_indivisible_falls_back_local(cpu_devices):
    """A head count not divisible by the model axis degrades to local
    (replicated) heads instead of dying in shard_map's divisibility check."""
    from iggt_official_tpu.parallel.attention import make_frame_attention

    tp_mesh = make_mesh(n_data=2, n_seq=2, n_model=2, devices=cpu_devices[:8])
    rng = np.random.default_rng(13)
    B, N, H, D = 4, 16, 3, 8  # 3 heads, n_model=2: indivisible
    q = jnp.asarray(rng.normal(0, 1, (B, N, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (B, N, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (B, N, H, D)).astype(np.float32))

    from iggt_official_tpu.ops.flash_attention import attention

    fn = make_frame_attention(tp_mesh)
    out = jax.jit(fn)(q, k, v)
    ref = attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )
