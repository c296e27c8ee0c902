"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from llark_tpu.config import ModelConfig, TrainingArguments
from llark_tpu.models.fusion import init_llark_params, llark_forward
from llark_tpu.parallel.mesh import (
    AXES,
    make_mesh,
    param_partition_specs,
    param_shardings,
    shard_params,
)
from llark_tpu.special_tokens import IGNORE_INDEX
from llark_tpu.train.state import TrainState
from llark_tpu.train.step import (
    jit_train_step,
    make_optimizer,
    make_train_step,
    trainable_mask,
)

PATCH_ID = 7


def make_batch(B, S, T, mm, rng=None):
    rng = rng or np.random.RandomState(0)
    ids = np.full((B, S), 3, np.int32)
    ids[:, 1 : 1 + T] = PATCH_ID
    labels = np.where(np.arange(S)[None, :] >= S // 2, ids, IGNORE_INDEX).astype(np.int32)
    return {
        "input_ids": ids,
        "labels": labels,
        "seq_lengths": np.full((B,), S, np.int32),
        "audio_encodings": rng.randn(B, T, mm).astype(np.float32),
        "audio_frame_counts": np.full((B,), T, np.int32),
    }


@pytest.mark.parametrize("shape", [(8, 1, 1), (2, 2, 2), (1, 4, 2), (1, 8, 1)])
def test_sharded_train_step_runs(shape):
    cfg = ModelConfig.tiny(hidden_size=64, num_heads=4)
    mesh = make_mesh(shape)
    params = init_llark_params(cfg, jax.random.PRNGKey(0))
    specs = param_partition_specs(cfg)
    params = shard_params(mesh, params, specs)

    args = TrainingArguments(max_steps=10, learning_rate=1e-3)
    opt = make_optimizer(args, params)
    state = TrainState.create(params, opt)

    state_specs = jax.tree.map(
        lambda x: x.sharding if hasattr(x, "sharding") else None, params
    )
    train_step = make_train_step(cfg, opt, audio_patch_id=PATCH_ID, grad_accum_steps=2)

    batch = make_batch(16, 32, 4, cfg.mm_hidden_size)
    batch_shardings = jax.tree.map(
        lambda x: NamedSharding(
            mesh, P(AXES.batch, *([None] * (np.asarray(x).ndim - 1)))
        ),
        batch,
    )
    batch_dev = jax.tree.map(jax.device_put, batch, batch_shardings)

    with mesh:
        step_fn = jax.jit(train_step, donate_argnums=(0,))
        state2, metrics = step_fn(state, batch_dev)
        loss1 = float(metrics["loss"])
        state3, metrics2 = step_fn(state2, batch_dev)

    assert np.isfinite(loss1)
    assert int(state3.step) == 2
    assert float(metrics2["loss"]) < loss1 + 1.0  # sane continuation


def test_sharded_matches_single_device():
    """Same batch, same init: 8-way sharded step == single-device step."""
    cfg = ModelConfig.tiny(dtype="float32", param_dtype="float32")
    params = init_llark_params(cfg, jax.random.PRNGKey(0))
    args = TrainingArguments(max_steps=10, learning_rate=1e-3)
    opt = make_optimizer(args, params)
    batch = make_batch(8, 16, 2, cfg.mm_hidden_size)
    train_step = make_train_step(cfg, opt, audio_patch_id=PATCH_ID)

    # single device
    state = TrainState.create(params, opt)
    state1, m1 = jax.jit(train_step)(state, jax.tree.map(jnp.asarray, batch))

    # 8-way dp x fsdp
    mesh = make_mesh((2, 4, 1))
    specs = param_partition_specs(cfg)
    sparams = shard_params(mesh, params, specs)
    sstate = TrainState.create(sparams, opt)
    sbatch = jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(AXES.batch, *([None] * (np.asarray(x).ndim - 1))))
        ),
        batch,
    )
    with mesh:
        sstate1, m2 = jax.jit(train_step)(sstate, sbatch)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    # parameters after one step agree
    p1 = jax.tree.leaves(state1.params)
    p2 = jax.tree.leaves(sstate1.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_trainable_mask_freezing():
    cfg = ModelConfig.tiny()
    params = init_llark_params(cfg, jax.random.PRNGKey(0))
    mask = trainable_mask(params, tune_mm_mlp_adapter=True)
    assert mask["mm_projector"]["kernel"] is True
    assert mask["embed"] is True
    assert mask["layers"]["wq"] is False
    assert mask["final_norm_scale"] is False

    mask2 = trainable_mask(params, freeze_backbone=True)
    assert mask2["mm_projector"]["kernel"] is True
    assert mask2["embed"] is False


def test_frozen_params_do_not_move():
    cfg = ModelConfig.tiny()
    params = init_llark_params(cfg, jax.random.PRNGKey(0))
    args = TrainingArguments(max_steps=10, learning_rate=1e-2)
    opt = make_optimizer(args, params, tune_mm_mlp_adapter=True)
    state = TrainState.create(params, opt)
    step_fn = jax.jit(
        make_train_step(
            cfg,
            opt,
            audio_patch_id=PATCH_ID,
            trainable_token_start=cfg.vocab_size - 3,
        )
    )
    batch = jax.tree.map(jnp.asarray, make_batch(4, 16, 2, cfg.mm_hidden_size))
    # two steps: step 0 has lr=0 (warmup ramps from zero)
    state2, _ = step_fn(state, batch)
    state2, _ = step_fn(state2, batch)

    # backbone unchanged
    np.testing.assert_array_equal(
        np.asarray(state2.params["layers"]["wq"]), np.asarray(params["layers"]["wq"])
    )
    # projector moved
    assert not np.allclose(
        np.asarray(state2.params["mm_projector"]["kernel"]),
        np.asarray(params["mm_projector"]["kernel"]),
    )
    # original-vocab embedding rows unchanged; new rows may move
    e0 = np.asarray(params["embed"])
    e1 = np.asarray(state2.params["embed"])
    np.testing.assert_array_equal(e1[: cfg.vocab_size - 3], e0[: cfg.vocab_size - 3])
