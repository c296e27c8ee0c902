"""Pipeline parallelism (parallel/pipeline.py): the GPipe-scheduled
shard_map pipeline must be numerically identical to the single-device
scanned decoder — same loss, same gradients — and must train."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from llark_tpu.config import ModelConfig
from llark_tpu.models.fusion import causal_lm_loss, init_llark_params, llark_forward
from llark_tpu.parallel.pipeline import (
    make_pipeline_layers_fn,
    make_pp_mesh,
    make_pp_train_step,
    pp_param_specs,
)
from llark_tpu.special_tokens import IGNORE_INDEX
from llark_tpu.train.state import TrainState

PATCH_ID = 250


def _cfg(arch="llama", layers=4):
    return ModelConfig.tiny(
        arch=arch,
        num_layers=layers,
        dtype="float32",
        param_dtype="float32",
        remat=True,
    )


def _batch(cfg, b=4, s=32, n_frames=6, seed=0):
    rng = np.random.RandomState(seed)
    ids = rng.randint(4, 200, size=(b, s)).astype(np.int32)
    ids[:, 2 : 2 + n_frames] = PATCH_ID
    labels = ids.copy()
    labels[:, : 2 + n_frames] = IGNORE_INDEX
    return {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "seq_lengths": jnp.full((b,), s, jnp.int32),
        "audio_encodings": jnp.asarray(
            rng.randn(b, n_frames, cfg.mm_hidden_size).astype(np.float32)
        ),
        "audio_frame_counts": jnp.full((b,), n_frames, jnp.int32),
    }


def _reference_loss(cfg, params, batch):
    logits, _ = llark_forward(
        cfg,
        params,
        batch["input_ids"],
        audio_encodings=batch["audio_encodings"],
        audio_patch_id=PATCH_ID,
        audio_frame_counts=batch["audio_frame_counts"],
        seq_lengths=batch["seq_lengths"],
    )
    loss, _ = causal_lm_loss(logits, batch["labels"])
    return loss


@pytest.mark.parametrize(
    "arch,shape,micro",
    [("llama", (2, 4), 2), ("mpt", (4, 2), 1), ("llama", (1, 8), 4)],
)
def test_pp_loss_and_grads_match_single_device(arch, shape, micro):
    cfg = _cfg(arch, layers=8)
    params = init_llark_params(cfg, jax.random.PRNGKey(0))
    batch = _batch(cfg)
    mesh = make_pp_mesh(*shape)
    tx = optax.sgd(0.0)  # lr 0: step only computes loss/grads
    step = jax.jit(
        make_pp_train_step(
            cfg, tx, mesh, n_microbatches=micro, audio_patch_id=PATCH_ID
        )
    )
    state = TrainState.create(params, tx)
    _, metrics = step(state, batch)

    ref = _reference_loss(cfg, params, batch)
    assert np.allclose(float(metrics["loss"]), float(ref), atol=1e-5), (
        float(metrics["loss"]),
        float(ref),
    )

    ref_grads = jax.grad(lambda p: _reference_loss(cfg, p, batch))(params)
    pp_grads = jax.grad(
        lambda p: _pp_loss(cfg, mesh, micro, p, batch)
    )(params)
    flat_ref = jax.tree.leaves(ref_grads)
    flat_pp = jax.tree.leaves(pp_grads)
    assert len(flat_ref) == len(flat_pp)
    for a, b in zip(flat_ref, flat_pp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def _pp_loss(cfg, mesh, micro, params, batch):
    from llark_tpu.models.decoder import _norm, compute_logits
    from llark_tpu.models.fusion import build_inputs_embeds

    pipeline = make_pipeline_layers_fn(cfg, mesh, micro)
    embeds = build_inputs_embeds(
        cfg,
        params,
        batch["input_ids"],
        batch["audio_encodings"],
        PATCH_ID,
        batch["audio_frame_counts"],
        None,
    )
    b, s, _ = embeds.shape
    positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None, :], (b, s))
    hidden = pipeline(
        params["layers"], embeds.astype(jnp.float32), positions, batch["seq_lengths"]
    )
    hidden = _norm(cfg, hidden, params["final_norm_scale"], params.get("final_norm_bias"))
    logits = compute_logits(cfg, params, hidden, None)
    loss, _ = causal_lm_loss(logits, batch["labels"])
    return loss


def test_pp_training_reduces_loss():
    cfg = _cfg("llama", layers=4)
    params = init_llark_params(cfg, jax.random.PRNGKey(1))
    batch = _batch(cfg)
    mesh = make_pp_mesh(2, 4)
    tx = optax.adam(1e-3)
    step = jax.jit(
        make_pp_train_step(cfg, tx, mesh, n_microbatches=2, audio_patch_id=PATCH_ID)
    )
    state = TrainState.create(params, tx)
    losses = []
    for _ in range(12):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < 0.5 * losses[0], losses


def test_pp_specs_cover_param_tree():
    cfg = _cfg("mpt")
    params = init_llark_params(cfg, jax.random.PRNGKey(0))
    specs = pp_param_specs(cfg)
    # every param leaf has a spec leaf (tree prefixes resolve)
    jax.tree.map(lambda s, p: None, specs, params)


def test_pp_rejects_indivisible_layers():
    cfg = _cfg("llama", layers=6)
    mesh = make_pp_mesh(2, 4)
    with pytest.raises(ValueError, match="divisible"):
        make_pipeline_layers_fn(cfg, mesh, 2)
