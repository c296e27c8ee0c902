"""MoE routing + expert-parallel (EP) sharding tests.

The reference has no MoE (SURVEY.md §2.8 — EP absent from its
parallelism inventory); llark_tpu/models/moe.py adds a GShard/Switch
top-k MoE FFN whose expert dim shards over the "expert" mesh axis.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from llark_tpu.config import ModelConfig, TrainingArguments
from llark_tpu.models.decoder import init_decoder_params, init_kv_cache
from llark_tpu.models.fusion import init_llark_params, llark_forward
from llark_tpu.models.moe import expert_capacity, moe_ffn
from llark_tpu.parallel.mesh import (
    AXES,
    make_mesh,
    param_partition_specs,
    shard_params,
)
from llark_tpu.special_tokens import IGNORE_INDEX


def _moe_cfg(**kw):
    base = dict(
        moe_num_experts=4,
        moe_top_k=2,
        moe_capacity_factor=8.0,  # ample: no capacity drops
        dtype="float32",
        param_dtype="float32",
    )
    base.update(kw)
    return ModelConfig.tiny(**base)


def test_moe_ffn_matches_per_token_mixture():
    """Dense-dispatch MoE == explicit per-token top-k expert mixture."""
    cfg = _moe_cfg()
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    y = jax.random.normal(jax.random.PRNGKey(1), (2, 16, cfg.hidden_size))

    out, aux = moe_ffn(cfg, lp, y)
    probs = np.asarray(jax.nn.softmax(y @ lp["moe_router"], -1))
    yn = np.asarray(y)
    ref = np.zeros_like(np.asarray(out))
    for b in range(2):
        for s in range(16):
            for e in np.argsort(-probs[b, s])[: cfg.moe_top_k]:
                g = np.asarray(jax.nn.silu(yn[b, s] @ lp["moe_w_gate"][e]))
                u = yn[b, s] @ lp["moe_w_up"][e]
                ref[b, s] += probs[b, s, e] * np.asarray(
                    (g * u) @ lp["moe_w_down"][e]
                )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
    a = float(aux["aux_loss"])
    assert np.isfinite(a) and a >= 1.0 - 1e-6  # E·Σf·p ≥ 1
    # generous capacity + top-2 of 4: nothing dropped
    assert float(aux["dropped_frac"]) == 0.0


def test_capacity_drop_zeroes_overflow_tokens():
    """Tokens routed past an expert's static capacity contribute nothing
    (the residual stream still carries x; only the MLP delta is 0)."""
    cfg = _moe_cfg(moe_num_experts=2, moe_top_k=1, moe_capacity_factor=1e-9)
    assert expert_capacity(16, cfg) == 1  # one slot per expert
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    lp = jax.tree.map(lambda a: a[0], params["layers"])
    y = jax.random.normal(jax.random.PRNGKey(1), (1, 16, cfg.hidden_size))
    out, _ = moe_ffn(cfg, lp, y)
    # at most 2 tokens (1 per expert) can have non-zero output
    nonzero_rows = np.sum(np.any(np.abs(np.asarray(out[0])) > 0, axis=-1))
    assert nonzero_rows <= 2


def test_moe_decoder_train_step_and_aux_loss():
    """Full train step on a MoE decoder: finite loss, aux loss surfaced."""
    from llark_tpu.train.state import TrainState
    from llark_tpu.train.step import make_optimizer, make_train_step

    cfg = _moe_cfg(moe_capacity_factor=2.0)
    params = init_llark_params(cfg, jax.random.PRNGKey(0))
    B, S, T = 4, 32, 4
    rng = np.random.RandomState(0)
    ids = rng.randint(4, 250, size=(B, S)).astype(np.int32)
    ids[:, 1 : 1 + T] = 3
    labels = np.where(np.arange(S)[None, :] >= S // 2, ids, IGNORE_INDEX)
    batch = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels.astype(np.int32)),
        "seq_lengths": jnp.full((B,), S, jnp.int32),
        "audio_encodings": jnp.asarray(
            rng.randn(B, T, cfg.mm_hidden_size).astype(np.float32)
        ),
        "audio_frame_counts": jnp.full((B,), T, jnp.int32),
    }
    _, extras = llark_forward(
        cfg,
        params,
        batch["input_ids"],
        audio_encodings=batch["audio_encodings"],
        audio_patch_id=3,
        audio_frame_counts=batch["audio_frame_counts"],
        seq_lengths=batch["seq_lengths"],
    )
    assert isinstance(extras, dict) and np.isfinite(float(extras["moe_aux_loss"]))

    args = TrainingArguments(max_steps=10, learning_rate=1e-3)
    opt = make_optimizer(args, params)
    state = TrainState.create(params, opt)
    step_fn = jax.jit(
        make_train_step(cfg, opt, audio_patch_id=3, grad_accum_steps=2)
    )
    new_state, metrics = step_fn(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_moe_decode_matches_full_forward():
    """Prefill + per-token cached decode logits == full forward logits."""
    cfg = _moe_cfg(moe_capacity_factor=8.0)
    params = init_llark_params(cfg, jax.random.PRNGKey(0))
    from llark_tpu.generate import make_prefill_fn
    from llark_tpu.models.decoder import decoder_forward
    from llark_tpu.models.fusion import build_inputs_embeds

    B, S = 2, 12
    rng = np.random.RandomState(1)
    ids = jnp.asarray(rng.randint(4, 250, size=(B, S)).astype(np.int32))
    plen = jnp.full((B,), S, jnp.int32)

    full_logits, _ = llark_forward(
        cfg, params, ids, audio_patch_id=3, seq_lengths=plen
    )

    prefill = make_prefill_fn(cfg, audio_patch_id=3, max_cache_len=S + 4)
    half = S // 2
    logits_p, cache = prefill(params, ids[:, :half], jnp.full((B,), half, jnp.int32), None, None)
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(full_logits[:, half - 1]), atol=2e-4
    )
    # decode the second half token by token through the cache
    for t in range(half, S):
        emb = build_inputs_embeds(cfg, params, ids[:, t : t + 1], None, 3, None)
        logits_d, cache = decoder_forward(
            cfg,
            params,
            inputs_embeds=emb,
            kv_cache=cache,
            cache_positions=jnp.full((B,), t, jnp.int32),
        )
        np.testing.assert_allclose(
            np.asarray(logits_d[:, 0]), np.asarray(full_logits[:, t]), atol=2e-4
        )


def test_moe_ep_sharded_parity():
    """EP over a (data, fsdp, tensor, expert) mesh reproduces the
    unsharded forward; GSPMD emits the all-to-all from the specs."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg = _moe_cfg(moe_capacity_factor=2.0)
    params = init_llark_params(cfg, jax.random.PRNGKey(0))
    B, S = 8, 32
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(4, 250, size=(B, S)).astype(np.int32))
    slen = jnp.full((B,), S, jnp.int32)

    ref, ref_extras = llark_forward(
        cfg, params, ids, audio_patch_id=3, seq_lengths=slen
    )

    mesh = make_mesh((2, 1, 1, 4))
    assert mesh.shape[AXES.expert] == 4
    sp = shard_params(mesh, params, param_partition_specs(cfg))
    ids_s = jax.device_put(ids, NamedSharding(mesh, P(AXES.batch, None)))
    slen_s = jax.device_put(slen, NamedSharding(mesh, P(AXES.batch)))
    with mesh:
        out, extras = jax.jit(
            lambda p, i, sl: llark_forward(
                cfg, p, i, audio_patch_id=3, seq_lengths=sl
            )
        )(sp, ids_s, slen_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    assert abs(float(extras["moe_aux_loss"]) - float(ref_extras["moe_aux_loss"])) < 1e-5


@pytest.mark.slow
def test_moe_lifecycle_train_reload_generate(tmp_path):
    """MoE through the whole story (VERDICT r2 item 7): train via the CLI
    path with grad accumulation (exercises the aux-metrics accumulate
    scan), per-step MoE observability lands in metrics.jsonl (aux loss +
    dropped-token fraction), orbax checkpoint -> load_pretrained_model
    reload keeps the expert stacks, and generation reproduces the trained
    answer."""
    import json

    from llark_tpu.config import DataArguments, ModelArguments, TrainingArguments
    from llark_tpu.data.webdataset import TarShardWriter
    from llark_tpu.generate import GenerationConfig, Generator
    from llark_tpu.infer import infer_with_prompt
    from llark_tpu.models.utils import load_pretrained_model
    from llark_tpu.train.train import train

    MM = 16
    rng = np.random.RandomState(0)
    w = TarShardWriter(str(tmp_path / "mir-train-%05d.tar"), max_count=100)
    for i in range(16):
        w.write({
            "__key__": f"t{i:03d}",
            "json": {"response": [{"question": "what genre ?", "answer": "jazz ."}]},
            "audio_encoding.pyd": rng.randn(4, MM).astype(np.float32),
        })
    w.close()

    out_dir = str(tmp_path / "ckpt")
    train(
        ModelArguments(model_name_or_path="tiny", mm_hidden_size=MM,
                       moe_num_experts=4, moe_top_k=2),
        DataArguments(train_data_path=str(tmp_path / "mir-train-00000.tar"),
                      max_audio_frames=4, task_sample_probs={"mir": 1.0}),
        TrainingArguments(output_dir=out_dir,
                          per_device_train_batch_size=4,
                          gradient_accumulation_steps=2,
                          model_max_length=64, max_steps=30, save_steps=30,
                          logging_steps=1, learning_rate=3e-3,
                          mesh_shape=(1, 1, 1), seed=0),
    )

    # observability: every logged step carries the MoE metrics
    records = [json.loads(l) for l in open(os.path.join(out_dir, "metrics.jsonl"))]
    steps = [r for r in records if "moe_aux_loss" in r]
    assert len(steps) >= 30, f"MoE metrics missing from metrics.jsonl ({len(steps)})"
    assert all(np.isfinite(r["moe_aux_loss"]) for r in steps)
    assert all(0.0 <= r["moe_dropped_frac"] <= 1.0 for r in steps)
    # balanced tiny run at default capacity 1.25 must not drop everything
    assert np.mean([r["moe_dropped_frac"] for r in steps]) < 0.9

    cfg, params, bundle = load_pretrained_model(out_dir)
    assert cfg.moe_num_experts == 4
    assert "moe_w_up" in params["layers"] and "w_up" not in params["layers"]
    gen = Generator(cfg, params, bundle.audio_patch_id,
                    GenerationConfig(max_new_tokens=6, stop_text="###"),
                    max_cache_len=256)
    out = infer_with_prompt(
        "what genre ?", np.random.RandomState(1).randn(4, MM).astype(np.float32),
        gen, bundle)
    assert "jazz" in out, out
