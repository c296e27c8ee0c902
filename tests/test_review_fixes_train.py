"""Regression tests for models/train/ops review findings."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from llark_tpu.config import (
    DataArguments,
    ModelArguments,
    ModelConfig,
    TrainingArguments,
)
from llark_tpu.models.fusion import init_llark_params

MM = 8


def _shards(tmp_path, name="mir-train-%05d.tar", n=6):
    from llark_tpu.data.webdataset import TarShardWriter

    rng = np.random.RandomState(0)
    w = TarShardWriter(str(tmp_path / name), max_count=100)
    for i in range(n):
        w.write({
            "__key__": f"t{i:03d}",
            "json": {"response": [{"question": "what genre ?", "answer": "jazz ."}]},
            "audio_encoding.pyd": rng.randn(4, MM).astype(np.float32),
        })
    w.close()
    return str(tmp_path / name.replace("%05d", "00000"))


def test_lora_train_then_load_then_generate(tmp_path):
    """The LoRA chain end-to-end: metadata written AFTER cfg gains lora
    fields, and load_pretrained_model tolerates the factor-bearing tree."""
    import json

    from llark_tpu.generate import GenerationConfig, Generator
    from llark_tpu.models.utils import load_pretrained_model
    from llark_tpu.train.train import train

    shard = _shards(tmp_path)
    train(
        ModelArguments(model_name_or_path="tiny", mm_hidden_size=MM),
        DataArguments(train_data_path=shard, max_audio_frames=4,
                      task_sample_probs={"mir": 1.0}),
        TrainingArguments(output_dir=str(tmp_path / "ckpt"),
                          per_device_train_batch_size=2,
                          gradient_accumulation_steps=1,
                          model_max_length=64, max_steps=2, save_steps=2,
                          mesh_shape=(1, 1, 1), seed=0,
                          lora_enable=True, lora_r=4, lora_alpha=8.0),
    )
    meta = json.load(open(tmp_path / "ckpt" / "model_config.json"))
    assert meta["model_config"]["lora_rank"] == 4  # was 0: written before cfg mutation

    cfg, params, bundle = load_pretrained_model(str(tmp_path / "ckpt"))
    assert cfg.lora_rank == 4
    # factor leaves survived the load
    assert "wq_lora_a" in params["layers"]
    gen = Generator(cfg, params, bundle.audio_patch_id,
                    GenerationConfig(max_new_tokens=3, stop_text=""),
                    max_cache_len=128)
    ids = np.zeros((1, 8), np.int32)
    ids[0, :3] = [5, 6, 7]
    out = gen.generate(ids, np.array([3], np.int32))
    assert len(out[0]) == 3


def test_lr_schedule_semantics():
    from llark_tpu.train.step import lr_schedule

    args = TrainingArguments(output_dir="/tmp/x", max_steps=100,
                             learning_rate=1.0, warmup_ratio=0.1,
                             lr_scheduler_type="linear")
    s = lr_schedule(args)
    assert float(s(0)) < 0.2  # warmup starts low
    assert abs(float(s(10)) - 1.0) < 1e-6  # peak after warmup
    assert float(s(99)) < 0.15  # decays toward 0 (not constant!)

    args = dataclasses.replace(args, lr_scheduler_type="constant")
    s = lr_schedule(args)
    assert abs(float(s(99)) - 1.0) < 1e-6

    args = dataclasses.replace(args, lr_scheduler_type="bogus")
    try:
        lr_schedule(args)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_tied_embeddings_freeze_original_rows(tmp_path):
    """With tie_embeddings the LM head is the embedding table: gradients
    through the head must not update rows below trainable_token_start."""
    from llark_tpu.train.state import TrainState
    from llark_tpu.train.step import make_optimizer, make_train_step

    cfg = ModelConfig.tiny(dtype="float32", param_dtype="float32",
                           tie_embeddings=True, mlp_activation="gelu",
                           norm_type="layernorm", use_alibi=True)
    params = init_llark_params(cfg, jax.random.PRNGKey(0))
    tts = cfg.vocab_size - 3
    args = TrainingArguments(output_dir=str(tmp_path), max_steps=4,
                             learning_rate=1e-2)
    opt = make_optimizer(args, params)
    state = TrainState.create(params, opt)
    step_fn = jax.jit(make_train_step(
        cfg, opt, audio_patch_id=7, grad_accum_steps=1,
        trainable_token_start=tts,
    ))
    rng = np.random.RandomState(0)
    B, S, T = 4, 16, 2
    ids = rng.randint(0, tts - 1, size=(B, S)).astype(np.int32)
    ids[:, 1:1 + T] = 7
    labels = np.where(np.arange(S)[None] >= S // 2, ids, -100).astype(np.int32)
    batch = {
        "input_ids": ids, "labels": labels,
        "seq_lengths": np.full((B,), S, np.int32),
        "audio_encodings": rng.randn(B, T, cfg.mm_hidden_size).astype(np.float32),
        "audio_frame_counts": np.full((B,), T, np.int32),
    }
    before = np.array(state.params["embed"])
    # two steps: warmup LR at step 0 is ~0, so a single step moves nothing
    new_state, _ = step_fn(state, batch)
    new_state, _ = step_fn(new_state, batch)
    after = np.asarray(new_state.params["embed"])
    np.testing.assert_array_equal(after[:tts], before[:tts])  # frozen rows
    assert np.abs(after[tts:] - before[tts:]).max() > 0  # audio rows train


def test_global_batch_excludes_tensor_axis():
    from llark_tpu.parallel.mesh import make_mesh
    from llark_tpu.train.train import compute_global_batch

    args = TrainingArguments(output_dir="/tmp/x",
                             per_device_train_batch_size=2,
                             gradient_accumulation_steps=3)
    mesh = make_mesh((1, 4, 2))  # 8 devices, tensor=2
    assert compute_global_batch(args, mesh) == 2 * 3 * 4  # NOT * 8


def test_flash_kernel_fully_masked_rows_zero():
    from llark_tpu.ops.attention import flash_attention_fwd

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, 2, 256, 128), jnp.float32)
    k = jnp.asarray(rng.randn(2, 2, 256, 128), jnp.float32)
    v = jnp.asarray(rng.randn(2, 2, 256, 128), jnp.float32)
    kv_lengths = jnp.asarray([0, 128], jnp.int32)  # row 0 fully masked
    out = flash_attention_fwd(q, k, v, causal=True, kv_lengths=kv_lengths,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(out[0]), 0.0, atol=1e-6)
    assert np.abs(np.asarray(out[1])).max() > 0


def test_reloaded_checkpoint_reproduces_trained_answer(tmp_path):
    """Train to convergence, reload from the output dir, generate: the
    completion must be the trained answer. Catches tokenizer-vocab
    staleness (the lazy WordTokenizer interns ids DURING training; saving
    metadata only before training reloads with shuffled ids)."""
    from llark_tpu.generate import GenerationConfig, Generator
    from llark_tpu.infer import infer_with_prompt
    from llark_tpu.models.utils import load_pretrained_model
    from llark_tpu.train.train import train

    shard = _shards(tmp_path, n=16)
    train(
        ModelArguments(model_name_or_path="tiny", mm_hidden_size=MM),
        DataArguments(train_data_path=shard, max_audio_frames=4,
                      task_sample_probs={"mir": 1.0}),
        TrainingArguments(output_dir=str(tmp_path / "ckpt"),
                          per_device_train_batch_size=4,
                          gradient_accumulation_steps=1,
                          model_max_length=64, max_steps=30, save_steps=30,
                          learning_rate=3e-3, mesh_shape=(1, 1, 1), seed=0),
    )
    cfg, params, bundle = load_pretrained_model(str(tmp_path / "ckpt"))
    gen = Generator(cfg, params, bundle.audio_patch_id,
                    GenerationConfig(max_new_tokens=6, stop_text="###"),
                    max_cache_len=256)
    out = infer_with_prompt(
        "what genre ?", np.random.RandomState(1).randn(4, MM).astype(np.float32),
        gen, bundle)
    assert "jazz" in out, out


def test_mpt_family_train_reload_generate(tmp_path):
    """MPT end-to-end (ALiBi, LayerNorm, GELU, tied embeddings): train to
    convergence via the CLI path, reload, and reproduce the answer —
    coverage the tied-head freeze bug showed was missing."""
    from llark_tpu.generate import GenerationConfig, Generator
    from llark_tpu.infer import infer_with_prompt
    from llark_tpu.models.utils import load_pretrained_model
    from llark_tpu.train.train import train

    shard = _shards(tmp_path, n=16)
    train(
        ModelArguments(model_name_or_path="tiny-mpt", mm_hidden_size=MM),
        DataArguments(train_data_path=shard, max_audio_frames=4,
                      task_sample_probs={"mir": 1.0}),
        TrainingArguments(output_dir=str(tmp_path / "ckpt"),
                          per_device_train_batch_size=4,
                          gradient_accumulation_steps=1,
                          model_max_length=64, max_steps=30, save_steps=30,
                          learning_rate=3e-3, mesh_shape=(1, 1, 1), seed=0),
    )
    cfg, params, bundle = load_pretrained_model(str(tmp_path / "ckpt"))
    assert cfg.arch == "mpt" and cfg.tie_embeddings and cfg.use_alibi
    gen = Generator(cfg, params, bundle.audio_patch_id,
                    GenerationConfig(max_new_tokens=6, stop_text="###"),
                    max_cache_len=256)
    out = infer_with_prompt(
        "what genre ?", np.random.RandomState(1).randn(4, MM).astype(np.float32),
        gen, bundle)
    assert "jazz" in out, out


def test_tune_adapter_without_freeze_trains_full_model(tmp_path):
    """Reference flag semantics (m2t/train.py:143-164): tune_mm_mlp_adapter
    alone must NOT freeze the backbone — the run of record trains the full
    model with original embedding rows detached and projector side-saved."""
    import glob

    from llark_tpu.models.utils import load_pretrained_model
    from llark_tpu.train.train import train

    shard = _shards(tmp_path)
    out = str(tmp_path / "ckpt")
    res = train(
        ModelArguments(model_name_or_path="tiny", mm_hidden_size=MM,
                       tune_mm_mlp_adapter=True, freeze_backbone=False),
        DataArguments(train_data_path=shard, max_audio_frames=4,
                      task_sample_probs={"mir": 1.0}),
        TrainingArguments(output_dir=out, per_device_train_batch_size=2,
                          gradient_accumulation_steps=1,
                          model_max_length=64, max_steps=3, save_steps=3,
                          learning_rate=1e-2, mesh_shape=(1, 1, 1), seed=0),
    )
    # projector side-save still happens (tune flag)
    assert glob.glob(str(tmp_path / "ckpt" / "mm_projector" / "checkpoint-*.npz"))
    # backbone weights moved (full-model training, not adapter-only)
    state = res["state"]
    cfg, params0, _ = load_pretrained_model(out)  # trained weights
    import jax
    from llark_tpu.models.fusion import init_llark_params

    init = init_llark_params(cfg, jax.random.PRNGKey(0))
    moved = float(np.abs(np.asarray(params0["layers"]["wq"], np.float32)
                         - np.asarray(init["layers"]["wq"], np.float32)).max())
    assert moved > 0, "backbone frozen despite freeze_backbone=False"
    # original embedding rows stayed detached
    tts = cfg.vocab_size  # HF-free path: bundle appended 3 audio tokens
    emb_t = np.asarray(params0["embed"], np.float32)
    emb_0 = np.asarray(init["embed"], np.float32)
    # at least the earliest rows (special/pad ids, never targets) unchanged
    np.testing.assert_array_equal(emb_t[:4], emb_0[:4])
