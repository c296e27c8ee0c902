"""HF-checkpoint interop parity: import tiny HF Llama/MPT weights and match
torch logits; export/import roundtrip; vocab resize."""

import numpy as np
import pytest

import jax

from llark_tpu.config import ModelConfig
from llark_tpu.interop.hf import (
    hf_state_dict_from_params,
    llama_params_from_hf,
    load_hf_state_dict,
    load_pretrained_backbone,
    mpt_params_from_hf,
    resize_embeddings,
    save_hf_checkpoint,
)
from llark_tpu.models.decoder import decoder_forward

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _np_sd(model):
    return {k: v.detach().float().numpy() for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def tiny_llama():
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf_cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,  # exercise GQA
        max_position_embeddings=128,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        attention_bias=False,
        tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(hf_cfg).eval().float()
    return hf_cfg, model


@pytest.fixture(scope="module")
def tiny_mpt():
    from transformers import MptConfig, MptForCausalLM

    torch.manual_seed(1)
    hf_cfg = MptConfig(
        vocab_size=128,
        d_model=64,
        n_heads=4,
        n_layers=2,
        expansion_ratio=4,
        max_seq_len=128,
        layer_norm_epsilon=1e-5,
    )
    model = MptForCausalLM(hf_cfg).eval().float()
    return hf_cfg, model


def test_llama_import_logit_parity(tiny_llama):
    hf_cfg, model = tiny_llama
    cfg = ModelConfig(
        arch="llama",
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        max_seq_len=128,
        dtype="float32",
        param_dtype="float32",
        use_pallas_attention=False,
        remat=False,
    )
    params = llama_params_from_hf(_np_sd(model), cfg)

    rng = np.random.RandomState(0)
    ids = rng.randint(0, 128, size=(2, 12)).astype(np.int32)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids).long()).logits.numpy()
    ours, _ = decoder_forward(cfg, jax.tree.map(np.asarray, params), input_ids=ids)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-3)


def test_mpt_import_logit_parity(tiny_mpt):
    hf_cfg, model = tiny_mpt
    cfg = ModelConfig(
        arch="mpt",
        vocab_size=128,
        hidden_size=64,
        intermediate_size=256,
        num_layers=2,
        num_heads=4,
        num_kv_heads=4,
        max_seq_len=128,
        use_alibi=True,
        tie_embeddings=True,
        mlp_activation="gelu",
        norm_type="layernorm",
        rms_norm_eps=1e-5,
        dtype="float32",
        param_dtype="float32",
        use_pallas_attention=False,
        remat=False,
    )
    params = mpt_params_from_hf(_np_sd(model), cfg)

    rng = np.random.RandomState(1)
    ids = rng.randint(0, 128, size=(2, 12)).astype(np.int32)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids).long()).logits.numpy()
    ours, _ = decoder_forward(cfg, jax.tree.map(np.asarray, params), input_ids=ids)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-3)


def test_export_import_roundtrip(tmp_path, tiny_llama):
    _, model = tiny_llama
    cfg = ModelConfig(
        arch="llama", vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, dtype="float32",
        param_dtype="float32", use_pallas_attention=False, remat=False,
    )
    params = llama_params_from_hf(_np_sd(model), cfg)
    params["mm_projector"] = {
        "kernel": np.random.RandomState(0).randn(16, 64).astype(np.float32),
        "bias": np.zeros(64, np.float32),
    }
    out = save_hf_checkpoint(str(tmp_path / "ckpt"), cfg, params)
    sd = load_hf_state_dict(out)
    assert "model.mm_projector.weight" in sd
    assert sd["model.mm_projector.weight"].shape == (64, 16)
    again = llama_params_from_hf(sd, cfg)
    np.testing.assert_allclose(
        np.asarray(params["layers"]["wq"]), again["layers"]["wq"], rtol=1e-6
    )
    # and the exported dict loads into the HF model unchanged
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()
         if not k.startswith("model.mm_projector")},
        strict=False,
    )
    assert not missing, missing


def test_resize_embeddings_mean_init():
    params = {
        "embed": np.arange(12, dtype=np.float32).reshape(4, 3),
        "lm_head": np.arange(12, dtype=np.float32).reshape(3, 4),
    }
    out = resize_embeddings(params, 6)
    assert out["embed"].shape == (6, 3)
    np.testing.assert_allclose(out["embed"][4], params["embed"].mean(axis=0))
    np.testing.assert_allclose(out["embed"][5], params["embed"].mean(axis=0))
    assert out["lm_head"].shape == (3, 6)
    np.testing.assert_allclose(out["lm_head"][:, 4], params["lm_head"].mean(axis=1))


def test_load_pretrained_backbone_detects_and_resizes(tmp_path, tiny_mpt):
    _, model = tiny_mpt
    cfg = ModelConfig(
        arch="mpt", vocab_size=160, hidden_size=64, intermediate_size=256,
        num_layers=2, num_heads=4, num_kv_heads=4, use_alibi=True,
        tie_embeddings=True, mlp_activation="gelu", norm_type="layernorm",
        dtype="float32", param_dtype="float32", use_pallas_attention=False,
        remat=False,
    )
    save_hf_checkpoint(str(tmp_path / "mpt"), cfg, mpt_params_from_hf(_np_sd(model), cfg))
    params = load_pretrained_backbone(str(tmp_path / "mpt"), cfg)
    assert np.asarray(params["embed"]).shape == (160, 64)


def test_train_imports_hf_backbone(tmp_path, tiny_llama):
    """train() pointed at an HF checkpoint dir starts from those weights."""
    from llark_tpu.config import DataArguments, ModelArguments, TrainingArguments
    from llark_tpu.data.webdataset import TarShardWriter
    from llark_tpu.train.train import train

    _, model = tiny_llama
    cfg = ModelConfig(
        arch="llama", vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, dtype="float32",
        param_dtype="float32", use_pallas_attention=False, remat=False,
    )
    ckpt_dir = str(tmp_path / "hf")
    save_hf_checkpoint(ckpt_dir, cfg, llama_params_from_hf(_np_sd(model), cfg))

    w = TarShardWriter(str(tmp_path / "mir-train-%05d.tar"), max_count=10)
    rng = np.random.RandomState(0)
    for i in range(4):
        w.write({"__key__": f"t{i}", "json": {"response": [
            {"question": "genre ?", "answer": "jazz ."}]},
            "audio_encoding.pyd": rng.randn(4, 16).astype(np.float32)})
    w.close()

    result = train(
        ModelArguments(model_name_or_path=ckpt_dir, mm_hidden_size=16,
                       freeze_backbone=True),
        DataArguments(train_data_path=str(tmp_path / "mir-train-00000.tar"),
                      max_audio_frames=4, task_sample_probs={"mir": 1.0}),
        TrainingArguments(output_dir=str(tmp_path / "out"),
                          per_device_train_batch_size=2,
                          gradient_accumulation_steps=1, model_max_length=64,
                          max_steps=1, save_steps=100, mesh_shape=(1, 1, 1),
                          seed=0),
    )
    final = jax.device_get(result["state"].params)
    # backbone frozen + imported: wq must equal the HF weights exactly
    expect = llama_params_from_hf(_np_sd(model), cfg)["layers"]["wq"]
    np.testing.assert_array_equal(np.asarray(final["layers"]["wq"]), expect)
    # vocab was rounded up to a 128 multiple >= tokenizer size with mean init
    assert final["embed"].shape[0] >= 128


def _fake_sd(rng, vocab=16, hidden=8, extra_rows=0):
    sd = {
        "model.layers.0.self_attn.q_proj.weight": rng.randn(hidden, hidden).astype(np.float32),
        "model.norm.weight": rng.randn(hidden).astype(np.float32),
        "model.embed_tokens.weight": rng.randn(vocab + extra_rows, hidden).astype(np.float32),
        "lm_head.weight": rng.randn(vocab + extra_rows, hidden).astype(np.float32),
    }
    if extra_rows:
        sd["model.mm_projector.weight"] = rng.randn(hidden, 12).astype(np.float32)
        sd["model.mm_projector.bias"] = rng.randn(hidden).astype(np.float32)
    return sd


def test_delta_roundtrip_state():
    """make_delta then apply_delta reconstructs the target exactly, including
    resized-vocab rows and projector keys absent from the base (reference
    apply_delta.py:29-43 shape rules)."""
    from llark_tpu.interop.delta import apply_delta_state, make_delta_state

    rng = np.random.RandomState(0)
    base = _fake_sd(rng, extra_rows=0)
    target = _fake_sd(np.random.RandomState(1), extra_rows=4)
    delta = make_delta_state(base, target)
    # new vocab rows and projector are absolute in the delta
    np.testing.assert_array_equal(
        delta["model.embed_tokens.weight"][16:], target["model.embed_tokens.weight"][16:]
    )
    np.testing.assert_array_equal(
        delta["model.mm_projector.weight"], target["model.mm_projector.weight"]
    )
    recon = apply_delta_state(base, delta)
    for k in target:
        np.testing.assert_allclose(recon[k], target[k], rtol=0, atol=1e-5)


def test_delta_rejects_unknown_keys():
    from llark_tpu.interop.delta import make_delta_state

    base = {"a": np.zeros((2, 2), np.float32)}
    target = {"a": np.ones((2, 2), np.float32), "mystery": np.ones((1,), np.float32)}
    with pytest.raises(KeyError):
        make_delta_state(base, target)


def test_delta_cli_roundtrip(tmp_path):
    """End-to-end through the CLI and HF single-file checkpoints."""
    from llark_tpu.interop.delta import main as delta_main

    rng = np.random.RandomState(2)
    base_dir, target_dir = tmp_path / "base", tmp_path / "target"
    for d, sd in ((base_dir, _fake_sd(rng)), (target_dir, _fake_sd(np.random.RandomState(3), extra_rows=2))):
        d.mkdir()
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, d / "pytorch_model.bin")
    (target_dir / "config.json").write_text('{"model_type": "llama"}')

    delta_dir, recon_dir = tmp_path / "delta", tmp_path / "recon"
    delta_main(["make", "--base-model-path", str(base_dir),
                "--target-model-path", str(target_dir), "--delta-path", str(delta_dir)])
    assert (delta_dir / "config.json").exists()  # sidecars carried over
    delta_main(["apply", "--base-model-path", str(base_dir),
                "--target-model-path", str(recon_dir), "--delta-path", str(delta_dir)])
    want = load_hf_state_dict(str(target_dir))
    got = load_hf_state_dict(str(recon_dir))
    assert set(want) == set(got)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=1e-5)


def test_consolidate_sharded_checkpoint(tmp_path):
    """A sharded checkpoint directory becomes one single-file checkpoint
    with identical tensors (reference consolidate.py)."""
    import json as _json

    from llark_tpu.interop.delta import main as delta_main

    src = tmp_path / "sharded"
    src.mkdir()
    rng = np.random.RandomState(4)
    sd = _fake_sd(rng)
    keys = sorted(sd)
    half = len(keys) // 2
    shards = {
        "pytorch_model-00001-of-00002.bin": {k: sd[k] for k in keys[:half]},
        "pytorch_model-00002-of-00002.bin": {k: sd[k] for k in keys[half:]},
    }
    weight_map = {k: fname for fname, part in shards.items() for k in part}
    for fname, part in shards.items():
        torch.save({k: torch.from_numpy(v) for k, v in part.items()}, src / fname)
    (src / "pytorch_model.bin.index.json").write_text(
        _json.dumps({"weight_map": weight_map})
    )
    dst = tmp_path / "single"
    delta_main(["consolidate", "--src", str(src), "--dst", str(dst)])
    assert (dst / "pytorch_model.bin").exists()
    assert not (dst / "pytorch_model.bin.index.json").exists()
    got = load_hf_state_dict(str(dst))
    for k in sd:
        np.testing.assert_array_equal(got[k], sd[k])
