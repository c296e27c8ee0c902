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
