"""Regression tests for the round-2 advisor findings (ADVICE.md r2).

Covers: MoE training on the default 3-axis mesh (expert axis appended
automatically), Mixtral-style MoE weight import/export in interop/hf.py,
moe_top_k validation, int8 quantization of the expert FFN stacks, and the
LoRA attention-only warning for MoE models.
"""

import logging

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llark_tpu.config import DataArguments, ModelArguments, ModelConfig, TrainingArguments
from llark_tpu.models.fusion import init_llark_params, llark_forward


def _moe_cfg(**kw):
    base = dict(
        moe_num_experts=4,
        moe_top_k=2,
        moe_capacity_factor=8.0,
        dtype="float32",
        param_dtype="float32",
    )
    base.update(kw)
    return ModelConfig.tiny(**base)


def test_moe_top_k_must_not_exceed_num_experts():
    # ADVICE r2 (low): top_k > num_experts silently re-dispatched every
    # token to expert 0 after all experts were masked
    with pytest.raises(ValueError, match="moe_top_k"):
        ModelConfig.tiny(moe_num_experts=2, moe_top_k=4)


def test_moe_train_on_default_3axis_mesh(tmp_path):
    # ADVICE r2 (medium): --moe_num_experts with the default 3-axis mesh
    # crashed at shard_params ("Resource axis: expert ... not found")
    from llark_tpu.data.webdataset import TarShardWriter
    from llark_tpu.train.train import train

    w = TarShardWriter(str(tmp_path / "mir-train-%05d.tar"), max_count=100)
    rng = np.random.RandomState(0)
    for i in range(4):
        w.write({
            "__key__": f"t{i:03d}",
            "json": {"response": [{"question": "genre ?", "answer": "jazz ."}]},
            "audio_encoding.pyd": rng.randn(4, 16).astype(np.float32),
        })
    w.close()

    model_args = ModelArguments(
        model_name_or_path="tiny", mm_hidden_size=16,
        moe_num_experts=2, moe_top_k=1,
    )
    data_args = DataArguments(
        train_data_path=str(tmp_path / "mir-train-00000.tar"),
        max_audio_frames=4,
        task_sample_probs={"mir": 1.0},
    )
    training_args = TrainingArguments(
        output_dir=str(tmp_path / "out"),
        per_device_train_batch_size=2,
        gradient_accumulation_steps=1,
        model_max_length=64,
        max_steps=2,
        save_steps=100,
        logging_steps=1,
        mesh_shape=(1, 1, 1),  # 3 values: the expert axis must be appended
        seed=0,
    )
    result = train(model_args, data_args, training_args)
    assert result["final_step"] == 2
    assert all(np.isfinite(result["losses"]))


def test_mixtral_import_export_roundtrip(tmp_path):
    # ADVICE r2 (medium): config sniffing enabled MoE but the importer had
    # no block_sparse_moe mapping -> KeyError on gate_proj
    from llark_tpu.interop.hf import load_pretrained_backbone, save_hf_checkpoint
    from llark_tpu.train.train import model_config_from_name

    cfg = _moe_cfg(moe_num_experts=2, moe_top_k=1)
    params = init_llark_params(cfg, jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "mixtral-tiny")
    save_hf_checkpoint(ckpt, cfg, params)

    # config sniffing picks up the expert count
    cfg2 = model_config_from_name(ckpt, ModelArguments(mm_hidden_size=48))
    assert cfg2.moe_num_experts == 2
    assert cfg2.moe_top_k == 1

    back = load_pretrained_backbone(ckpt, cfg2)
    for key in ("moe_router", "moe_w_gate", "moe_w_up", "moe_w_down"):
        np.testing.assert_allclose(
            np.asarray(back["layers"][key]),
            np.asarray(params["layers"][key]),
            atol=1e-6,
            err_msg=key,
        )
    assert "w_gate" not in back["layers"]

    # expert-count mismatch is a hard error, not silent misload
    from llark_tpu.interop.hf import llama_params_from_hf, load_hf_state_dict

    sd = load_hf_state_dict(ckpt)
    bad = _moe_cfg(moe_num_experts=4, moe_top_k=1)
    with pytest.raises(ValueError, match="experts"):
        llama_params_from_hf(sd, bad)


def test_moe_int8_quantization_covers_experts():
    # ADVICE r2 (low): --bits left expert weights (the bulk of MoE params)
    # unquantized. Now the expert stacks quantize, and the scale-commuted
    # quantized forward matches dequantize-then-matmul.
    from llark_tpu.models.quant import (
        dequantize_weight,
        is_quantized,
        quantize_params_int8,
    )

    cfg = _moe_cfg()
    params = init_llark_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_params_int8(cfg, dict(params))
    for key in ("moe_w_gate", "moe_w_up", "moe_w_down"):
        assert is_quantized(qparams["layers"][key]), key
    assert not is_quantized(qparams["layers"]["moe_router"])  # router stays fp32

    # reference: same params with the int8 error baked in via dequantize
    dq_layers = dict(qparams["layers"])
    for key in ("moe_w_gate", "moe_w_up", "moe_w_down"):
        dq_layers[key] = dequantize_weight(qparams["layers"][key])
    dq_params = dict(qparams)
    dq_params["layers"] = {
        k: (dequantize_weight(v) if is_quantized(v) else v)
        for k, v in dq_layers.items()
    }
    if is_quantized(qparams.get("lm_head")):
        dq_params["lm_head"] = dequantize_weight(qparams["lm_head"])

    B, S = 2, 16
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(4, 250, size=(B, S)).astype(np.int32))
    slen = jnp.full((B,), S, jnp.int32)
    out_q, _ = llark_forward(cfg, qparams, ids, audio_patch_id=3, seq_lengths=slen)
    out_dq, _ = llark_forward(cfg, dq_params, ids, audio_patch_id=3, seq_lengths=slen)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_dq), atol=2e-3)


def test_lora_on_moe_warns_attention_only(caplog):
    # ADVICE r2 (low): MoE + LoRA silently became attention-only
    from llark_tpu.models.lora import init_lora_params, lora_keys

    cfg = _moe_cfg(lora_rank=4)
    params = init_llark_params(cfg, jax.random.PRNGKey(0))
    with caplog.at_level(logging.WARNING, logger="llark_tpu.models.lora"):
        lp = init_lora_params(cfg, jax.random.PRNGKey(1), params)
    assert any("attention" in r.message for r in caplog.records)
    # only attention projections got factors (no moe_w_* targets)
    assert all(k.split("_lora_")[0] in ("wq", "wk", "wv", "wo") for k in lora_keys(lp))
