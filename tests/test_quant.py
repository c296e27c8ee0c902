"""Int8 weight-only quantization tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llark_tpu.config import ModelConfig
from llark_tpu.models.fusion import init_llark_params, llark_forward
from llark_tpu.models.quant import (
    dequantize_weight,
    quantize_params_int8,
    quantize_weight,
)


def test_quantize_roundtrip_error_bound():
    w = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 32)) * 0.1
    wq = quantize_weight(w)
    assert wq["q"].dtype == jnp.int8
    assert wq["scale"].shape == (4, 1, 32)
    back = dequantize_weight(wq)
    # symmetric per-channel int8: error <= scale/2 per element
    err = np.abs(np.asarray(back) - np.asarray(w))
    bound = np.asarray(wq["scale"]) / 2 + 1e-7
    assert (err <= bound).all()


def test_quantized_forward_close_to_fp32():
    cfg = ModelConfig.tiny(dtype="float32", use_pallas_attention=False)
    params = init_llark_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_params_int8(cfg, params)
    assert qparams["layers"]["wq"]["q"].dtype == jnp.int8
    # untouched leaves
    assert not isinstance(qparams["embed"], dict)
    assert not isinstance(qparams["layers"]["attn_norm_scale"], dict)

    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    ref, _ = llark_forward(cfg, params, ids, audio_patch_id=3)
    got, _ = llark_forward(cfg, qparams, ids, audio_patch_id=3)
    ref, got = np.asarray(ref), np.asarray(got)
    # logits stay strongly correlated; argmax agrees on most positions
    cos = (ref * got).sum() / (np.linalg.norm(ref) * np.linalg.norm(got))
    assert cos > 0.995, cos
    agree = (ref.argmax(-1) == got.argmax(-1)).mean()
    assert agree > 0.9, agree


def test_quantized_generation_runs():
    from llark_tpu.generate import GenerationConfig, Generator
    from llark_tpu.tokenization import TokenizerBundle, WordTokenizer

    bundle = TokenizerBundle.from_tokenizer(WordTokenizer(64))
    cfg = ModelConfig.tiny(dtype="float32", use_pallas_attention=False,
                           mm_hidden_size=8)
    cfg.vocab_size = int(np.ceil(len(bundle.tokenizer) / 128) * 128)
    params = init_llark_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_params_int8(cfg, params)
    gen = Generator(cfg, qparams, bundle.audio_patch_id,
                    GenerationConfig(max_new_tokens=4, temperature=0.0),
                    max_cache_len=64)
    ids = np.full((1, 16), bundle.pad_token_id, np.int32)
    ids[0, :4] = [bundle.tokenizer.bos_token_id, 5, 6, 7]
    out = gen.generate(ids, np.array([4], np.int32),
                       np.zeros((1, 2, 8), np.float32), np.array([2], np.int32))
    assert len(out[0]) <= 4


def test_int4_roundtrip_error_bound():
    from llark_tpu.models.quant import dequantize_weight_int4, quantize_weight_int4

    w = jax.random.normal(jax.random.PRNGKey(0), (2, 256, 32)) * 0.1
    wq = quantize_weight_int4(w, group=64)
    assert wq["q4"].shape == (2, 128, 32) and wq["q4"].dtype == jnp.int8
    assert wq["scale"].shape == (2, 4, 32)
    back = dequantize_weight_int4(wq)
    err = np.abs(np.asarray(back) - np.asarray(w))
    # per-group scale/2 bound
    scale = np.repeat(np.asarray(wq["scale"]), 64, axis=1)
    assert (err <= scale / 2 + 1e-6).all()


@pytest.mark.parametrize("layout", ["rows", "cols"])
def test_int4_forward_close_to_fp32(layout):
    from llark_tpu.models.quant import quantize_params_int4_incremental

    cfg = ModelConfig.tiny(dtype="float32", use_pallas_attention=False)
    params = init_llark_params(cfg, jax.random.PRNGKey(0))

    ref_params = jax.tree.map(lambda x: x, params)
    qparams = quantize_params_int4_incremental(
        cfg, jax.tree.map(lambda x: x, params), group=32, layout=layout
    )
    qkey = "q4" if layout == "rows" else "q4c"
    assert qkey in qparams["layers"]["wq"]

    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    ref, _ = llark_forward(cfg, ref_params, ids, audio_patch_id=3)
    got, _ = llark_forward(cfg, qparams, ids, audio_patch_id=3)
    ref, got = np.asarray(ref), np.asarray(got)
    # tiny 2-layer/64-hidden random model = worst case for int4 noise;
    # trained 4096-wide models average the error away (cf. bnb 4-bit)
    cos = (ref * got).sum() / (np.linalg.norm(ref) * np.linalg.norm(got))
    assert cos > 0.9, cos

    # the quantized COMPUTE path must closely match explicit dequantization
    # (cols path rounds partial sums through the compute dtype)
    from llark_tpu.models.quant import (
        dequantize_weight_int4,
        dequantize_weight_int4_cols,
    )

    def deq_leaf(v):
        if isinstance(v, dict) and "q4" in v:
            return dequantize_weight_int4(v)
        if isinstance(v, dict) and "q4c" in v:
            return dequantize_weight_int4_cols(v)
        return v

    deq = jax.tree.map(lambda x: x, qparams)
    deq["layers"] = {k: deq_leaf(v) for k, v in qparams["layers"].items()}
    deq["lm_head"] = deq_leaf(qparams["lm_head"])
    exact, _ = llark_forward(cfg, deq, ids, audio_patch_id=3)
    np.testing.assert_allclose(got, np.asarray(exact), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("layout", ["rows", "cols"])
def test_int4_generation_runs(layout):
    from llark_tpu.generate import GenerationConfig, Generator
    from llark_tpu.models.quant import quantize_params_int4_incremental
    from llark_tpu.tokenization import TokenizerBundle, WordTokenizer

    bundle = TokenizerBundle.from_tokenizer(WordTokenizer(64))
    cfg = ModelConfig.tiny(dtype="float32", use_pallas_attention=False,
                           mm_hidden_size=8)
    cfg.vocab_size = int(np.ceil(len(bundle.tokenizer) / 128) * 128)
    params = init_llark_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_params_int4_incremental(cfg, params, group=32, layout=layout)
    gen = Generator(cfg, qparams, bundle.audio_patch_id,
                    GenerationConfig(max_new_tokens=4, temperature=0.0),
                    max_cache_len=64)
    ids = np.full((1, 16), bundle.pad_token_id, np.int32)
    ids[0, :4] = [bundle.tokenizer.bos_token_id, 5, 6, 7]
    out = gen.generate(ids, np.array([4], np.int32),
                       np.zeros((1, 2, 8), np.float32), np.array([2], np.int32))
    assert len(out[0]) <= 4


def test_int4_pallas_kernel_interpret():
    """The Pallas int4 matmul (interpret mode) == explicit dequant matmul."""
    from llark_tpu.models.quant import dequantize_weight_int4, quantize_weight_int4
    from llark_tpu.ops.int4_matmul import int4_matmul

    for m, h, d, g in ((8, 256, 1024, 128), (1, 512, 1536, 128), (8, 512, 1024, 256)):
        w = jax.random.normal(jax.random.PRNGKey(0), (h, d)) * 0.1
        wq = quantize_weight_int4(w, group=g)
        x = jax.random.normal(jax.random.PRNGKey(1), (m, h))
        ref = x @ dequantize_weight_int4(wq)
        got = int4_matmul(x, wq["q4"], wq["scale"].astype(jnp.float32),
                          group=g, interpret=True)
        rel = float(jnp.max(jnp.abs(got - ref))) / float(jnp.max(jnp.abs(ref)))
        assert rel < 5e-3, (m, h, d, g, rel)


def test_int4_cols_matches_rows_numerics():
    """Both packings encode identical quantized values; the cols layout
    unpacks via bitcast with zero arithmetic."""
    from llark_tpu.models.quant import (
        dequantize_weight_int4,
        dequantize_weight_int4_cols,
        quantize_weight_int4,
        quantize_weight_int4_cols,
        quantized_dense_int4,
    )

    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(64, 30).astype(np.float32) * 0.05)
    a = dequantize_weight_int4(quantize_weight_int4(w, 32))
    b = dequantize_weight_int4_cols(quantize_weight_int4_cols(w, 32))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    x = jnp.asarray(rng.randn(2, 3, 64).astype(np.float32))
    y = quantized_dense_int4(x, quantize_weight_int4_cols(w, 32), None, jnp.float32)
    yref = jnp.einsum("bsh,hd->bsd", x, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yref), atol=1e-5)


def test_bits4_qlora_trains(tmp_path):
    """--bits 4: int4 group-wise frozen base + LoRA trains with finite loss
    (was a silent no-op: --bits 4 trained in full precision)."""
    import numpy as np

    from llark_tpu.config import DataArguments, ModelArguments, TrainingArguments
    from llark_tpu.data.webdataset import TarShardWriter
    from llark_tpu.train.train import train

    MM = 8
    rng = np.random.RandomState(0)
    w = TarShardWriter(str(tmp_path / "mir-train-%05d.tar"), max_count=100)
    for i in range(4):
        w.write({"__key__": f"t{i:03d}",
                 "json": {"response": [{"question": "q ?", "answer": "a ."}]},
                 "audio_encoding.pyd": rng.randn(4, MM).astype(np.float32)})
    w.close()
    res = train(
        ModelArguments(model_name_or_path="tiny", mm_hidden_size=MM),
        DataArguments(train_data_path=str(tmp_path / "mir-train-00000.tar"),
                      max_audio_frames=4, task_sample_probs={"mir": 1.0}),
        TrainingArguments(output_dir=str(tmp_path / "ckpt"),
                          per_device_train_batch_size=2,
                          gradient_accumulation_steps=1,
                          model_max_length=64, max_steps=2, save_steps=2,
                          mesh_shape=(1, 1, 1), seed=0,
                          bits=4, lora_enable=True, lora_r=4),
    )
    assert all(np.isfinite(l) for l in res["losses"])
    # the frozen base really is int4 (q4c cols layout dicts)
    wq = res["state"].params["layers"]["wq"]
    assert isinstance(wq, dict) and ("q4c" in wq or "q4" in wq)


def test_bits_invalid_rejected(tmp_path):
    from llark_tpu.config import DataArguments, ModelArguments, TrainingArguments
    from llark_tpu.train.train import train

    import pytest

    with pytest.raises(ValueError, match="unsupported"):
        train(
            ModelArguments(model_name_or_path="tiny", mm_hidden_size=8),
            DataArguments(train_data_path="x.tar"),
            TrainingArguments(output_dir=str(tmp_path), bits=2,
                              mesh_shape=(1, 1, 1)),
        )
