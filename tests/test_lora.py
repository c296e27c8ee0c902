"""LoRA adapter tests: zero-delta init, frozen-base training, merge
equivalence, adapter save/load, sharded specs."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llark_tpu.config import ModelConfig
from llark_tpu.models.fusion import init_llark_params, llark_forward
from llark_tpu.models.lora import (
    init_lora_params,
    load_lora_adapter,
    lora_keys,
    merge_lora,
    save_lora_adapter,
    strip_lora,
)


def make_cfg(**kw):
    base = dict(lora_rank=4, lora_alpha=8.0, use_pallas_attention=False)
    base.update(kw)
    return ModelConfig.tiny(**base)


def fwd(cfg, params, ids, patch_id=3):
    logits, _ = llark_forward(cfg, params, ids, audio_patch_id=patch_id)
    return logits


def test_zero_delta_init_preserves_forward():
    cfg = make_cfg()
    key = jax.random.PRNGKey(0)
    base = init_llark_params(cfg, key)
    lora = init_lora_params(cfg, jax.random.PRNGKey(1), base)
    assert len(lora_keys(lora)) == 2 * 7  # a+b for each of 7 targets
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, cfg.vocab_size)
    np.testing.assert_allclose(
        np.asarray(fwd(cfg, base, ids)), np.asarray(fwd(cfg, lora, ids)), rtol=1e-6
    )


def test_merge_equivalence_after_perturbation():
    # fp32 compute: merged-weights vs two-path-add only agree to bf16 ulp
    # under bf16; the algebraic identity is what we test here
    cfg = make_cfg(dtype="float32")
    params = init_lora_params(
        cfg, jax.random.PRNGKey(1), init_llark_params(cfg, jax.random.PRNGKey(0))
    )
    # give B nonzero values so the delta is active
    layers = dict(params["layers"])
    for k in list(layers):
        if k.endswith("_lora_b"):
            layers[k] = (
                jax.random.normal(jax.random.PRNGKey(hash(k) % 2**31), layers[k].shape)
                * 0.02
            ).astype(layers[k].dtype)
    params = dict(params, layers=layers)

    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, cfg.vocab_size)
    unmerged = np.asarray(fwd(cfg, params, ids))
    merged_params = merge_lora(cfg, params)
    assert not lora_keys(merged_params)
    merged = np.asarray(fwd(cfg, merged_params, ids))
    np.testing.assert_allclose(unmerged, merged, atol=2e-2)
    # and differs from the stripped base (delta actually active)
    stripped = np.asarray(fwd(cfg, strip_lora(params), ids))
    assert np.abs(unmerged - stripped).max() > 1e-4


def test_adapter_save_load_roundtrip(tmp_path):
    cfg = make_cfg()
    params = init_lora_params(
        cfg, jax.random.PRNGKey(1), init_llark_params(cfg, jax.random.PRNGKey(0))
    )
    d = save_lora_adapter(str(tmp_path / "adapter"), cfg, params)
    assert os.path.exists(os.path.join(d, "adapter.npz"))
    assert os.path.exists(os.path.join(d, "non_lora_trainables.npz"))

    fresh = init_llark_params(cfg, jax.random.PRNGKey(9))
    restored, meta = load_lora_adapter(d, fresh)
    assert meta["lora_rank"] == 4
    for k in lora_keys(params):
        np.testing.assert_array_equal(
            np.asarray(params["layers"][k]), np.asarray(restored["layers"][k])
        )
    np.testing.assert_array_equal(
        np.asarray(params["mm_projector"]["kernel"]),
        np.asarray(restored["mm_projector"]["kernel"]),
    )


def test_lora_training_freezes_base(tmp_path):
    """End-to-end: train with lora_enable; base weights must not move,
    LoRA B / projector must move, loss must go down."""
    from llark_tpu.config import DataArguments, ModelArguments, TrainingArguments
    from llark_tpu.data.webdataset import TarShardWriter
    from llark_tpu.train.train import train

    w = TarShardWriter(str(tmp_path / "mir-train-%05d.tar"), max_count=100)
    rng = np.random.RandomState(0)
    for i in range(8):
        w.write(
            {
                "__key__": f"t{i:03d}",
                "json": {"response": [{"question": "genre ?", "answer": "jazz ."}]},
                "audio_encoding.pyd": rng.randn(6, 16).astype(np.float32),
            }
        )
    w.close()

    model_args = ModelArguments(model_name_or_path="tiny", mm_hidden_size=16)
    data_args = DataArguments(
        train_data_path=str(tmp_path / "mir-train-00000.tar"),
        max_audio_frames=6,
        task_sample_probs={"mir": 1.0},
    )
    training_args = TrainingArguments(
        output_dir=str(tmp_path / "out"),
        per_device_train_batch_size=2,
        gradient_accumulation_steps=2,
        model_max_length=96,
        learning_rate=5e-3,
        max_steps=8,
        save_steps=100,
        logging_steps=1,
        mesh_shape=(1, 1, 1),
        seed=0,
        lora_enable=True,
        lora_r=4,
        lora_alpha=8,
        lora_dropout=0.05,
    )
    result = train(model_args, data_args, training_args)
    losses = result["losses"]
    assert losses[-1] < losses[0]

    # reconstruct the t=0 params deterministically and compare
    cfg0 = ModelConfig.tiny(mm_hidden_size=16)
    cfg0.vocab_size = result["cfg"].vocab_size
    cfg0.lora_rank, cfg0.lora_alpha, cfg0.lora_dropout = 4, 8.0, 0.05
    init = init_lora_params(
        cfg0, jax.random.PRNGKey(1), init_llark_params(cfg0, jax.random.PRNGKey(0))
    )
    final = jax.device_get(result["state"].params)
    # base weights frozen
    np.testing.assert_array_equal(
        np.asarray(init["layers"]["wq"]), np.asarray(final["layers"]["wq"])
    )
    np.testing.assert_array_equal(
        np.asarray(init["final_norm_scale"]), np.asarray(final["final_norm_scale"])
    )
    # LoRA B and projector moved
    assert np.abs(np.asarray(final["layers"]["wq_lora_b"])).max() > 0
    assert not np.array_equal(
        np.asarray(init["mm_projector"]["kernel"]),
        np.asarray(final["mm_projector"]["kernel"]),
    )
    # adapter exported
    assert glob.glob(str(tmp_path / "out" / "adapter" / "adapter.npz"))


def test_lora_sharded_specs_cover_tree():
    from llark_tpu.parallel.mesh import param_partition_specs

    cfg = make_cfg()
    params = init_lora_params(
        cfg, jax.random.PRNGKey(1), init_llark_params(cfg, jax.random.PRNGKey(0))
    )
    specs = param_partition_specs(cfg)
    # every param leaf has a spec (tree structures match)
    jax.tree.map(lambda p, s: None, params, specs,
                 is_leaf=lambda x: hasattr(x, "shape") or x is None)
    for k in lora_keys(params):
        assert k in specs["layers"], f"missing spec for {k}"


def test_qlora_int8_base_training(tmp_path):
    """bits=8 + lora: int8 frozen base, trainable LoRA, loss decreases."""
    from llark_tpu.config import DataArguments, ModelArguments, TrainingArguments
    from llark_tpu.data.webdataset import TarShardWriter
    from llark_tpu.train.train import train

    w = TarShardWriter(str(tmp_path / "mir-train-%05d.tar"), max_count=100)
    rng = np.random.RandomState(0)
    for i in range(8):
        w.write({
            "__key__": f"t{i:03d}",
            "json": {"response": [{"question": "genre ?", "answer": "jazz ."}]},
            "audio_encoding.pyd": rng.randn(6, 16).astype(np.float32),
        })
    w.close()

    result = train(
        ModelArguments(model_name_or_path="tiny", mm_hidden_size=16),
        DataArguments(train_data_path=str(tmp_path / "mir-train-00000.tar"),
                      max_audio_frames=6, task_sample_probs={"mir": 1.0}),
        TrainingArguments(output_dir=str(tmp_path / "out"),
                          per_device_train_batch_size=2,
                          gradient_accumulation_steps=2, model_max_length=96,
                          learning_rate=5e-3, max_steps=8, save_steps=100,
                          logging_steps=1, mesh_shape=(1, 1, 1), seed=0,
                          bits=8, lora_enable=True, lora_r=4, lora_alpha=8,
                          lora_dropout=0.0),
    )
    losses = result["losses"]
    assert losses[-1] < losses[0]
    final = jax.device_get(result["state"].params)
    # base stayed int8 and untouched
    assert final["layers"]["wq"]["q"].dtype.name == "int8"
    # LoRA B moved; adapter exported
    assert np.abs(np.asarray(final["layers"]["wq_lora_b"])).max() > 0
    assert glob.glob(str(tmp_path / "out" / "adapter" / "adapter.npz"))


def test_bits8_requires_frozen_base(tmp_path):
    from llark_tpu.config import DataArguments, ModelArguments, TrainingArguments
    from llark_tpu.train.train import train

    with pytest.raises(ValueError, match="bits 8"):
        train(
            ModelArguments(model_name_or_path="tiny", mm_hidden_size=16),
            DataArguments(train_data_path="/nonexistent", max_audio_frames=4),
            TrainingArguments(output_dir=str(tmp_path / "out"), bits=8,
                              max_steps=1, mesh_shape=(1, 1, 1)),
        )
