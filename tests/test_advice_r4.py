"""Regression tests for the round-3 advisor findings (ADVICE.md r3).

Covers: MoE export writing a Mixtral-typed config.json, Mixtral-routing
parity against a torch HF oracle (renormalized top-k gates, no drops),
the paged-KV VMEM guard on kv_block_size, admission-failure block-leak
recovery, and the neural-annotator weights cache keyed by realpath.
"""

import json
import os

import numpy as np
import pytest

import jax

from llark_tpu.config import ModelConfig
from llark_tpu.inference.server import BatchedServer, Request
from llark_tpu.models.fusion import init_llark_params
from llark_tpu.tokenization import TokenizerBundle, WordTokenizer


# ---------------------------------------------------------------------------
# ADVICE r3 #1 (medium): MoE export must say model_type "mixtral"
# ---------------------------------------------------------------------------


def test_moe_export_config_is_mixtral(tmp_path):
    # a config.json claiming model_type "llama" next to block_sparse_moe.*
    # tensors makes HF instantiate a dense LlamaForCausalLM and silently
    # drop every expert weight
    from llark_tpu.interop.hf import save_hf_checkpoint
    from llark_tpu.models.decoder import init_decoder_params

    cfg = ModelConfig.tiny(
        moe_num_experts=4, moe_top_k=2,
        dtype="float32", param_dtype="float32",
    )
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    save_hf_checkpoint(str(tmp_path / "moe"), cfg, params)
    config = json.load(open(tmp_path / "moe" / "config.json"))
    assert config["model_type"] == "mixtral"
    assert config["architectures"] == ["MixtralForCausalLM"]
    assert config["num_local_experts"] == 4
    assert config["num_experts_per_tok"] == 2

    dense = ModelConfig.tiny(dtype="float32", param_dtype="float32")
    dparams = init_decoder_params(dense, jax.random.PRNGKey(1))
    save_hf_checkpoint(str(tmp_path / "dense"), dense, dparams)
    dconfig = json.load(open(tmp_path / "dense" / "config.json"))
    assert dconfig["model_type"] == "llama"
    assert dconfig["architectures"] == ["LlamaForCausalLM"]


# ---------------------------------------------------------------------------
# ADVICE r3 #2 (medium): Mixtral routing parity vs a torch oracle
# ---------------------------------------------------------------------------


def test_mixtral_import_torch_oracle_parity(tmp_path):
    """Imported Mixtral checkpoints must run with renormalized top-k gates
    and no capacity drops — under Switch routing (raw softmax gates) every
    MoE output is systematically down-scaled vs the reference."""
    torch = pytest.importorskip("torch")
    from transformers import MixtralConfig, MixtralForCausalLM

    from llark_tpu.interop.hf import load_pretrained_backbone
    from llark_tpu.models.decoder import decoder_forward

    torch.manual_seed(7)
    hf_cfg = MixtralConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=2,
        max_position_embeddings=128,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        router_jitter_noise=0.0,
    )
    model = MixtralForCausalLM(hf_cfg).eval().float()
    ckpt = tmp_path / "mixtral"
    os.makedirs(ckpt)
    torch.save(model.state_dict(), ckpt / "pytorch_model.bin")

    cfg = ModelConfig(
        arch="llama", vocab_size=512, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, max_seq_len=128,
        moe_num_experts=4, moe_top_k=2,
        dtype="float32", param_dtype="float32",
        use_pallas_attention=False, remat=False,
    )
    # deliberately leave the Switch defaults: the importer must flip them
    assert cfg.moe_routing == "switch"
    params = load_pretrained_backbone(str(ckpt), cfg)
    assert cfg.moe_routing == "mixtral"
    assert cfg.moe_capacity_factor >= cfg.moe_num_experts / cfg.moe_top_k

    rng = np.random.RandomState(11)
    ids = rng.randint(0, 512, size=(2, 16)).astype(np.int32)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids).long()).logits.numpy()
    ours, _ = decoder_forward(cfg, jax.tree.map(np.asarray, params), input_ids=ids)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-4, rtol=1e-3)


def test_mixtral_routing_differs_from_switch(tmp_path):
    """The bug the oracle test guards against: Switch routing on the same
    weights produces different (down-scaled) outputs."""
    from llark_tpu.models.decoder import init_decoder_params
    from llark_tpu.models.moe import moe_ffn

    cfg = ModelConfig.tiny(
        moe_num_experts=4, moe_top_k=2, moe_capacity_factor=2.0,
        dtype="float32", param_dtype="float32",
    )
    params = init_decoder_params(cfg, jax.random.PRNGKey(3))
    lp = {k: np.asarray(v)[0] for k, v in params["layers"].items()
          if k.startswith("moe_")}
    y = np.random.RandomState(5).randn(1, 8, cfg.hidden_size).astype(np.float32)

    out_switch, _ = moe_ffn(cfg, lp, y)
    cfg.moe_routing = "mixtral"
    out_mixtral, _ = moe_ffn(cfg, lp, y)
    # renormalized gates sum to 1 > raw top-2 softmax mass: outputs scale up
    assert not np.allclose(np.asarray(out_switch), np.asarray(out_mixtral))
    assert (np.abs(np.asarray(out_mixtral)).mean()
            > np.abs(np.asarray(out_switch)).mean())


# ---------------------------------------------------------------------------
# ADVICE r3 #3 (medium): paged kv_block_size VMEM guard
# ---------------------------------------------------------------------------


def test_max_paged_block_size_budget():
    from llark_tpu.ops.decode_attention import max_paged_block_size

    # the advisor's example: 32 KV heads, d=128, bf16 at block 512 buffers
    # 16 MiB — over the ~8 MiB budget the dense path enforces by halving
    cap = max_paged_block_size(32, 128, 2)
    assert cap < 512
    assert cap % 8 == 0
    assert 32 * 128 * cap * 2 * 4 <= 8 * 1024 * 1024


def _tiny_server_parts():
    bundle = TokenizerBundle.from_tokenizer(WordTokenizer(128))
    cfg = ModelConfig.tiny(dtype="float32", mm_hidden_size=8)
    cfg.vocab_size = int(np.ceil(len(bundle.tokenizer) / 128) * 128)
    params = init_llark_params(cfg, jax.random.PRNGKey(0))
    return bundle, cfg, params


def test_server_rejects_vmem_unsafe_kv_block_size():
    from llark_tpu.generate import GenerationConfig

    bundle, cfg, params = _tiny_server_parts()
    # tiny cfg: 4 KV heads x d16 fp32 -> cap is 8 MiB/(4*16*4*4) = 8192
    with pytest.raises(ValueError, match="VMEM-safe"):
        BatchedServer(
            cfg, params, bundle.audio_patch_id,
            GenerationConfig(max_new_tokens=4, temperature=0.0, stop_text=""),
            max_batch=2, max_cache_len=16384, prompt_buckets=(16,),
            decode_chunk=2, kv_block_size=16384, kv_pool_blocks=4,
        )


# ---------------------------------------------------------------------------
# ADVICE r3 #4 (low): failed admission must return blocks to the pool
# ---------------------------------------------------------------------------


def test_admission_failure_returns_blocks_to_pool():
    """A prefill that raises during admission — after the pool blocks were
    allocated — must free them again, otherwise every failure permanently
    shrinks the pool. Injected at the paged chunk program (mirroring
    test_http_server's exploding-decode pattern) because since round 4 the
    bucket-alignment misconfiguration this test used to ride is rejected
    at construction and can no longer reach the admission try/except."""
    from llark_tpu.generate import GenerationConfig

    bundle, cfg, params = _tiny_server_parts()
    server = BatchedServer(
        cfg, params, bundle.audio_patch_id,
        GenerationConfig(max_new_tokens=4, temperature=0.0, stop_text="",
                         decode_chunk=2),
        max_batch=2, max_cache_len=64, prompt_buckets=(16,),
        max_audio_frames=4, decode_chunk=2,
        kv_block_size=8, kv_pool_blocks=2 + 8, prefill_chunk=16,
    )

    def exploding_chunk(*a, **k):
        raise RuntimeError("injected prefill failure (e.g. XLA OOM)")

    # _paged_chunk_fn() hands this straight to _chunked_prefill, so the
    # failure fires after _admit committed the blocks to pending_blocks
    server._prefill_chunk_paged = exploding_chunk
    free_before = server._allocator.free_blocks
    req = Request(np.arange(4, 16, dtype=np.int32))
    with pytest.raises(RuntimeError, match="injected prefill failure"):
        server.serve([req])
    assert server._allocator.free_blocks == free_before


# ---------------------------------------------------------------------------
# ADVICE r3 #5 (low): weights cache keyed by realpath
# ---------------------------------------------------------------------------


def test_neural_load_params_cache_keyed_by_realpath():
    from llark_tpu.audio import neural

    if not os.path.exists(neural.WEIGHTS_PATH):
        pytest.skip("annotator weights not present")
    a = neural.load_params(neural.WEIGHTS_PATH)
    rel = os.path.relpath(neural.WEIGHTS_PATH)
    b = neural.load_params(rel)
    assert a is b  # same cache entry, no re-read
