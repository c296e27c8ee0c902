"""int8 KV cache: accuracy vs full-precision cache + path consistency."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from llark_tpu.config import ModelConfig
from llark_tpu.generate import GenerationConfig, Generator
from llark_tpu.models.decoder import init_kv_cache
from llark_tpu.models.fusion import init_llark_params

PATCH_ID = 7


def _cfgs():
    base = ModelConfig.tiny(dtype="float32", param_dtype="float32")
    quant = dataclasses.replace(base, kv_cache_quant=True)
    return base, quant


def _batch(cfg, seed=0):
    rng = np.random.RandomState(seed)
    T = 3
    audio = rng.randn(2, T, cfg.mm_hidden_size).astype(np.float32)
    prompts = [
        [9, 1, PATCH_ID, PATCH_ID, PATCH_ID, 4, 5],
        [9, PATCH_ID, PATCH_ID, PATCH_ID, 11],
    ]
    S = 8
    input_ids = np.zeros((len(prompts), S), np.int32)
    lengths = np.zeros((len(prompts),), np.int32)
    for i, p in enumerate(prompts):
        input_ids[i, : len(p)] = p
        lengths[i] = len(p)
    return input_ids, lengths, audio, np.full((len(prompts),), T, np.int32)


def test_quant_cache_structure():
    base, quant = _cfgs()
    c = init_kv_cache(quant, 2, 16)
    assert c["k"].dtype == jnp.int8 and c["v"].dtype == jnp.int8
    assert c["k_scale"].shape == c["k"].shape[:-1]
    assert "k_scale" not in init_kv_cache(base, 2, 16)


def test_quant_decode_logits_close_to_full_precision():
    """Per-position int8 KV quantization perturbs decode logits by well
    under the scale of the logits themselves."""
    base, quant = _cfgs()
    params = init_llark_params(base, jax.random.PRNGKey(0))
    input_ids, lengths, audio, counts = _batch(base)

    outs = {}
    for name, cfg in (("full", base), ("int8", quant)):
        gen = Generator(
            cfg, params, PATCH_ID,
            GenerationConfig(max_new_tokens=1, stop_text=""),
            max_cache_len=32,
        )
        logits, cache = gen._prefill(
            params, jnp.asarray(input_ids), jnp.asarray(lengths),
            jnp.asarray(audio), jnp.asarray(counts),
        )
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        # a few decode steps against the (possibly quantized) cache
        for step in range(4):
            logits, cache = gen._decode(
                params, tok, cache, jnp.asarray(lengths) + step
            )
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        outs[name] = np.asarray(logits)

    err = np.abs(outs["int8"] - outs["full"]).max()
    spread = np.abs(outs["full"]).max()
    assert err < 0.05 * spread, (err, spread)


def test_quant_generation_matches_full_precision_greedy():
    """On a tiny model the int8-cache greedy rollout matches full precision
    (logit gaps dwarf the quantization noise at these scales)."""
    base, quant = _cfgs()
    params = init_llark_params(base, jax.random.PRNGKey(0))
    input_ids, lengths, audio, counts = _batch(base)
    gen_cfg = GenerationConfig(max_new_tokens=10, stop_text="")

    ref = Generator(base, params, PATCH_ID, gen_cfg, max_cache_len=64).generate(
        input_ids, lengths, audio, counts
    )
    got = Generator(quant, params, PATCH_ID, gen_cfg, max_cache_len=64).generate(
        input_ids, lengths, audio, counts
    )
    assert got == ref


def test_server_with_quant_cache_matches_quant_generator():
    """Continuous batching and one-shot generation agree token-for-token
    when both run the int8 cache (path consistency, not accuracy)."""
    from llark_tpu.inference.server import BatchedServer, Request

    _, quant = _cfgs()
    params = init_llark_params(quant, jax.random.PRNGKey(1))
    rng = np.random.RandomState(1)
    reqs = []
    for i in range(4):
        n = 4 + (i % 3)
        ids = rng.randint(1, quant.vocab_size - 8, size=(n,)).astype(np.int32)
        reqs.append((ids, None))
    max_new = 5
    gen = Generator(
        quant, params, PATCH_ID,
        GenerationConfig(max_new_tokens=max_new, stop_text=""),
        max_cache_len=64,
    )
    ref = []
    for ids, _ in reqs:
        b = np.zeros((1, 8), np.int32)
        b[0, : len(ids)] = ids
        ref.append(gen.generate(b, np.array([len(ids)], np.int32))[0])

    server = BatchedServer(
        quant, params, PATCH_ID,
        GenerationConfig(max_new_tokens=max_new, temperature=0.0,
                         stop_text="", decode_chunk=2),
        max_batch=2, max_cache_len=64, prompt_buckets=(8,),
        max_audio_frames=4, decode_chunk=2,
    )
    out = server.serve([Request(ids) for ids, _ in reqs])
    assert [r.tokens for r in out] == ref


def test_beam_preserves_quant_cache_leaves():
    """BeamSearcher must carry the int8-cache scale leaves through beam
    expansion and reorder: k=1 beam equals the quant Generator greedy."""
    from llark_tpu.inference.beam import BeamSearchConfig, BeamSearcher

    base, quant = _cfgs()
    params = init_llark_params(base, jax.random.PRNGKey(0))
    input_ids, lengths, audio, counts = _batch(base)
    n_new = 8

    ref = Generator(
        quant, params, PATCH_ID,
        GenerationConfig(max_new_tokens=n_new, stop_text=""),
        max_cache_len=64,
    ).generate(input_ids, lengths, audio, counts)
    beam = BeamSearcher(
        quant, params, PATCH_ID,
        BeamSearchConfig(num_beams=1, max_new_tokens=n_new, stop_text=""),
        max_cache_len=64,
    ).generate(input_ids, lengths, audio, counts)
    assert beam == ref
    # wider beams run without dropping leaves either
    out = BeamSearcher(
        quant, params, PATCH_ID,
        BeamSearchConfig(num_beams=3, max_new_tokens=4, stop_text=""),
        max_cache_len=64,
    ).generate(input_ids, lengths, audio, counts)
    assert all(len(row) == 4 for row in out)


def test_server_chunked_prefill_with_quant_cache_runs():
    """--prefill-chunk + int8 cache serves to completion (agreement with
    one-shot is within quantization noise, not token-exact — documented)."""
    from llark_tpu.inference.server import BatchedServer, Request

    _, quant = _cfgs()
    params = init_llark_params(quant, jax.random.PRNGKey(1))
    rng = np.random.RandomState(2)
    reqs = [Request(rng.randint(1, quant.vocab_size - 8, size=(5 + i,)).astype(np.int32))
            for i in range(3)]
    server = BatchedServer(
        quant, params, PATCH_ID,
        GenerationConfig(max_new_tokens=4, temperature=0.0,
                         stop_text="", decode_chunk=2),
        max_batch=2, max_cache_len=64, prompt_buckets=(8,),
        max_audio_frames=4, decode_chunk=2, prefill_chunk=3,  # pads 8 -> 9
    )
    out = server.serve(reqs)
    assert all(len(r.tokens) == 4 for r in out)
