"""Adaptive decode rounds (decode_chunk_drain).

The low-load TTFT floor is the unpreemptible in-flight decode round: a
queued arrival waits out up to decode_chunk tokens for every live slot
before admission can run. With decode_chunk_drain set, rounds dispatched
while requests are queued (and a slot is free to admit into) run a
shorter compiled decode program. Identical per-token math — greedy
tokens must match exactly in fp32.
"""

import numpy as np
import pytest

import jax

from llark_tpu.config import ModelConfig
from llark_tpu.generate import GenerationConfig
from llark_tpu.inference.server import BatchedServer, Request
from llark_tpu.models.fusion import init_llark_params
from llark_tpu.tokenization import TokenizerBundle, WordTokenizer


@pytest.fixture(scope="module")
def setup():
    bundle = TokenizerBundle.from_tokenizer(WordTokenizer(128))
    cfg = ModelConfig.tiny(dtype="float32", mm_hidden_size=8)
    cfg.vocab_size = int(np.ceil(len(bundle.tokenizer) / 128) * 128)
    params = init_llark_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(9)
    prompts = [rng.randint(4, 40, n).astype(np.int32)
               for n in (5, 9, 6, 11, 7)]
    return bundle, cfg, params, prompts


def _server(bundle, cfg, params, **kw):
    return BatchedServer(
        cfg, params, bundle.audio_patch_id,
        GenerationConfig(max_new_tokens=6, temperature=0.0, stop_text="",
                         decode_chunk=4),
        max_batch=2, max_cache_len=64, prompt_buckets=(16,),
        max_audio_frames=4, decode_chunk=4, **kw,
    )


def test_drain_serve_token_equal(setup):
    """5 requests through 2 slots keep the queue non-empty for most of the
    run, so drain rounds actually fire; tokens match the plain serve."""
    bundle, cfg, params, prompts = setup

    def run(**kw):
        server = _server(bundle, cfg, params, **kw)
        out = server.serve([Request(p.copy()) for p in prompts])
        return [r.tokens for r in out]

    assert run() == run(decode_chunk_drain=1)
    assert run() == run(decode_chunk_drain=2)


def test_drain_program_fires_only_with_free_slot(setup):
    """The short program runs exactly when a slot is free (latency mode —
    an arrival could be admitted the moment the round ends); at full
    occupancy every round is the full chunk (throughput mode)."""
    bundle, cfg, params, prompts = setup
    server = _server(bundle, cfg, params, decode_chunk_drain=2)
    calls = {"full": 0, "drain": 0}
    real_full, real_drain = server._decode_n, server._decode_n_drain

    def count_full(*a):
        calls["full"] += 1
        return real_full(*a)

    def count_drain(*a):
        calls["drain"] += 1
        return real_drain(*a)

    server._decode_n, server._decode_n_drain = count_full, count_drain
    server.serve([Request(p.copy()) for p in prompts])
    assert calls["full"] > 0   # 5 requests / 2 slots: mostly fully busy
    assert calls["drain"] > 0  # tail: one live row, one free slot
    # both-slots-busy rounds (identical max_new, retire together): the
    # drain program never fires with exactly max_batch live rows
    calls["full"] = calls["drain"] = 0
    server.serve([Request(p.copy()) for p in prompts[:2]])
    assert calls["drain"] == 0
    assert calls["full"] > 0


def test_drain_validation(setup):
    bundle, cfg, params, _ = setup
    with pytest.raises(ValueError, match="decode_chunk_drain"):
        _server(bundle, cfg, params, decode_chunk_drain=8)  # > decode_chunk
    with pytest.raises(ValueError, match="decode_chunk_drain"):
        _server(bundle, cfg, params, decode_chunk_drain=0)


def test_drain_with_paged_and_chunked_prefill(setup):
    """Drain composes with the paged direct-to-pool admission path (the
    interleaved mid-prefill decode rounds may also run short)."""
    bundle, cfg, params, prompts = setup

    def run(**kw):
        server = _server(bundle, cfg, params, kv_block_size=8,
                         prefill_chunk=8, **kw)
        out = server.serve([Request(p.copy()) for p in prompts])
        assert server._allocator.free_blocks == (
            server.kv_pool_blocks - server.max_batch
        )
        return [r.tokens for r in out]

    assert run() == run(decode_chunk_drain=1)


def test_drain_inert_under_speculation_warns(setup, caplog):
    """Speculative rounds replace plain decode rounds, so the drain
    program never dispatches — the pairing warns at init instead of
    silently ignoring the knob, and serving still works."""
    import logging

    bundle, cfg, params, prompts = setup
    with caplog.at_level(logging.WARNING, "llark_tpu.inference.server"):
        server = _server(
            bundle, cfg, params, decode_chunk_drain=1, spec_mode="ngram",
        )
    assert any("inert under speculation" in r.message for r in caplog.records)
    out = server.serve([Request(prompts[0].copy())])
    assert len(out[0].tokens) == 6
