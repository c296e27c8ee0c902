"""Continuous-batching server: token equality vs the one-shot Generator,
slot reuse, stop handling."""

import numpy as np
import pytest

import jax

from llark_tpu.config import ModelConfig
from llark_tpu.generate import GenerationConfig, Generator
from llark_tpu.inference.server import BatchedServer, Request
from llark_tpu.models.fusion import init_llark_params
from llark_tpu.tokenization import TokenizerBundle, WordTokenizer


@pytest.fixture(scope="module")
def setup():
    bundle = TokenizerBundle.from_tokenizer(WordTokenizer(128))
    cfg = ModelConfig.tiny(dtype="float32", mm_hidden_size=8)
    cfg.vocab_size = int(np.ceil(len(bundle.tokenizer) / 128) * 128)
    params = init_llark_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    reqs = []
    for i, L in enumerate([5, 9, 7, 6, 11, 4]):
        ids = rng.randint(4, 40, L).astype(np.int32)
        ids[0] = bundle.tokenizer.bos_token_id
        audio = rng.randn(3, 8).astype(np.float32) if i % 2 == 0 else None
        reqs.append((ids, audio))
    return bundle, cfg, params, reqs


def _reference_tokens(bundle, cfg, params, reqs, max_new):
    gen_cfg = GenerationConfig(max_new_tokens=max_new, temperature=0.0,
                               stop_text="", decode_chunk=2)
    out = []
    for ids, audio in reqs:
        gen = Generator(cfg, params, bundle.audio_patch_id, gen_cfg,
                        max_cache_len=64)
        b_ids = np.zeros((1, 16), np.int32)
        b_ids[0, :len(ids)] = ids
        if audio is None:
            toks = gen.generate(b_ids, np.array([len(ids)], np.int32))
        else:
            toks = gen.generate(b_ids, np.array([len(ids)], np.int32),
                                audio[None], np.array([audio.shape[0]], np.int32))
        out.append(toks[0])
    return out


def test_server_matches_generator(setup):
    """6 requests through 2 slots (forcing waves of admission + slot reuse)
    produce exactly the per-request greedy tokens of the one-shot path."""
    bundle, cfg, params, reqs = setup
    max_new = 6
    ref = _reference_tokens(bundle, cfg, params, reqs, max_new)

    server = BatchedServer(
        cfg, params, bundle.audio_patch_id,
        GenerationConfig(max_new_tokens=max_new, temperature=0.0,
                         stop_text="", decode_chunk=2),
        max_batch=2, max_cache_len=64, prompt_buckets=(16,),
        max_audio_frames=4, decode_chunk=2,
    )
    out = server.serve([Request(ids, audio) for ids, audio in reqs])
    got = [r.tokens for r in out]
    assert got == ref

    stats = server.stats(out)
    assert stats["requests"] == 6 and stats["tokens"] == 6 * max_new
    assert np.isfinite(stats["tokens_per_sec"])


def test_server_stop_text_frees_slot(setup):
    """stop_text retirement frees slots early; queued requests still finish."""
    bundle, cfg, params, reqs = setup

    class StopEverything:
        eos_token_id = None
        def decode(self, toks):
            return "###"  # every decode looks like a stop

    server = BatchedServer(
        cfg, params, bundle.audio_patch_id,
        GenerationConfig(max_new_tokens=8, temperature=0.0,
                         stop_text="###", decode_chunk=2),
        max_batch=2, max_cache_len=64, prompt_buckets=(16,),
        max_audio_frames=4, decode_chunk=2, tokenizer=StopEverything(),
    )
    out = server.serve([Request(ids, audio) for ids, audio in reqs])
    assert all(r.done for r in out)
    # Generator semantics: the stop keyword is trimmed from the output —
    # with a tokenizer whose every decode matches, everything trims away
    assert all(len(r.tokens) == 0 for r in out)


def test_server_rejects_oversized_prompt(setup):
    bundle, cfg, params, _ = setup
    server = BatchedServer(
        cfg, params, bundle.audio_patch_id,
        GenerationConfig(max_new_tokens=60, temperature=0.0, stop_text=""),
        max_batch=2, max_cache_len=64, prompt_buckets=(64,), decode_chunk=2,
    )
    big = Request(np.arange(4, 20, dtype=np.int32))
    with pytest.raises(ValueError):
        server.serve([big])


def test_server_chunked_prefill_matches_generator(setup):
    """prefill_chunk admission is token-identical to one-shot prefill
    (chunk boundaries are invisible: attention depends only on positions)."""
    bundle, cfg, params, reqs = setup
    max_new = 6
    ref = _reference_tokens(bundle, cfg, params, reqs, max_new)

    server = BatchedServer(
        cfg, params, bundle.audio_patch_id,
        GenerationConfig(max_new_tokens=max_new, temperature=0.0,
                         stop_text="", decode_chunk=2),
        max_batch=2, max_cache_len=64, prompt_buckets=(16,),
        max_audio_frames=4, decode_chunk=2, prefill_chunk=5,
    )
    out = server.serve([Request(ids, audio) for ids, audio in reqs])
    assert [r.tokens for r in out] == ref


def test_speculative_server_matches_generator(setup):
    """Speculative serving (fused draft-propose -> target-verify rounds in
    the slot engine) emits exactly the plain greedy tokens, independent of
    draft quality -- here the draft is a DIFFERENT random tiny model, so
    acceptance is near zero and every round falls back to the target's own
    token."""
    bundle, cfg, params, reqs = setup
    max_new = 6
    ref = _reference_tokens(bundle, cfg, params, reqs, max_new)

    draft_cfg = ModelConfig.tiny(dtype="float32", mm_hidden_size=8)
    draft_cfg.vocab_size = cfg.vocab_size
    draft_params = init_llark_params(draft_cfg, jax.random.PRNGKey(7))

    server = BatchedServer(
        cfg, params, bundle.audio_patch_id,
        GenerationConfig(max_new_tokens=max_new, temperature=0.0,
                         stop_text="", decode_chunk=2),
        max_batch=2, max_cache_len=64, prompt_buckets=(16,),
        max_audio_frames=4, decode_chunk=2,
        draft_cfg=draft_cfg, draft_params=draft_params,
        gamma=3, spec_rounds=2,
    )
    out = server.serve([Request(ids, audio) for ids, audio in reqs])
    got = [r.tokens for r in out]
    assert got == ref


def test_server_ngram_spec_matches_generator(setup):
    """Draft-free (prompt-lookup) speculative serving is token-identical
    to plain greedy serving: wrong proposals cost acceptance, never
    correctness (fp32 tiny model -> deterministic argmax)."""
    bundle, cfg, params, reqs = setup
    max_new = 6
    ref = _reference_tokens(bundle, cfg, params, reqs, max_new)

    server = BatchedServer(
        cfg, params, bundle.audio_patch_id,
        GenerationConfig(max_new_tokens=max_new, temperature=0.0,
                         stop_text=""),
        max_batch=2, max_cache_len=64, prompt_buckets=(16,),
        max_audio_frames=4, spec_mode="ngram", gamma=3,
    )
    out = server.serve([Request(ids, audio) for ids, audio in reqs])
    assert [r.tokens for r in out] == ref
    stats = server.stats(out)
    assert "spec_acceptance" in stats
    assert 0.0 <= stats["spec_acceptance"] <= 1.0


def test_server_oracle_proposer_full_acceptance(setup):
    """An oracle proposer (knows the greedy continuation) drives
    acceptance to 1.0 and still emits exactly the greedy tokens — the
    bench's controlled-acceptance hook works end-to-end."""
    bundle, cfg, params, reqs = setup
    max_new = 8
    ref = _reference_tokens(bundle, cfg, params, reqs, max_new)
    by_prompt = {tuple(map(int, ids)): toks for (ids, _), toks in zip(reqs, ref)}

    def oracle(history, gamma):
        # find which request this history extends, then propose its true
        # greedy continuation
        for plen in range(len(history), 0, -1):
            key = tuple(history[:plen])
            if key in by_prompt:
                emitted = len(history) - plen
                cont = by_prompt[key][emitted:emitted + gamma]
                return list(cont) + [0] * (gamma - len(cont))
        return [0] * gamma

    server = BatchedServer(
        cfg, params, bundle.audio_patch_id,
        GenerationConfig(max_new_tokens=max_new, temperature=0.0,
                         stop_text=""),
        max_batch=2, max_cache_len=64, prompt_buckets=(16,),
        max_audio_frames=4, spec_mode="ngram", gamma=3,
        spec_proposer=oracle,
    )
    out = server.serve([Request(ids, audio) for ids, audio in reqs])
    assert [r.tokens for r in out] == ref
    stats = server.stats(out)
    # every proposal inside max_new accepted; only tail rounds truncate
    assert stats["spec_acceptance"] >= 0.8, stats


def test_paged_server_matches_generator(setup):
    """Paged-KV serving (block pool + per-slot tables) emits exactly the
    dense greedy tokens while the pool holds less HBM than the dense
    cache would (2 slots x 4 blocks dense = 8; pool carries 4 usable)."""
    bundle, cfg, params, reqs = setup
    max_new = 6
    ref = _reference_tokens(bundle, cfg, params, reqs, max_new)

    server = BatchedServer(
        cfg, params, bundle.audio_patch_id,
        GenerationConfig(max_new_tokens=max_new, temperature=0.0,
                         stop_text=""),
        max_batch=2, max_cache_len=64, prompt_buckets=(16,),
        max_audio_frames=4, decode_chunk=2,
        kv_block_size=16, kv_pool_blocks=2 + 4,
    )
    out = server.serve([Request(ids, audio) for ids, audio in reqs])
    assert [r.tokens for r in out] == ref
    # all blocks returned to the pool after the wave
    assert server._allocator.free_blocks == 4


def test_paged_server_pool_exhaustion_queues(setup):
    """A pool that fits only ONE request's blocks serializes admission by
    capacity (not slots) and still completes every request exactly."""
    bundle, cfg, params, reqs = setup
    max_new = 6
    ref = _reference_tokens(bundle, cfg, params, reqs, max_new)

    server = BatchedServer(
        cfg, params, bundle.audio_patch_id,
        GenerationConfig(max_new_tokens=max_new, temperature=0.0,
                         stop_text=""),
        max_batch=2, max_cache_len=64, prompt_buckets=(16,),
        max_audio_frames=4, decode_chunk=2,
        kv_block_size=16, kv_pool_blocks=2 + 2,
    )
    out = server.serve([Request(ids, audio) for ids, audio in reqs])
    assert [r.tokens for r in out] == ref


def test_paged_server_with_ngram_spec(setup):
    """Paged KV composes with draft-free speculation: verify windows write
    and read through the block tables, tokens stay exact."""
    bundle, cfg, params, reqs = setup
    max_new = 6
    ref = _reference_tokens(bundle, cfg, params, reqs, max_new)

    server = BatchedServer(
        cfg, params, bundle.audio_patch_id,
        GenerationConfig(max_new_tokens=max_new, temperature=0.0,
                         stop_text=""),
        max_batch=2, max_cache_len=64, prompt_buckets=(16,),
        max_audio_frames=4, spec_mode="ngram", gamma=3,
        kv_block_size=16, kv_pool_blocks=2 + 6,
    )
    out = server.serve([Request(ids, audio) for ids, audio in reqs])
    assert [r.tokens for r in out] == ref


def test_paged_server_with_draft_spec(setup):
    """Paged KV composes with FUSED draft speculation (round 4; was an
    excluded combination): the fused propose->verify rounds write the
    target cache through the block tables while the dense draft cache
    rides alongside; greedy tokens stay exactly the plain ones even with
    a near-zero-acceptance random draft."""
    bundle, cfg, params, reqs = setup
    max_new = 6
    ref = _reference_tokens(bundle, cfg, params, reqs, max_new)

    draft_cfg = ModelConfig.tiny(dtype="float32", mm_hidden_size=8)
    draft_cfg.vocab_size = cfg.vocab_size
    draft_params = init_llark_params(draft_cfg, jax.random.PRNGKey(7))

    server = BatchedServer(
        cfg, params, bundle.audio_patch_id,
        GenerationConfig(max_new_tokens=max_new, temperature=0.0,
                         stop_text="", decode_chunk=2),
        max_batch=2, max_cache_len=64, prompt_buckets=(16,),
        max_audio_frames=4, decode_chunk=2,
        draft_cfg=draft_cfg, draft_params=draft_params,
        gamma=3, spec_rounds=2,
        kv_block_size=16, kv_pool_blocks=2 + 6,
    )
    out = server.serve([Request(ids, audio) for ids, audio in reqs])
    assert [r.tokens for r in out] == ref
    assert server._allocator.free_blocks == 6  # all blocks returned


def test_server_admit_batch_one_matches_generator(setup):
    """admit_batch=1 (the transient-HBM knob: each admission prefills a
    single row) still produces the exact one-shot greedy tokens — both on
    the dense cache and through the paged block pool."""
    bundle, cfg, params, reqs = setup
    max_new = 6
    ref = _reference_tokens(bundle, cfg, params, reqs, max_new)

    for paged_kw in ({}, {"kv_block_size": 16, "kv_pool_blocks": 3 + 9}):
        server = BatchedServer(
            cfg, params, bundle.audio_patch_id,
            GenerationConfig(max_new_tokens=max_new, temperature=0.0,
                             stop_text="", decode_chunk=2),
            max_batch=3, max_cache_len=64, prompt_buckets=(16,),
            max_audio_frames=4, decode_chunk=2, admit_batch=1,
            **paged_kw,
        )
        assert server.admit_batch == 1
        out = server.serve([Request(ids, audio) for ids, audio in reqs])
        assert [r.tokens for r in out] == ref


def test_paged_server_chunked_prefill_direct_to_pool(setup):
    """Paged + chunked prefill writes K/V straight into pool blocks
    (decoder paged_chunk path, no dense admission cache, no block insert)
    and still emits the exact one-shot greedy tokens."""
    bundle, cfg, params, reqs = setup
    max_new = 6
    ref = _reference_tokens(bundle, cfg, params, reqs, max_new)

    server = BatchedServer(
        cfg, params, bundle.audio_patch_id,
        GenerationConfig(max_new_tokens=max_new, temperature=0.0,
                         stop_text="", decode_chunk=2),
        max_batch=2, max_cache_len=64, prompt_buckets=(16,),
        max_audio_frames=4, decode_chunk=2, prefill_chunk=8,
        kv_block_size=8, kv_pool_blocks=2 + 8,
    )
    out = server.serve([Request(ids, audio) for ids, audio in reqs])
    assert [r.tokens for r in out] == ref
    # the direct path never builds the block-insert program
    assert server._paged_insert_by_n == {}
    assert server._prefill_chunk_paged is not None
    # all blocks returned to the pool after the wave
    assert server._allocator.free_blocks == 8


def test_paged_server_chunked_prefill_multiblock_chunks(setup):
    """prefill_chunk spanning several KV blocks per chunk (m=2)."""
    bundle, cfg, params, reqs = setup
    max_new = 4
    ref = _reference_tokens(bundle, cfg, params, reqs, max_new)

    server = BatchedServer(
        cfg, params, bundle.audio_patch_id,
        GenerationConfig(max_new_tokens=max_new, temperature=0.0,
                         stop_text="", decode_chunk=2),
        max_batch=3, max_cache_len=64, prompt_buckets=(16,),
        max_audio_frames=4, decode_chunk=2, prefill_chunk=16,
        admit_batch=2, kv_block_size=8, kv_pool_blocks=3 + 12,
    )
    out = server.serve([Request(ids, audio) for ids, audio in reqs])
    assert [r.tokens for r in out] == ref


def test_admit_hysteresis_no_deadlock_and_token_equal(setup):
    """admit_min_fill holds admissions for coalescing but must never idle
    the chip (admits when nothing is decoding) nor deadlock serve(); the
    output tokens are unchanged — hysteresis only re-times admission."""
    bundle, cfg, params, reqs = setup
    max_new = 6
    ref = _reference_tokens(bundle, cfg, params, reqs, max_new)

    server = BatchedServer(
        cfg, params, bundle.audio_patch_id,
        GenerationConfig(max_new_tokens=max_new, temperature=0.0,
                         stop_text="", decode_chunk=2),
        max_batch=2, max_cache_len=64, prompt_buckets=(16,),
        max_audio_frames=4, decode_chunk=2,
        admit_min_fill=3, admit_max_wait_s=1000.0,  # deadline never fires
    )
    out = server.serve([Request(ids, audio) for ids, audio in reqs])
    assert [r.tokens for r in out] == ref


def test_admit_ready_predicate(setup):
    """The hysteresis predicate: fires on empty decode, on a full wave, or
    on deadline; holds otherwise."""
    import time as _time

    bundle, cfg, params, _ = setup
    server = BatchedServer(
        cfg, params, bundle.audio_patch_id,
        GenerationConfig(max_new_tokens=4, temperature=0.0, stop_text=""),
        max_batch=4, max_cache_len=64, prompt_buckets=(16,),
        decode_chunk=2, admit_min_fill=3, admit_max_wait_s=60.0,
    )
    fresh = Request(np.arange(4, 9, dtype=np.int32))
    fresh.submitted_at = _time.time()
    stale = Request(np.arange(4, 9, dtype=np.int32))
    stale.submitted_at = _time.time() - 120.0

    server._queue = [fresh]
    assert server._admit_ready()  # nothing active: admit immediately
    server._slot_req[0] = Request(np.arange(3, dtype=np.int32))  # fake live row
    assert not server._admit_ready()  # 1 queued < min_fill 3, fresh
    server._queue = [fresh, fresh, fresh]
    assert server._admit_ready()  # full wave
    server._queue = [stale]
    assert server._admit_ready()  # deadline exceeded
    server._slot_req[0] = None
