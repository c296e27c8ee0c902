"""Prefix caching: the shared conversation-header KV is computed once and
admission prefills only per-request suffixes (reference context: every
LLark prompt opens with the fixed conv_v1_2 header,
m2t/llava/conversation.py:237-271). With full-precision caches the result
must be token-identical to full prefill."""

import numpy as np
import pytest

import jax

from llark_tpu.config import ModelConfig
from llark_tpu.generate import GenerationConfig
from llark_tpu.infer import _common_prompt_prefix
from llark_tpu.inference.server import BatchedServer, Request
from llark_tpu.models.fusion import init_llark_params
from llark_tpu.tokenization import TokenizerBundle, WordTokenizer


@pytest.fixture(scope="module")
def setup():
    bundle = TokenizerBundle.from_tokenizer(WordTokenizer(128))
    cfg = ModelConfig.tiny(dtype="float32", mm_hidden_size=8)
    cfg.vocab_size = int(np.ceil(len(bundle.tokenizer) / 128) * 128)
    params = init_llark_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(7)
    header = rng.randint(4, 40, 12).astype(np.int32)
    header[0] = bundle.tokenizer.bos_token_id
    reqs = []
    for i, L in enumerate([5, 9, 7, 6, 11, 4]):
        suffix = rng.randint(4, 40, L).astype(np.int32)
        ids = np.concatenate([header, suffix])
        audio = rng.randn(3, 8).astype(np.float32) if i % 2 == 0 else None
        reqs.append((ids, audio))
    return bundle, cfg, params, header, reqs


def _serve(bundle, cfg, params, reqs, max_new, **kw):
    server = BatchedServer(
        cfg, params, bundle.audio_patch_id,
        GenerationConfig(max_new_tokens=max_new, temperature=0.0,
                         stop_text="", decode_chunk=2),
        max_batch=2, max_cache_len=64, prompt_buckets=(16, 32),
        max_audio_frames=4, tokenizer=bundle.tokenizer, **kw,
    )
    out = server.serve([Request(ids, audio) for ids, audio in reqs])
    return [r.tokens for r in out], server


def test_prefix_server_matches_full_prefill(setup):
    """6 requests (shared 12-token header + ragged suffixes, some with
    audio) through 2 slots: prefix-cached admission produces exactly the
    tokens of full-prompt admission (float32 cache => bit-identical)."""
    bundle, cfg, params, header, reqs = setup
    ref, _ = _serve(bundle, cfg, params, reqs, max_new=6)
    got, server = _serve(
        bundle, cfg, params, reqs, max_new=6, shared_prefix_ids=header
    )
    assert server._prefix_len == len(header)
    assert server._prefix_cache is not None  # the one-time prefill ran
    for i, (r, g) in enumerate(zip(ref, got)):
        assert r == g, f"request {i}: {r} != {g}"


def test_prefix_server_rejects_bad_prompt(setup):
    bundle, cfg, params, header, reqs = setup
    server = BatchedServer(
        cfg, params, bundle.audio_patch_id,
        GenerationConfig(max_new_tokens=4, temperature=0.0, stop_text="",
                         decode_chunk=2),
        max_batch=2, max_cache_len=64, prompt_buckets=(16, 32),
        max_audio_frames=4, tokenizer=bundle.tokenizer,
        shared_prefix_ids=header,
    )
    bad = np.arange(4, 24).astype(np.int32)  # does not start with header
    with pytest.raises(ValueError, match="shared prefix"):
        server.serve([Request(bad)])
    # engine-style path (queue directly): fails the request, not the batch
    good = Request(reqs[1][0], reqs[1][1])
    server._queue.extend([Request(bad), good])
    while server._queue or server._active():
        server._admit()
        server._decode_round()
    assert server._queue == [] and good.done and good.error is None
    assert len(good.tokens) == 4


def test_prefix_config_guards(setup):
    bundle, cfg, params, header, _ = setup
    with pytest.raises(ValueError, match="mutually exclusive"):
        BatchedServer(cfg, params, bundle.audio_patch_id,
                      shared_prefix_ids=header, prefill_chunk=8)
    with pytest.raises(ValueError, match="text-only"):
        BatchedServer(
            cfg, params, bundle.audio_patch_id,
            shared_prefix_ids=np.array([3, bundle.audio_patch_id], np.int32),
        )


def test_common_prompt_prefix_helper():
    ap = 99
    a = np.array([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11], np.int32)
    b = np.array([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 12], np.int32)
    lcp = _common_prompt_prefix([a, b], ap, min_len=4)
    assert lcp.tolist() == a[:10].tolist()
    # audio tokens end the shared prefix (they belong to suffixes)
    c = np.array([1, 2, 3, 4, ap, 6, 7, 8, 9, 10, 11], np.int32)
    assert _common_prompt_prefix([c, c.copy()], ap, min_len=4).tolist() == [1, 2, 3, 4]
    # every request must keep >= 1 suffix token
    d = a[:6]
    assert _common_prompt_prefix([a, d], ap, min_len=4).tolist() == a[:5].tolist()
    # below min_len -> disabled
    assert _common_prompt_prefix([a, np.array([1, 9, 9], np.int32)], ap) is None


def test_paged_prefix_matches_dense_and_plain_paged(setup):
    """Paged prefix caching (shared pool blocks + suffix-only direct-to-
    pool chunked prefill) is token-identical at fp32 to BOTH the plain
    dense server and the plain paged server on the same requests. The
    12-token header shares one 8-token block; its 4-token remainder folds
    into every suffix."""
    bundle, cfg, params, header, reqs = setup
    ref, _ = _serve(bundle, cfg, params, reqs, max_new=6)
    paged_plain, _ = _serve(
        bundle, cfg, params, reqs, max_new=6,
        kv_block_size=8, prefill_chunk=8,
    )
    got, server = _serve(
        bundle, cfg, params, reqs, max_new=6,
        shared_prefix_ids=header, kv_block_size=8, prefill_chunk=8,
    )
    assert server._prefix_match_len == len(header) == 12
    assert server._prefix_len == 8  # block-aligned head
    assert server._shared_block_ids is not None
    assert len(server._shared_block_ids) == 1
    for i, (r, p, g) in enumerate(zip(ref, paged_plain, got)):
        assert r == p, f"request {i} (plain paged): {r} != {p}"
        assert r == g, f"request {i} (paged prefix): {r} != {g}"


def test_paged_prefix_pool_accounting(setup):
    """Shared prefix blocks are allocated once and NEVER freed; every
    private block returns to the pool at retirement."""
    bundle, cfg, params, header, reqs = setup
    _, server = _serve(
        bundle, cfg, params, reqs, max_new=6,
        shared_prefix_ids=header, kv_block_size=8, prefill_chunk=8,
    )
    alloc = server._allocator
    n_shared = len(server._shared_block_ids)
    # pool minus parking minus shared == free after all retirements
    assert alloc.free_blocks == (
        server.kv_pool_blocks - alloc.num_reserved - n_shared
    )
    assert all(b not in alloc._free for b in server._shared_block_ids)
    assert all(not blks for blks in server._slot_blocks)


def test_paged_prefix_config_guards(setup):
    bundle, cfg, params, header, _ = setup
    # paged prefix rides the chunked direct-to-pool path
    with pytest.raises(ValueError, match="prefill_chunk"):
        BatchedServer(cfg, params, bundle.audio_patch_id,
                      shared_prefix_ids=header, kv_block_size=8)
    # a prefix shorter than one block has nothing to share
    with pytest.raises(ValueError, match="shorter"):
        BatchedServer(cfg, params, bundle.audio_patch_id,
                      shared_prefix_ids=header[:5], kv_block_size=8,
                      prefill_chunk=8)
    # impossible bucket geometry fails at STARTUP, not as an opaque numpy
    # broadcast error at the first admission (which would kill an
    # OnlineEngine's engine thread under queued requests): a 32-token
    # cached prefix leaves room for 4 pool blocks, but a 48-token bucket
    # needs 6 — and it is the ONLY bucket, so nothing survives filtering
    # 32 tokens (4 blocks), reusing the fixture header's known-text-only ids
    big_header = np.tile(header, 3)[:32].astype(np.int32)
    with pytest.raises(ValueError, match="no prompt bucket"):
        BatchedServer(cfg, params, bundle.audio_patch_id,
                      max_cache_len=64, prompt_buckets=(48,),
                      shared_prefix_ids=big_header, kv_block_size=8,
                      prefill_chunk=8)
    # dense prefix mode: an over-size bucket is FILTERED (round 5 — the
    # config still serves everything its feasible buckets can hold), so
    # construction succeeds with only the 16 bucket live
    s = BatchedServer(cfg, params, bundle.audio_patch_id,
                      max_cache_len=64, prompt_buckets=(16, 56),
                      shared_prefix_ids=header)
    assert s.prompt_buckets == (16,)
    # paged chunked admission requires chunk-aligned buckets — also a
    # startup error now
    with pytest.raises(ValueError, match="multiple of prefill_chunk"):
        BatchedServer(cfg, params, bundle.audio_patch_id,
                      max_cache_len=64, prompt_buckets=(12,),
                      kv_block_size=8, prefill_chunk=8)


def test_daemon_probe_prefix_paged_engine():
    """The HTTP daemon derives the shareable prefix from two probe
    prompts (it cannot see future requests); every REAL prompt built by
    build_prompt_ids must then start with that prefix, and paged-prefix
    serving through the OnlineEngine must match the plain server."""
    from llark_tpu.infer import _common_prompt_prefix, build_prompt_ids
    from llark_tpu.inference.http_server import OnlineEngine

    bundle = TokenizerBundle.from_tokenizer(WordTokenizer(128))
    prompts = ["describe this sound .", "what genre is it ?", "explain ."]
    probes = [
        np.asarray(build_prompt_ids("probe one", 4, bundle), np.int32),
        np.asarray(
            build_prompt_ids("entirely different probe text", 0, bundle),
            np.int32,
        ),
    ]
    for p in prompts:  # intern the full vocab BEFORE sizing the model
        build_prompt_ids(p, 3, bundle)
    cfg = ModelConfig.tiny(dtype="float32", mm_hidden_size=8)
    cfg.vocab_size = int(np.ceil(len(bundle.tokenizer) / 128) * 128)
    params = init_llark_params(cfg, jax.random.PRNGKey(1))
    shared = _common_prompt_prefix(probes, bundle.audio_patch_id)
    assert shared is not None and len(shared) >= 8
    rng = np.random.RandomState(3)
    reqs = []
    for p in prompts:
        ids = np.asarray(build_prompt_ids(p, 3, bundle), np.int32)
        assert np.array_equal(ids[: len(shared)], shared), p
        reqs.append((ids, rng.randn(3, cfg.mm_hidden_size).astype(np.float32)))
    kw = dict(max_new=5, kv_block_size=8, prefill_chunk=8,
              max_cache_len=128, prompt_buckets=(64,))
    ref, _ = _serve_buckets(bundle, cfg, params, reqs, **kw)
    server = BatchedServer(
        cfg, params, bundle.audio_patch_id,
        GenerationConfig(max_new_tokens=5, temperature=0.0, stop_text="",
                         decode_chunk=2),
        max_batch=2, max_cache_len=128, prompt_buckets=(64,),
        max_audio_frames=4, tokenizer=bundle.tokenizer,
        shared_prefix_ids=shared, kv_block_size=8, prefill_chunk=8,
    )
    engine = OnlineEngine(server).start()
    try:
        got = [
            engine.generate(Request(ids, audio), timeout=120).tokens
            for ids, audio in reqs
        ]
    finally:
        engine.stop()
    assert got == ref


def _serve_buckets(bundle, cfg, params, reqs, max_new, max_cache_len,
                   prompt_buckets, **kw):
    server = BatchedServer(
        cfg, params, bundle.audio_patch_id,
        GenerationConfig(max_new_tokens=max_new, temperature=0.0,
                         stop_text="", decode_chunk=2),
        max_batch=2, max_cache_len=max_cache_len,
        prompt_buckets=prompt_buckets, max_audio_frames=4,
        tokenizer=bundle.tokenizer, **kw,
    )
    out = server.serve([Request(ids, audio) for ids, audio in reqs])
    return [r.tokens for r in out], server


def test_prefix_with_ngram_speculation(setup):
    """Prefix caching composes with draft-free n-gram speculation in BOTH
    cache regimes (dense broadcast and paged shared blocks); fp32 greedy
    tokens match plain serving exactly."""
    bundle, cfg, params, header, reqs = setup
    ref, _ = _serve(bundle, cfg, params, reqs, max_new=6)
    dense, _ = _serve(
        bundle, cfg, params, reqs, max_new=6,
        shared_prefix_ids=header, spec_mode="ngram", gamma=2,
    )
    paged, _ = _serve(
        bundle, cfg, params, reqs, max_new=6,
        shared_prefix_ids=header, spec_mode="ngram", gamma=2,
        kv_block_size=8, prefill_chunk=8,
    )
    for i, (r, d, p) in enumerate(zip(ref, dense, paged)):
        assert r == d, f"request {i} (dense prefix + ngram): {r} != {d}"
        assert r == p, f"request {i} (paged prefix + ngram): {r} != {p}"


def test_prefix_with_speculative_draft(setup):
    """Prefix caching composes with draft-model speculative serving (the
    draft cache is prefix-seeded too); tokens match plain serving."""
    bundle, cfg, params, header, reqs = setup
    ref, _ = _serve(bundle, cfg, params, reqs[:3], max_new=6)
    got, _ = _serve(
        bundle, cfg, params, reqs[:3], max_new=6,
        shared_prefix_ids=header,
        draft_cfg=cfg, draft_params=params, gamma=2, spec_rounds=1,
    )
    for i, (r, g) in enumerate(zip(ref, got)):
        assert r == g, f"request {i}: {r} != {g}"


def test_paged_prefix_with_speculative_draft(setup):
    """The round-4 exclusion, closed: paged prefix caching + FUSED draft
    speculation. The target's shared-prefix KV lives in pool blocks every
    slot's table leads with; the dense draft cache is prefix-seeded over
    the block-aligned head (the sub-block remainder rides the suffix).
    fp32 greedy tokens match plain serving exactly, and the shared blocks
    stay allocated while every private block is returned."""
    bundle, cfg, params, header, reqs = setup
    ref, _ = _serve(bundle, cfg, params, reqs[:3], max_new=6)
    got, server = _serve(
        bundle, cfg, params, reqs[:3], max_new=6,
        shared_prefix_ids=header,
        draft_cfg=cfg, draft_params=params, gamma=2, spec_rounds=1,
        kv_block_size=8, prefill_chunk=8,
    )
    assert server.paged and server._shared_block_ids is not None
    assert server._d_prefix_cache is not None  # draft seed was built
    for i, (r, g) in enumerate(zip(ref, got)):
        assert r == g, f"request {i} (paged prefix + draft): {r} != {g}"
    n_shared = server._prefix_len // server.kv_block_size
    total = server.kv_pool_blocks
    assert server._allocator.free_blocks == total - server.max_batch - n_shared
