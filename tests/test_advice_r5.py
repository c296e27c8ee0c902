"""Regression tests for the round-4 verdict item 1 and advisor findings
(ADVICE.md r4).

Covers: infeasible prompt buckets are filtered (not fatal) so the
continuous-batching CLI defaults keep serving with a small cache, the
all-buckets-infeasible geometry still fails fast, the one-time paged
shared-prefix fill returns its blocks on failure (and the engine can
retry cleanly), and the dense prefix-cache + prefill-chunk flag pairing
dies at CLI validation instead of as a raw server traceback.
"""

import logging
import types

import numpy as np
import pytest

import jax

from llark_tpu.config import ModelConfig
from llark_tpu.generate import GenerationConfig
from llark_tpu.inference.common import check_serving_args
from llark_tpu.inference.server import BatchedServer, Request
from llark_tpu.models.fusion import init_llark_params
from llark_tpu.tokenization import TokenizerBundle, WordTokenizer


@pytest.fixture(scope="module")
def setup():
    bundle = TokenizerBundle.from_tokenizer(WordTokenizer(128))
    cfg = ModelConfig.tiny(dtype="float32", mm_hidden_size=8)
    cfg.vocab_size = int(np.ceil(len(bundle.tokenizer) / 128) * 128)
    params = init_llark_params(cfg, jax.random.PRNGKey(0))
    return bundle, cfg, params


def _gen_cfg(max_new=4):
    return GenerationConfig(
        max_new_tokens=max_new, temperature=0.0, stop_text="", decode_chunk=2
    )


# ---------------------------------------------------------------------------
# VERDICT r4 #1: oversized buckets are filtered, not fatal
# ---------------------------------------------------------------------------


def test_infeasible_buckets_filtered_with_warning(setup, caplog):
    """buckets=(128, 512) with --max-cache-len 256 is the continuous-
    batching CLI's own default pairing; prompts <= 128 tokens served
    correctly before the round-4 guard existed and must keep doing so —
    the 512 bucket is dropped with a warning, not a constructor error."""
    bundle, cfg, params = setup
    with caplog.at_level(logging.WARNING, "llark_tpu.inference.server"):
        server = BatchedServer(
            cfg, params, bundle.audio_patch_id, _gen_cfg(),
            max_batch=2, max_cache_len=64, prompt_buckets=(16, 512),
            max_audio_frames=4, decode_chunk=2, tokenizer=bundle.tokenizer,
        )
    assert server.prompt_buckets == (16,)
    assert any("dropping prompt bucket 512" in r.message for r in caplog.records)
    # and it actually serves at the surviving bucket
    reqs = [Request(np.arange(4, 14, dtype=np.int32))]
    out = server.serve(reqs)
    assert len(out[0].tokens) == 4
    # a prompt only the dropped bucket could hold is rejected at submission
    with pytest.raises(ValueError, match="exceeds capacity"):
        server.serve([Request(np.arange(4, 44, dtype=np.int32))])


def test_filtered_buckets_token_equal_to_explicit(setup):
    """Serving with a filtered bucket list is the same engine as naming
    only the feasible buckets up front."""
    bundle, cfg, params = setup
    rng = np.random.RandomState(3)
    prompts = [rng.randint(4, 40, n).astype(np.int32) for n in (6, 12, 9)]

    def run(buckets):
        server = BatchedServer(
            cfg, params, bundle.audio_patch_id, _gen_cfg(max_new=6),
            max_batch=2, max_cache_len=64, prompt_buckets=buckets,
            max_audio_frames=4, decode_chunk=2,
        )
        return [r.tokens for r in server.serve([Request(p) for p in prompts])]

    assert run((16, 512)) == run((16,))


def test_no_feasible_bucket_still_raises(setup):
    bundle, cfg, params = setup
    with pytest.raises(ValueError, match="no prompt bucket"):
        BatchedServer(
            cfg, params, bundle.audio_patch_id, _gen_cfg(),
            max_batch=2, max_cache_len=64, prompt_buckets=(128, 512),
            max_audio_frames=4, decode_chunk=2,
        )


def test_chunk_padded_bucket_filtering(setup):
    """The feasibility check sees the chunk-padded bucket size: 24 pads to
    32 under prefill_chunk=16, which overflows a 24-position cache even
    though the raw bucket fits it — dropped, while 16 survives."""
    bundle, cfg, params = setup
    server = BatchedServer(
        cfg, params, bundle.audio_patch_id, _gen_cfg(),
        max_batch=2, max_cache_len=24, prompt_buckets=(16, 24),
        max_audio_frames=4, decode_chunk=2, prefill_chunk=16,
    )
    assert server.prompt_buckets == (16,)


# ---------------------------------------------------------------------------
# ADVICE r4 #1: failed shared-prefix fill must return its pool blocks
# ---------------------------------------------------------------------------


def test_paged_prefix_fill_failure_returns_blocks(setup):
    """If the one-time shared-prefix fill raises after its blocks were
    allocated, the blocks go back to the pool and _shared_block_ids stays
    None — so a retrying engine neither leaks n_shared blocks per attempt
    nor serves against a half-filled prefix."""
    bundle, cfg, params = setup
    rng = np.random.RandomState(11)
    header = rng.randint(4, 40, 12).astype(np.int32)
    suffix = rng.randint(4, 40, 6).astype(np.int32)
    server = BatchedServer(
        cfg, params, bundle.audio_patch_id, _gen_cfg(),
        max_batch=2, max_cache_len=64, prompt_buckets=(16,),
        max_audio_frames=4, decode_chunk=2,
        kv_block_size=8, prefill_chunk=16,
        shared_prefix_ids=header,
    )

    def exploding_chunk(*a, **k):
        raise RuntimeError("injected prefix-fill failure")

    server._prefill_chunk_paged = exploding_chunk
    free_before = server._allocator.free_blocks
    req = Request(np.concatenate([header, suffix]))
    for _ in range(2):  # every retry must restore the pool, not shrink it
        with pytest.raises(RuntimeError, match="injected prefix-fill"):
            server.serve([Request(np.concatenate([header, suffix]))])
        assert server._allocator.free_blocks == free_before
        assert server._shared_block_ids is None
    # un-inject: the next attempt fills the prefix and serves normally
    server._prefill_chunk_paged = None
    out = server.serve([req])
    assert len(out[-1].tokens) == 4
    assert server._shared_block_ids is not None
    n_shared = server._prefix_len // server.kv_block_size
    assert server._allocator.free_blocks == free_before - n_shared


# ---------------------------------------------------------------------------
# ADVICE r4 #3: dense --prefix-cache + --prefill-chunk dies at CLI validation
# ---------------------------------------------------------------------------


def _args(**kw):
    base = dict(
        continuous_batching=1, speculative="off", draft_checkpoint_dir=None,
        kv_block_size=None, prefix_cache=False, prefill_chunk=None,
        admit_batch=None, num_beams=1, temperature=0.0,
    )
    base.update(kw)
    return types.SimpleNamespace(**base)


def test_cli_rejects_dense_prefix_with_chunk():
    with pytest.raises(SystemExit, match="mutually exclusive"):
        check_serving_args(_args(prefix_cache=True, prefill_chunk=16))


def test_cli_accepts_paged_prefix_with_chunk():
    check_serving_args(
        _args(prefix_cache=True, prefill_chunk=16, kv_block_size=8)
    )
    check_serving_args(_args(prefix_cache=True))  # dense one-shot: fine
    check_serving_args(_args(prefill_chunk=16))  # chunked, no prefix: fine
