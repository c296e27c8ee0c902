"""Bounded admission reordering (mixed-length traffic).

Admission waves are single-bucket, so under strict FIFO a short request
behind a long-bucket head waits that head's whole wave (head-of-line
blocking). With admit_reorder the largest queued same-bucket group wins
the wave, bounded by an aging window: once the head request has waited
admit_reorder_age_s its bucket is forced, so no bucket starves. These
tests pin the selection policy deterministically (no timing assertions)
and check end-to-end token equality with reordering on.
"""

import time

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
    return bundle, cfg, params


def _server(bundle, cfg, params, **kw):
    kw.setdefault("max_batch", 2)
    kw.setdefault("max_cache_len", 64)
    kw.setdefault("prompt_buckets", (8, 16))
    return BatchedServer(
        cfg, params, bundle.audio_patch_id,
        GenerationConfig(max_new_tokens=4, temperature=0.0, stop_text="",
                         decode_chunk=2),
        max_audio_frames=4, decode_chunk=2, **kw,
    )


def _req(n, rng, at=None):
    r = Request(rng.randint(4, 40, n).astype(np.int32))
    r.submitted_at = time.time() if at is None else at
    return r


def test_reorder_picks_largest_group(setup):
    """Queue [16-bucket, 8, 8, 8] with a fresh head: the three 8-bucket
    requests win the wave (largest group), FIFO within the bucket."""
    bundle, cfg, params = setup
    rng = np.random.RandomState(0)
    server = _server(bundle, cfg, params, max_batch=4,
                     admit_reorder=True, admit_reorder_age_s=60.0)
    long_head = _req(12, rng)
    shorts = [_req(5, rng), _req(6, rng), _req(7, rng)]
    server._queue = [long_head] + shorts
    bucket, members = server._select_admit_group(4)
    assert bucket == 8
    assert members == shorts  # FIFO within the winning bucket


def test_reorder_tie_prefers_oldest_first_member(setup):
    """Equal group sizes: the bucket whose first member is oldest wins
    (here the head's bucket), so ties never jump the queue."""
    bundle, cfg, params = setup
    rng = np.random.RandomState(1)
    server = _server(bundle, cfg, params, max_batch=4,
                     admit_reorder=True, admit_reorder_age_s=60.0)
    now = time.time()
    a = [_req(12, rng, at=now - 2.0), _req(12, rng, at=now - 1.5)]
    b = [_req(5, rng, at=now - 1.0), _req(6, rng, at=now - 0.5)]
    server._queue = [a[0], b[0], a[1], b[1]]
    bucket, members = server._select_admit_group(4)
    assert bucket == 16
    assert members == a


def test_reorder_width_caps_group_value(setup):
    """Group size counts only up to the wave width: 3 queued shorts beat 2
    longs at width 4, but at width 2 both are 'full waves' and the tie
    goes to the older (long) head."""
    bundle, cfg, params = setup
    rng = np.random.RandomState(2)
    server = _server(bundle, cfg, params, max_batch=4,
                     admit_reorder=True, admit_reorder_age_s=60.0)
    now = time.time()
    longs = [_req(12, rng, at=now - 2.0), _req(12, rng, at=now - 1.9)]
    shorts = [_req(5, rng, at=now - 1.0), _req(6, rng, at=now - 0.9),
              _req(7, rng, at=now - 0.8)]
    server._queue = longs + shorts
    bucket, members = server._select_admit_group(4)
    assert (bucket, members) == (8, shorts)
    bucket, members = server._select_admit_group(2)
    assert (bucket, members) == (16, longs)


def test_reorder_aged_head_forces_its_bucket(setup):
    """Anti-starvation: a head past admit_reorder_age_s forces its own
    bucket even when another bucket has the larger group."""
    bundle, cfg, params = setup
    rng = np.random.RandomState(3)
    server = _server(bundle, cfg, params, max_batch=4,
                     admit_reorder=True, admit_reorder_age_s=0.2)
    old_head = _req(12, rng, at=time.time() - 1.0)
    shorts = [_req(5, rng), _req(6, rng), _req(7, rng)]
    server._queue = [old_head] + shorts
    bucket, members = server._select_admit_group(4)
    assert bucket == 16
    assert members == [old_head]


def test_strict_fifo_without_flag(setup):
    """Default: consecutive same-bucket head group only — a bucket
    mismatch stops the scan even if more of the head bucket wait behind."""
    bundle, cfg, params = setup
    rng = np.random.RandomState(4)
    server = _server(bundle, cfg, params, max_batch=4)
    s1, l1, s2 = _req(5, rng), _req(12, rng), _req(6, rng)
    server._queue = [s1, l1, s2]
    bucket, members = server._select_admit_group(4)
    assert (bucket, members) == (8, [s1])


def test_reorder_skips_oversize_and_prefix_rejects(setup):
    """The reorder scan must not raise on (or group) requests that have no
    feasible bucket; they fail individually at the head as before."""
    bundle, cfg, params = setup
    rng = np.random.RandomState(5)
    server = _server(bundle, cfg, params, max_batch=4,
                     admit_reorder=True, admit_reorder_age_s=60.0)
    ok = [_req(5, rng), _req(6, rng)]
    oversize = _req(40, rng)  # exceeds the largest bucket
    server._queue = [ok[0], oversize, ok[1]]
    bucket, members = server._select_admit_group(4)
    assert (bucket, members) == (8, ok)


def test_reorder_serve_token_equal(setup):
    """End-to-end: reordering changes admission ORDER, not results — every
    request's greedy tokens match the strict-FIFO serve exactly."""
    bundle, cfg, params = setup
    rng = np.random.RandomState(6)
    prompts = [rng.randint(4, 40, n).astype(np.int32)
               for n in (5, 12, 6, 13, 7, 5)]

    def run(**kw):
        server = _server(bundle, cfg, params, **kw)
        out = server.serve([Request(p.copy()) for p in prompts])
        return [r.tokens for r in out]

    assert run() == run(admit_reorder=True, admit_reorder_age_s=60.0)


def test_reorder_serve_token_equal_paged(setup):
    """Same equality through the paged direct-to-pool admission path (the
    identity-based queue removal must compose with block accounting)."""
    bundle, cfg, params = setup
    rng = np.random.RandomState(7)
    prompts = [rng.randint(4, 40, n).astype(np.int32)
               for n in (5, 12, 6, 13, 7)]

    def run(**kw):
        server = _server(bundle, cfg, params, kv_block_size=8,
                         prefill_chunk=8, **kw)
        out = server.serve([Request(p.copy()) for p in prompts])
        assert server._allocator.free_blocks == (
            server.kv_pool_blocks - server.max_batch
        )
        return [r.tokens for r in out]

    assert run() == run(admit_reorder=True, admit_reorder_age_s=60.0)