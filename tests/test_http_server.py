"""Online HTTP front-end: concurrent requests through the engine thread."""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from llark_tpu.config import ModelConfig
from llark_tpu.generate import GenerationConfig, Generator
from llark_tpu.inference.http_server import OnlineEngine, serve_http
from llark_tpu.inference.server import BatchedServer, Request
from llark_tpu.models.fusion import init_llark_params
from llark_tpu.tokenization import TokenizerBundle, WordTokenizer


@pytest.fixture(scope="module")
def stack():
    cfg = ModelConfig.tiny(dtype="float32", param_dtype="float32")
    params = init_llark_params(cfg, jax.random.PRNGKey(0))
    bundle = TokenizerBundle.from_tokenizer(WordTokenizer(cfg.vocab_size))
    server = BatchedServer(
        cfg, params, bundle.audio_patch_id,
        GenerationConfig(max_new_tokens=6, temperature=0.0, stop_text="###",
                         decode_chunk=2),
        max_batch=2, max_cache_len=128, prompt_buckets=(64,),
        max_audio_frames=4, decode_chunk=2, tokenizer=bundle.tokenizer,
    )
    return cfg, params, bundle, server


def test_online_engine_matches_generator(stack):
    cfg, params, bundle, server = stack
    from llark_tpu.infer import build_prompt_ids

    engine = OnlineEngine(server).start()
    try:
        rng = np.random.RandomState(0)
        prompts = ["describe this sound .", "what genre is it ?", "explain ."]
        audio = [rng.randn(3, cfg.mm_hidden_size).astype(np.float32) for _ in prompts]

        # concurrent submissions from several threads
        results = [None] * len(prompts)

        def work(i):
            ids = np.asarray(build_prompt_ids(prompts[i], 3, bundle), np.int32)
            req = engine.generate(Request(ids, audio[i]), timeout=120)
            results[i] = req.tokens

        threads = [threading.Thread(target=work, args=(i,)) for i in range(len(prompts))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)

        gen = Generator(
            cfg, params, bundle.audio_patch_id,
            GenerationConfig(max_new_tokens=6, stop_text="###"),
            max_cache_len=128,
        )
        for i, p in enumerate(prompts):
            ids = build_prompt_ids(p, 3, bundle)
            b = np.zeros((1, 64), np.int32)
            b[0, : len(ids)] = ids
            ref = gen.generate(
                b, np.array([len(ids)], np.int32), audio[i][None],
                np.array([3], np.int32), tokenizer=bundle.tokenizer,
            )[0]
            assert results[i] == ref, i
    finally:
        engine.stop()


def test_http_roundtrip(stack):
    cfg, params, bundle, server = stack
    httpd, engine = serve_http(server, bundle, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        # health
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health") as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"

        rng = np.random.RandomState(1)
        enc = rng.randn(3, cfg.mm_hidden_size).astype(np.float32)
        body = json.dumps(
            {"prompt": "describe this .", "audio_encoding": enc.tolist()}
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert isinstance(out["completion"], str)
        assert len(out["tokens"]) > 0
        assert out["latency_s"] >= 0

        # oversized prompt -> 413
        body = json.dumps({"prompt": "word " * 200}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=body,
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req, timeout=60)
            assert False, "expected HTTP 413"
        except urllib.error.HTTPError as e:
            assert e.code == 413
    finally:
        httpd.shutdown()
        engine.stop()


def test_http_many_concurrent_requests(stack):
    """20 concurrent clients through 2 slots: all complete, all match the
    engine's own sequential answers (stress the admit/decode interleave)."""
    import concurrent.futures

    cfg, params, bundle, server = stack
    from llark_tpu.infer import build_prompt_ids
    from llark_tpu.inference.http_server import OnlineEngine
    from llark_tpu.inference.server import Request

    engine = OnlineEngine(server).start()
    try:
        rng = np.random.RandomState(3)
        prompts = [f"describe sound number {i} ." for i in range(20)]
        audio = [rng.randn(3, cfg.mm_hidden_size).astype(np.float32)
                 for _ in prompts]

        def one(i):
            ids = np.asarray(build_prompt_ids(prompts[i], 3, bundle), np.int32)
            return engine.generate(Request(ids, audio[i]), timeout=300).tokens

        with concurrent.futures.ThreadPoolExecutor(max_workers=20) as ex:
            got = list(ex.map(one, range(len(prompts))))

        # sequential ground truth through the same engine: every request's
        # tokens must be independent of concurrency (empty is legitimate —
        # random weights may emit the stop keyword first)
        for i in range(len(prompts)):
            ids = np.asarray(build_prompt_ids(prompts[i], 3, bundle), np.int32)
            ref = engine.generate(Request(ids, audio[i]), timeout=300).tokens
            assert got[i] == ref, i
    finally:
        engine.stop()


def test_engine_survives_malformed_request(stack):
    """A request whose encoding has the wrong width must 400 at the HTTP
    layer, and even a directly-injected bad request must fail cleanly
    without killing the engine loop."""
    import urllib.error

    cfg, params, bundle, server = stack
    httpd, engine = serve_http(server, bundle, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.RandomState(0)
        # wrong mm width -> 400, engine untouched
        bad = json.dumps({"prompt": "x .", "audio_encoding":
                          rng.randn(3, cfg.mm_hidden_size + 2).tolist()}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=bad,
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req, timeout=60)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # inject a malformed request PAST the HTTP validation: the engine
        # must fail it (error set, event fired) and keep serving
        from llark_tpu.infer import build_prompt_ids
        from llark_tpu.inference.server import Request as Req

        bad_req = Req(np.asarray([5, 6], np.int32),
                      rng.randn(3).astype(np.float32))  # 1-D encoding
        failed = engine.generate(bad_req, timeout=60)
        assert failed.error is not None

        # engine still alive: a good request completes
        good = json.dumps({"prompt": "describe this .", "audio_encoding":
                           rng.randn(3, cfg.mm_hidden_size).tolist()}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=good,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert isinstance(out["completion"], str)

        # oversized frame count is capped, not misaligned: 200 with output
        many = json.dumps({"prompt": "describe this .", "audio_encoding":
                           rng.randn(server.max_audio_frames + 3,
                                     cfg.mm_hidden_size).tolist()}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=many,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert isinstance(out["completion"], str)
    finally:
        httpd.shutdown()
        engine.stop()


def test_engine_failure_returns_paged_blocks():
    """An engine-step failure in paged mode must return the aborted rows'
    pool blocks: clearing the slots alone would leak them for the server's
    lifetime, shrinking the pool on every recovered failure."""
    bundle = TokenizerBundle.from_tokenizer(WordTokenizer(128))
    cfg = ModelConfig.tiny(dtype="float32", mm_hidden_size=8)
    cfg.vocab_size = int(np.ceil(len(bundle.tokenizer) / 128) * 128)
    params = init_llark_params(cfg, jax.random.PRNGKey(0))
    server = BatchedServer(
        cfg, params, bundle.audio_patch_id,
        GenerationConfig(max_new_tokens=6, temperature=0.0, stop_text="",
                         decode_chunk=2),
        max_batch=2, max_cache_len=64, prompt_buckets=(16,),
        max_audio_frames=4, decode_chunk=2, kv_block_size=8,
    )
    baseline = server._allocator.free_blocks
    rng = np.random.RandomState(5)
    ids = rng.randint(4, 40, 9).astype(np.int32)

    real_decode = server._decode_round
    boom = {"armed": True}

    def exploding_decode():
        if boom["armed"] and server._active():
            boom["armed"] = False
            raise RuntimeError("injected decode failure")
        return real_decode()

    server._decode_round = exploding_decode
    engine = OnlineEngine(server).start()
    try:
        failed = engine.generate(Request(ids.copy(), None), timeout=120)
        assert failed.error is not None and "injected" in failed.error
        # every private block came back: the pool is at its baseline
        assert server._allocator.free_blocks == baseline
        assert all(not b for b in server._slot_blocks)
        # the engine keeps serving, and the recovered request's tokens
        # match a fresh server's (no poisoned table/pool state)
        ok = engine.generate(Request(ids.copy(), None), timeout=120)
        assert ok.error is None and len(ok.tokens) > 0
    finally:
        engine.stop()


def test_online_engine_speculative(tmp_path):
    """The engine thread drives the speculative slot rounds: generate()
    through OnlineEngine with a draft model matches plain-engine output."""
    import numpy as np
    import jax
    from llark_tpu.config import ModelConfig
    from llark_tpu.generate import GenerationConfig
    from llark_tpu.inference.http_server import OnlineEngine
    from llark_tpu.inference.server import BatchedServer, Request
    from llark_tpu.models.fusion import init_llark_params
    from llark_tpu.tokenization import TokenizerBundle, WordTokenizer

    bundle = TokenizerBundle.from_tokenizer(WordTokenizer(128))
    cfg = ModelConfig.tiny(dtype="float32", mm_hidden_size=8)
    cfg.vocab_size = int(np.ceil(len(bundle.tokenizer) / 128) * 128)
    params = init_llark_params(cfg, jax.random.PRNGKey(0))
    draft_cfg = ModelConfig.tiny(dtype="float32", mm_hidden_size=8)
    draft_cfg.vocab_size = cfg.vocab_size
    draft_params = init_llark_params(draft_cfg, jax.random.PRNGKey(9))

    rng = np.random.RandomState(3)
    ids = [rng.randint(4, 40, n).astype(np.int32) for n in (6, 9, 5)]

    outs = {}
    for spec in (False, True):
        kw = dict(draft_cfg=draft_cfg, draft_params=draft_params,
                  gamma=2, spec_rounds=2) if spec else {}
        server = BatchedServer(
            cfg, params, bundle.audio_patch_id,
            GenerationConfig(max_new_tokens=5, temperature=0.0,
                             stop_text="", decode_chunk=2),
            max_batch=2, max_cache_len=64, prompt_buckets=(16,),
            max_audio_frames=4, decode_chunk=2, **kw,
        )
        engine = OnlineEngine(server).start()
        try:
            reqs = [engine.generate(Request(i.copy(), None)) for i in ids]
        finally:
            engine.stop()
        outs[spec] = [r.tokens for r in reqs]
    assert outs[True] == outs[False]
