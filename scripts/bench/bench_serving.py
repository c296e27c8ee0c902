"""Continuous-batching serving benchmark: 7B int8 weights, int8 KV cache,
chunked prefill, one chip. Produced the serving aggregate numbers in
PERFORMANCE.md. --slots picks the slot count (4 = the r1 configuration;
8 rides the int8-KV capacity headroom + unrolled-decode batch scaling).
Run on a TPU host: python scripts/bench/bench_serving.py [--slots 8]"""
import argparse
import dataclasses
import time

import numpy as np
import jax

from llark_tpu.config import ModelConfig
from llark_tpu.generate import GenerationConfig
from llark_tpu.inference.server import BatchedServer, Request
from llark_tpu.models.fusion import init_llark_params
from llark_tpu.models.quant import quantize_params_int8_incremental

cfg = ModelConfig(
    vocab_size=32004, hidden_size=4096, intermediate_size=11008,
    num_layers=32, num_heads=32, num_kv_heads=32,
    param_dtype="bfloat16", dtype="bfloat16", remat=False,
    kv_cache_quant=True,
)
params = jax.jit(lambda k: init_llark_params(cfg, k))(jax.random.PRNGKey(0))
params = quantize_params_int8_incremental(cfg, params)

rng = np.random.RandomState(0)
reqs = []
for i in range(12):
    n = 380 + (i * 17) % 120  # placeholder; rebuilt below from --prompt-base
    ids = rng.randint(0, 31996, size=(n,)).astype(np.int32)
    audio = rng.randn(60, cfg.mm_hidden_size).astype(np.float32)
    reqs.append(Request(ids, audio))

ap = argparse.ArgumentParser()
ap.add_argument("--slots", type=int, default=4)
ap.add_argument("--requests", type=int, default=0,
                help="override request count (default 12, or 3x slots if larger)")
ap.add_argument("--max-cache-len", type=int, default=1024)
ap.add_argument("--prompt-base", type=int, default=380,
                help="prompts are prompt-base .. prompt-base+120 tokens")
ap.add_argument("--bucket", type=int, default=512)
args = ap.parse_args()
n_req = args.requests or max(12, 3 * args.slots)
reqs = []
for i in range(n_req):
    n = args.prompt_base + (i * 17) % 120
    ids = rng.randint(0, 31996, size=(n,)).astype(np.int32)
    audio = rng.randn(60, cfg.mm_hidden_size).astype(np.float32)
    reqs.append(Request(ids, audio))

server = BatchedServer(
    cfg, params, audio_patch_id=31999,
    gen_cfg=GenerationConfig(max_new_tokens=128, temperature=0.0, stop_text=""),
    max_batch=args.slots, max_cache_len=args.max_cache_len,
    prompt_buckets=(args.bucket,),
    max_audio_frames=60, decode_chunk=16, prefill_chunk=256,
)
# warmup: compile prefill/decode/insert programs on a small set
warm = [Request(reqs[0].input_ids.copy(), reqs[0].audio_encoding.copy()) for _ in range(2)]
server.gen_cfg = dataclasses.replace(server.gen_cfg, max_new_tokens=17)
server.serve(warm)
server.gen_cfg = dataclasses.replace(server.gen_cfg, max_new_tokens=128)

t0 = time.time()
out = server.serve(reqs)
stats = server.stats(out)
stats["wall_s"] = round(time.time() - t0, 1)

# prompt-lookup potential on the outputs actually served: what acceptance
# an n-gram speculative decoder would have seen (no re-decode needed)
from llark_tpu.inference.speculative import simulate_ngram_acceptance

rates = [
    simulate_ngram_acceptance(
        list(r.input_ids) + list(r.tokens), len(r.input_ids), gamma=4
    )[0]
    for r in out
    if r.tokens
]
stats["ngram_acceptance_g4"] = round(float(np.mean(rates)), 3) if rates else None
stats["slots"] = args.slots
stats["max_cache_len"] = args.max_cache_len
print(stats)
