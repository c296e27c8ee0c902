"""Prefill roofline: tokens/s + MFU for 7B int8 chunked prefill, swept
over prefill_chunk x admit_batch.

VERDICT r3 next-round item 2: prefill dominates the measured serving wall
clock (the 4096-context workload is 94% prefill tokens) yet no prefill
throughput or MFU number existed, and the serving defaults
(prefill_chunk=256, admit_batch=2) were chosen for HBM fit, never swept
for throughput. This bench drives the REAL admission path (BatchedServer
chunked prefill, the same programs serving uses) with max_new_tokens=1 so
wall clock is prefill to first token, and reports:

  * prefill tokens/s over PROGRAM tokens (the padded bucket span each
    chunk program actually processes) -> prefill MFU vs peak bf16;
  * prefill tokens/s over LIVE prompt tokens (what a user sees);

per (chunk, admit_batch) cell. The one-shot bucket prefill (chunk=None)
is the no-interleave upper bound.

Run on an idle TPU host from /root/repo:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench/bench_prefill.py \
      [--bucket 1024] [--chunks 128,256,512,0] [--admit-batches 1,2,4]
CPU smoke: add --tiny.
"""

import argparse
import dataclasses
import json
import sys
import time

import numpy as np
import jax

from llark_tpu.config import ModelConfig
from llark_tpu.generate import GenerationConfig
from llark_tpu.inference.server import BatchedServer, Request
from llark_tpu.models.fusion import init_llark_params
from llark_tpu.train.flops import device_peak_flops, infer_flops_per_token

if "--tiny" in sys.argv:
    sys.argv.remove("--tiny")
    jax.config.update("jax_platforms", "cpu")
    cfg = ModelConfig.tiny(dtype="float32", param_dtype="float32")
    cfg.vocab_size = 32004
    params = init_llark_params(cfg, jax.random.PRNGKey(0))
else:
    from llark_tpu.models.quant import quantize_params_int8_incremental

    cfg = ModelConfig(
        vocab_size=32004, hidden_size=4096, intermediate_size=11008,
        num_layers=32, num_heads=32, num_kv_heads=32,
        param_dtype="bfloat16", dtype="bfloat16", remat=False,
        kv_cache_quant=True,
    )
    params = jax.jit(lambda k: init_llark_params(cfg, k))(jax.random.PRNGKey(0))
    params = quantize_params_int8_incremental(cfg, params)

ap = argparse.ArgumentParser()
ap.add_argument("--bucket", type=int, default=1024)
ap.add_argument("--prompt-base", type=int, default=900)
ap.add_argument("--requests", type=int, default=8)
ap.add_argument("--max-cache-len", type=int, default=2048)
ap.add_argument("--chunks", default="128,256,512,0",
                help="prefill chunk sizes; 0 = one-shot bucket prefill")
ap.add_argument("--admit-batches", default="1,2,4")
ap.add_argument("--out", default=None)
args = ap.parse_args()

rng = np.random.RandomState(0)
prompts = []
for i in range(args.requests):
    n = args.prompt_base + (i * 13) % min(120, args.bucket - args.prompt_base)
    ids = rng.randint(0, 31996, size=(n,)).astype(np.int32)
    audio = rng.randn(60, cfg.mm_hidden_size).astype(np.float32)
    prompts.append((ids, audio))
live_tokens = sum(len(p[0]) for p in prompts)


def bench_cell(chunk, admit_batch):
    server = BatchedServer(
        cfg, params, audio_patch_id=31999,
        gen_cfg=GenerationConfig(max_new_tokens=1, temperature=0.0,
                                 stop_text=""),
        max_batch=max(admit_batch, 2), max_cache_len=args.max_cache_len,
        prompt_buckets=(args.bucket,), max_audio_frames=60,
        decode_chunk=1, prefill_chunk=chunk or None,
        admit_batch=admit_batch,
    )
    # warmup/compile on a 2-request set
    warm = [Request(p[0].copy(), p[1].copy()) for p in prompts[:2]]
    server.serve(warm)
    reqs = [Request(p[0].copy(), p[1].copy()) for p in prompts]
    t0 = time.time()
    server.serve(reqs)
    wall = time.time() - t0
    # program tokens: each admission wave runs the padded bucket span for
    # admit_batch rows, ceil(requests / admit_batch) waves
    waves = -(-args.requests // admit_batch)
    program_tokens = waves * admit_batch * args.bucket
    row = {
        "prefill_chunk": chunk or "one-shot",
        "admit_batch": admit_batch,
        "wall_s": round(wall, 2),
        "live_prefill_tok_s": round(live_tokens / wall, 1),
        "program_prefill_tok_s": round(program_tokens / wall, 1),
    }
    peak = device_peak_flops()
    if peak:
        fpt = infer_flops_per_token(cfg, args.bucket)
        row["prefill_mfu"] = round(fpt * program_tokens / wall / peak, 4)
        row["peak_bf16_tflops"] = round(peak / 1e12, 1)
    del server
    return row


rows = []
for admit_batch in [int(x) for x in args.admit_batches.split(",")]:
    for chunk in [int(x) for x in args.chunks.split(",")]:
        row = bench_cell(chunk, admit_batch)
        print(json.dumps(row), flush=True)
        rows.append(row)

out = {
    "device": str(jax.devices()[0].device_kind),
    "bucket": args.bucket,
    "requests": args.requests,
    "live_tokens": live_tokens,
    "rows": rows,
}
if args.out:
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
best = max(rows, key=lambda r: r["live_prefill_tok_s"])
print("BEST:", json.dumps(best))
