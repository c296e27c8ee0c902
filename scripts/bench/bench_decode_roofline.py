"""Per-component decode roofline: where do batch-1/4/8 serving tokens go?

VERDICT r1 noted batch-4 decode (185 tok/s aggregate = 46/stream) falls
well below 4x the single-stream rate (83 tok/s) with no breakdown.
This decomposes a real 7B decode step by DIFFERENCING real programs
(no synthetic microbenches, so every number includes XLA's actual fusion):

  t_step(B, L)   real chunked decode step, cache length L
  dispatch       per-program-dispatch overhead: jitted identity
  weights        t_step(B, L=128) - dispatch/chunk: weight-read-bound floor
                 (KV reads at L=128 are ~1% of the L=1024 cost)
  kv/attention   t_step(B, 1024) - t_step(B, 128): pure cache-read delta

Reads per token: weights are read ONCE per step regardless of B
(B streams share the read — the whole point of batching), while KV
bytes grow linearly in B. The per-stream drop at batch 4 is the KV
term catching up with the weight term; int8 KV halves it (hence the
+24% measured in PERFORMANCE.md).

Run on a TPU host: python scripts/bench/bench_decode_roofline.py
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from llark_tpu.config import ModelConfig
from llark_tpu.generate import GenerationConfig, make_multistep_decode_fn, make_prefill_fn
from llark_tpu.models.fusion import init_llark_params
from llark_tpu.models.quant import quantize_params_int8_incremental

CHUNK = 16


def sync(x):
    # axon tunnel: block_until_ready is async; device_get of a small
    # output is the only reliable sync point (see bench.py)
    return jax.device_get(jnp.sum(x).astype(jnp.float32))


def bench_config(cfg, params, batch, cache_len, gen_cfg, reps=4, pad_to=0):
    """Per-token decode seconds at (batch, context length ~cache_len).

    Timing loops chain data dependencies (token + cache feed back) so the
    tunnel cannot dedupe identical executions; positions cycle within a
    4-chunk window past the prompt so the attended context stays ~cache_len
    across windows without outgrowing the cache."""
    total = max(cache_len + 5 * CHUNK, pad_to)
    prefill = jax.jit(make_prefill_fn(cfg, audio_patch_id=31999, max_cache_len=total))
    decode_n = jax.jit(make_multistep_decode_fn(cfg, gen_cfg, CHUNK))
    # prompt length == cache_len keeps the prefill sequence aligned to the
    # Pallas block sizes (cache_len-1 = 127 fails the multiple-of-8 rule)
    plen = cache_len
    rng = np.random.RandomState(0)
    ids = rng.randint(0, 31996, size=(batch, plen)).astype(np.int32)
    lens = np.full((batch,), plen, np.int32)
    audio = np.zeros((batch, 1, cfg.mm_hidden_size), np.float32)
    fcnt = np.zeros((batch,), np.int32)
    logits, cache = prefill(params, jnp.asarray(ids), jnp.asarray(lens),
                            jnp.asarray(audio), jnp.asarray(fcnt))
    token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    base = jnp.asarray(lens)
    key = jax.random.PRNGKey(0)

    toks, _lg, cache = decode_n(params, token, cache, base, key)  # compile+warm
    sync(toks)
    token = toks[:, -1]
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        for i in range(4):
            toks, _lg, cache = decode_n(params, token, cache, base + i * CHUNK, key)
            token = toks[:, -1]
        sync(token)
        best = min(best, time.perf_counter() - t0)
    del cache
    return best / (4 * CHUNK)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 4, 8])
    ap.add_argument("--long", type=int, default=1024)
    ap.add_argument("--short", type=int, default=128)
    ap.add_argument("--out", default=None)
    ap.add_argument("--flash", type=int, default=1,
                    help="use the Pallas flash-decode kernel (0 = XLA path)")
    ap.add_argument("--unroll", type=int, default=0,
                    help="unroll the decode layer loop (in-place cache updates)")
    ap.add_argument("--kv", choices=["both", "int8", "bf16"], default="both")
    ap.add_argument("--pad-to", type=int, default=0,
                    help="pad the KV cache to at least this many positions "
                         "(serving-realistic: cache sized for max_seq_len, "
                         "live context shorter)")
    args = ap.parse_args()

    cfg = ModelConfig(
        vocab_size=32004, hidden_size=4096, intermediate_size=11008,
        num_layers=32, num_heads=32, num_kv_heads=32,
        param_dtype="bfloat16", dtype="bfloat16", remat=False,
        kv_cache_quant=True,
    )
    params = jax.jit(lambda k: init_llark_params(cfg, k))(jax.random.PRNGKey(0))
    params = quantize_params_int8_incremental(cfg, params)
    gen_cfg = GenerationConfig(temperature=0.0, stop_text="", eos_token_id=None)

    # dispatch floor: chained jitted no-ops (x feeds back: no tunnel dedup)
    ident = jax.jit(lambda x: x + 1)
    x = ident(jnp.zeros((8,), jnp.int32))
    sync(x)
    t0 = time.perf_counter()
    n_disp = 20
    for _ in range(n_disp):
        x = ident(x)
    sync(x)
    disp = (time.perf_counter() - t0) / n_disp
    print(f"dispatch floor: {disp*1e3:.2f} ms/program", flush=True)

    # analytic byte counts per decoded token
    wbytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(params)
    )

    results = {"dispatch_ms": round(disp * 1e3, 2),
               "weight_bytes_gb": round(wbytes / 1e9, 2)}
    rows = []
    kv_opts = {"both": (True, False), "int8": (True,), "bf16": (False,)}[args.kv]
    for b in args.batches:
        for kv_quant in kv_opts:
            c = ModelConfig(**{**cfg.__dict__, "kv_cache_quant": kv_quant,
                               "head_dim": None,
                               "use_flash_decode": bool(args.flash),
                               "decode_unroll_layers": bool(args.unroll)})
            try:
                t_long = bench_config(c, params, b, args.long, gen_cfg,
                                      pad_to=args.pad_to)
                t_short = bench_config(c, params, b, args.short, gen_cfg,
                                       pad_to=args.pad_to)
            except Exception as e:  # per-config OOM is itself a result
                row = {"batch": b, "kv_int8": kv_quant,
                       "error": f"{type(e).__name__}: {str(e)[:200]}"}
                rows.append(row)
                print(row, flush=True)
                continue
            kv_t = max(t_long - t_short, 0.0)
            kv_read = (2 * c.num_layers * c.num_kv_heads * c.head_dim
                       * (1 if kv_quant else 2) * args.long * b)
            row = {
                "batch": b,
                "kv_int8": kv_quant,
                "tok_ms_long": round(t_long * 1e3, 2),
                "tok_ms_short": round(t_short * 1e3, 2),
                "kv_ms": round(kv_t * 1e3, 2),
                "tok_s_aggregate": round(b / t_long, 1),
                "tok_s_per_stream": round(1 / t_long, 1),
                "weights_gbps": round(wbytes / t_short / 1e9, 0),
                "kv_gbps": round(kv_read / kv_t / 1e9, 0) if kv_t > 1e-5 else None,
            }
            rows.append(row)
            print(row, flush=True)
    results["rows"] = rows
    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
