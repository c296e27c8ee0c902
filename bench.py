"""Benchmark: LLark decode throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference serves LLark-7B on A100-class GPUs; realistic
single-stream bf16 decode there is ~60 tok/s (BASELINE.md "A100-parity
tokens/sec" north star). We measure jitted single-token decode steps
(the serving hot loop) on the 7B architecture; if the chip cannot hold
7B + cache, falls back to the MPT-1B-scale config and scales the
baseline accordingly (A100 1B decode ~420 tok/s by the same bandwidth
ratio).
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def _env_flash():
    """None = framework default (XLA decode; serving flips flash on)."""
    import os
    v = os.environ.get("LLARK_TPU_BENCH_FLASH")
    return None if v is None else v != "0"


def build(cfg_name: str):
    from llark_tpu.config import ModelConfig
    from llark_tpu.generate import make_decode_fn, make_prefill_fn
    from llark_tpu.models.fusion import init_llark_params

    if cfg_name == "7b":
        cfg = ModelConfig(
            vocab_size=32004,
            hidden_size=4096,
            intermediate_size=11008,
            num_layers=32,
            num_heads=32,
            num_kv_heads=32,
            param_dtype="bfloat16",
            dtype="bfloat16",
            remat=False,
            kv_cache_quant=True,  # int8 KV: fewer cache bytes per step
            use_flash_decode=_env_flash(),
        )
        baseline = 60.0
    else:
        cfg = ModelConfig(
            vocab_size=32004,
            hidden_size=2048,
            intermediate_size=5504,
            num_layers=24,
            num_heads=16,
            num_kv_heads=16,
            param_dtype="bfloat16",
            dtype="bfloat16",
            remat=False,
            kv_cache_quant=True,
            use_flash_decode=_env_flash(),
        )
        baseline = 420.0
    return cfg, baseline


def run(cfg_name: str):
    from llark_tpu.generate import (
        GenerationConfig,
        make_multistep_decode_fn,
        make_prefill_fn,
    )
    from llark_tpu.models.fusion import init_llark_params
    from llark_tpu.models.quant import (
        quantize_params_int4_incremental,
        quantize_params_int8_incremental,
    )

    cfg, baseline = build(cfg_name)
    MAX_LEN = 1024
    PROMPT = 512
    B = 1
    CHUNK = 32  # tokens per jitted scan (one host sync per chunk)

    params = jax.jit(
        lambda k: init_llark_params(cfg, k), donate_argnums=()
    )(jax.random.PRNGKey(0))
    # int8 weight-only serving: halves HBM bytes/step in the decode loop.
    # LLARK_TPU_BENCH_QUANT=int4 selects group-int4 + the Pallas kernel
    # (experimental; requires LLARK_TPU_INT4_KERNEL=1 for the kernel path).
    import os

    if os.environ.get("LLARK_TPU_BENCH_QUANT") == "int4":
        # rows layout feeds the Pallas kernel (when LLARK_TPU_INT4_KERNEL=1);
        # cols layout exercises the XLA bitcast path
        layout = "rows" if os.environ.get("LLARK_TPU_INT4_KERNEL") else "cols"
        params = quantize_params_int4_incremental(cfg, params, layout=layout)
    else:
        params = quantize_params_int8_incremental(cfg, params)

    prefill = jax.jit(make_prefill_fn(cfg, audio_patch_id=31999, max_cache_len=MAX_LEN))
    gen_cfg = GenerationConfig(temperature=0.0, decode_chunk=CHUNK)
    decode_n = jax.jit(make_multistep_decode_fn(cfg, gen_cfg, CHUNK), donate_argnums=(2,))

    # NOTE: on the axon tunnel jax.block_until_ready is async; device_get of
    # a small output is the only reliable sync point.
    def sync(x):
        return jax.device_get(jnp.sum(x).astype(jnp.float32))

    def measure(batch, reps):
        """(decode tok/s aggregate, ttft seconds) at this batch size."""
        rng = np.random.RandomState(0)
        ids = jnp.asarray(rng.randint(0, 31996, size=(batch, PROMPT)).astype(np.int32))
        plen = jnp.full((batch,), PROMPT, jnp.int32)
        audio = jnp.asarray(rng.randn(batch, 60, cfg.mm_hidden_size).astype(np.float32))
        fcnt = jnp.full((batch,), 60, jnp.int32)

        # TTFT (prefill)
        logits, cache = prefill(params, ids, plen, audio, fcnt)
        sync(logits)
        t0 = time.perf_counter()
        logits, _cache2 = prefill(params, ids, plen, audio, fcnt)
        sync(logits)
        ttft = time.perf_counter() - t0

        token = jnp.argmax(logits, -1).astype(jnp.int32)
        key = jax.random.PRNGKey(0)
        toks, _lg, cache = decode_n(params, token, cache, plen, key)  # warm
        sync(toks)
        token = toks[:, -1]

        # best-of-N over 4-chunk windows (tunnel latency is noisy)
        best = 0.0
        step_base = 1
        for _rep in range(reps):
            N = 4 * CHUNK
            t0 = time.perf_counter()
            for i in range(4):
                toks, _lg, cache = decode_n(
                    params, token, cache, plen + CHUNK * (step_base + i), key
                )
                token = toks[:, -1]
            sync(token)
            best = max(best, N * batch / (time.perf_counter() - t0))
            step_base += 4
            if (step_base + 4) * CHUNK + PROMPT > MAX_LEN:
                break
        return best, ttft

    best, ttft = measure(B, reps=3)
    try:
        agg, _ = measure(4, reps=2)  # batched serving aggregate
    except Exception as e:
        sys.stderr.write(f"batch-4 measurement failed: {type(e).__name__}: {e}\n")
        agg = None
    try:
        agg8, _ = measure(8, reps=2)  # int8-KV capacity ceiling config
    except Exception as e:
        sys.stderr.write(f"batch-8 measurement failed: {type(e).__name__}: {e}\n")
        agg8 = None
    return cfg_name, best, ttft, baseline, agg, agg8


def run_jukebox():
    """Headline metric: Jukebox-embedding clips/s/chip.

    Baseline: 0.22 clips/s per V100 Dataflow worker (BASELINE.md; reference
    README "100k files < 1 hour" on 128 GPUs). Random weights — throughput
    depends only on architecture shapes."""
    import numpy as np

    from llark_tpu.encoders.jukebox import (
        JukeboxEncoder,
        JukeboxPriorConfig,
        JukeboxVQVAEConfig,
    )

    enc = JukeboxEncoder.random_init(
        JukeboxVQVAEConfig(dtype="bfloat16"),
        JukeboxPriorConfig(dtype="bfloat16"),
        pool_frames_per_second=10.0,
        transfer_dtype="int16",  # halve the ~100 MB/s tunnel upload
        output_dtype="bfloat16",  # halve the activation download
    )
    B = 2  # measured sweet spot on one v5e chip (B>=3 spills)
    audio = np.random.RandomState(0).randn(B, enc.samples_per_ctx).astype(np.float32)
    enc.encode_batch(audio)  # compile
    best = 0.0
    n_batches = 6
    for _ in range(2):
        batches = [(audio, None)] * n_batches
        t0 = time.perf_counter()
        for _acts, _counts in enc.encode_stream(iter(batches)):
            pass  # double-buffered: upload/compute overlap readback
        best = max(best, B * n_batches / (time.perf_counter() - t0))
    return best


def _retry(fn, attempts=2):
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — tunnel errors are transient
            sys.stderr.write(f"attempt {i}: {type(e).__name__}: {e}\n")
            if i == attempts - 1:
                raise
    return None


def main():
    out = None
    try:
        clips_per_s = _retry(run_jukebox)
        out = {
            "metric": "jukebox_embed_clips_per_sec_per_chip",
            "value": round(clips_per_s, 3),
            "unit": "clips/s/chip",
            "vs_baseline": round(clips_per_s / 0.22, 2),
        }
    except Exception as e:  # noqa: BLE001
        sys.stderr.write(f"jukebox bench failed: {type(e).__name__}: {e}\n")

    for name in ("7b", "1b"):
        try:
            cfg_name, tps, ttft, baseline, agg, agg8 = _retry(lambda: run(name))
            decode = {
                f"llark_{cfg_name}_decode_tokens_per_sec": round(tps, 2),
                f"llark_{cfg_name}_decode_vs_a100": round(tps / baseline, 3),
                "ttft_ms": round(ttft * 1e3, 1),
            }
            if agg:
                decode[f"llark_{cfg_name}_batch4_tokens_per_sec"] = round(agg, 2)
            if agg8:
                decode[f"llark_{cfg_name}_batch8_tokens_per_sec"] = round(agg8, 2)
            if out is None:
                out = {
                    "metric": f"llark_{cfg_name}_decode_tokens_per_sec",
                    "value": round(tps, 2),
                    "unit": "tokens/s",
                    "vs_baseline": round(tps / baseline, 3),
                }
            else:
                out.update(decode)
            break
        except Exception as e:  # noqa: BLE001
            sys.stderr.write(f"bench {name} failed: {type(e).__name__}: {e}\n")

    if out is None:
        sys.exit(1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
