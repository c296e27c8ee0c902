"""MPT-1B real-scale benchmark: train step time + decode tok/s on one chip.

VERDICT r1 item 9: the MPT family was correctness-tested only (tiny-mpt
e2e) with no real-config perf number. This benches the EXACT reference
MPT-1B ablation config (`ModelConfig.mpt_1b()`, reference:
m2t/llava/model/mpt/configuration_mpt.py:7-17 — 24L x 2048, 16 heads,
ALiBi, tied wte, LayerNorm, gelu) at the reference's training shape:

  * full-model train step, seq 2048, per-device batch 4 (the reference
    ablation runs 4 GPUs x bs 4 x accum 8 = global 128,
    scripts/training/train_mpt_model.sh:23-40; one chip owns the bs-4
    micro-step, accumulation/DP scale it out),
  * single-stream + batch-4 greedy decode tok/s (bf16 weights and,
    separately, int8 weight-only serving), chunked jitted decode.

Random weights — step time and tok/s depend only on architecture shapes.

Run on a TPU host from /root/repo:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench/bench_mpt1b.py
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from llark_tpu.config import ModelConfig, TrainingArguments
from llark_tpu.generate import GenerationConfig, make_multistep_decode_fn, make_prefill_fn
from llark_tpu.models.fusion import init_llark_params
from llark_tpu.models.quant import quantize_params_int8_incremental
from llark_tpu.train.state import TrainState
from llark_tpu.train.step import make_optimizer, make_train_step

SEQ = 2048
TRAIN_BATCH = 4
CHUNK = 32  # decode tokens per dispatch


def sync(x):
    # axon tunnel: block_until_ready is async; device_get of a small
    # reduction is the only reliable sync point (see bench.py).
    return jax.device_get(jnp.sum(x).astype(jnp.float32))


def bench_train_step(cfg: ModelConfig, audio_patch_id: int, reps: int) -> float:
    args = TrainingArguments(
        learning_rate=5e-5,
        max_steps=1000,
        warmup_ratio=0.03,
        lr_scheduler_type="cosine",
    )
    params = jax.jit(lambda k: init_llark_params(cfg, k))(jax.random.PRNGKey(0))
    optimizer = make_optimizer(args, params)
    state = jax.jit(lambda p: TrainState.create(p, optimizer))(params)
    step_fn = jax.jit(
        make_train_step(cfg, optimizer, audio_patch_id=audio_patch_id),
        donate_argnums=(0,),
    )

    rng = np.random.RandomState(0)
    n_frames = 60
    ids = rng.randint(4, cfg.vocab_size - 8, size=(TRAIN_BATCH, SEQ)).astype(np.int32)
    ids[:, 8 : 8 + n_frames] = audio_patch_id
    batch = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(ids),
        "seq_lengths": jnp.full((TRAIN_BATCH,), SEQ, jnp.int32),
        "audio_encodings": jnp.asarray(
            rng.randn(TRAIN_BATCH, n_frames, cfg.mm_hidden_size).astype(np.float32)
        ),
        "audio_frame_counts": jnp.full((TRAIN_BATCH,), n_frames, jnp.int32),
    }

    state, metrics = step_fn(state, batch)  # compile
    sync(metrics["loss"])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(4):
            state, metrics = step_fn(state, batch)
        sync(metrics["loss"])
        best = min(best, (time.perf_counter() - t0) / 4)
    return best


def bench_decode(cfg: ModelConfig, audio_patch_id: int, quant: bool, reps: int):
    MAX_LEN = 1024
    PROMPT = 512
    params = jax.jit(lambda k: init_llark_params(cfg, k))(jax.random.PRNGKey(0))
    if quant:
        params = quantize_params_int8_incremental(cfg, params)
    prefill = jax.jit(make_prefill_fn(cfg, audio_patch_id=audio_patch_id, max_cache_len=MAX_LEN))
    gen_cfg = GenerationConfig(temperature=0.0, decode_chunk=CHUNK)
    decode_n = jax.jit(make_multistep_decode_fn(cfg, gen_cfg, CHUNK), donate_argnums=(2,))

    def measure(batch):
        rng = np.random.RandomState(0)
        ids = jnp.asarray(rng.randint(4, 50000, size=(batch, PROMPT)).astype(np.int32))
        plen = jnp.full((batch,), PROMPT, jnp.int32)
        audio = jnp.asarray(rng.randn(batch, 60, cfg.mm_hidden_size).astype(np.float32))
        fcnt = jnp.full((batch,), 60, jnp.int32)
        logits, cache = prefill(params, ids, plen, audio, fcnt)
        token = jnp.argmax(logits, -1).astype(jnp.int32)
        key = jax.random.PRNGKey(0)
        toks, _lg, cache = decode_n(params, token, cache, plen, key)  # warm
        sync(toks)
        token = toks[:, -1]
        best, step_base = 0.0, 1
        for _ in range(reps):
            t0 = time.perf_counter()
            for i in range(4):
                toks, _lg, cache = decode_n(
                    params, token, cache, plen + CHUNK * (step_base + i), key
                )
                token = toks[:, -1]
            sync(token)
            best = max(best, 4 * CHUNK * batch / (time.perf_counter() - t0))
            step_base += 4
            if (step_base + 4) * CHUNK + PROMPT > MAX_LEN:
                break
        return best

    return measure(1), measure(4)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=None)
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--unroll", default="auto", choices=["auto", "0", "1"],
                    help="decode_unroll_layers: auto / force off / force on")
    args = ap.parse_args()

    audio_patch_id = 50368  # first added special token row
    results = {"device": str(jax.devices()[0])}

    # training: bf16 params (reference trains bf16; Adam moments mirror
    # the param dtype here — the fp32-master variant is a DP concern)
    if not args.skip_train:
        train_cfg = ModelConfig.mpt_1b(param_dtype="bfloat16", dtype="bfloat16")
        step_s = bench_train_step(train_cfg, audio_patch_id, args.reps)
        results["train_step_ms_b4_seq2048"] = round(step_s * 1e3, 1)
        results["train_tokens_per_sec"] = round(TRAIN_BATCH * SEQ / step_s, 0)
        print(f"train step (b{TRAIN_BATCH} x s{SEQ}): {step_s*1e3:.1f} ms "
              f"= {TRAIN_BATCH*SEQ/step_s:,.0f} tok/s", flush=True)

    unroll = None if args.unroll == "auto" else bool(int(args.unroll))
    serve_cfg = ModelConfig.mpt_1b(
        param_dtype="bfloat16", dtype="bfloat16", remat=False, kv_cache_quant=True,
        decode_unroll_layers=unroll,
    )
    for quant in (False, True):
        tag = "int8" if quant else "bf16"
        s1, s4 = bench_decode(serve_cfg, audio_patch_id, quant, args.reps)
        results[f"decode_{tag}_b1_tok_s"] = round(s1, 1)
        results[f"decode_{tag}_b4_tok_s"] = round(s4, 1)
        print(f"decode {tag}: b1 {s1:.1f} tok/s, b4 {s4:.1f} tok/s aggregate", flush=True)

    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
