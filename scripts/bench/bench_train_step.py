"""Full-train-step A/B at seq 2048: fused Pallas flash-attention backward
vs the round-1 backward (Pallas fwd + XLA-recompute bwd).

VERDICT r1 item 3 asked for "a measured train-step speedup at seq 2048"
— PERFORMANCE.md records the op-level 2.18x; this measures the same A/B
at the level a user feels: ms per full optimizer step (fwd + bwd + adam),
reference role: the fully-fused CUDA flash-attn the reference trains with
(m2t/llava/model/mpt/attention.py:99-159).

Configs:
  * mpt1b: the exact reference MPT-1B ablation config, full-model train,
    b4 x seq 2048 (same shape as scripts/bench/bench_mpt1b.py).
  * 7b-qlora: Llama-2-7b architecture, int8 frozen base + rank-64 LoRA,
    remat, b1 x seq 2048 (the record-run shape at full sequence length).

The A/B toggle is LLARK_TPU_FLASH_BWD=recompute (ops/attention.py), read
at trace time — set BEFORE the first compile of each arm.

Run on a TPU host from /root/repo:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench/bench_train_step.py
"""

import argparse
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from llark_tpu.config import ModelConfig, TrainingArguments
from llark_tpu.models.fusion import init_llark_params
from llark_tpu.train.state import TrainState
from llark_tpu.train.step import make_optimizer, make_train_step

SEQ = 2048
AUDIO_PATCH_ID = 31999


def sync(x):
    return jax.device_get(jnp.sum(x).astype(jnp.float32))


def make_cfg(name: str):
    if name == "mpt1b":
        cfg = ModelConfig.mpt_1b()
        return cfg, 4, False
    if name == "tiny":  # CPU smoke (correct wiring, not a perf number)
        cfg = ModelConfig.tiny(dtype="float32", mm_hidden_size=8)
        cfg.lora_rank, cfg.lora_alpha = 4, 8.0
        return cfg, 2, True
    if name == "tiny-full":
        return ModelConfig.tiny(dtype="float32", mm_hidden_size=8), 2, False
    cfg = ModelConfig(
        arch="llama",
        vocab_size=32004,
        hidden_size=4096,
        intermediate_size=11008,
        num_layers=32,
        num_heads=32,
        num_kv_heads=32,
        head_dim=128,
        max_seq_len=SEQ,
        mm_hidden_size=4800,
        dtype="bfloat16",
        param_dtype="bfloat16",
        remat=True,
        lora_rank=64,
        lora_alpha=16.0,
    )
    return cfg, 1, True


def bench_one(cfg_name: str, reps: int, seq: int = SEQ) -> float:
    cfg, batch, qlora = make_cfg(cfg_name)
    args = TrainingArguments(
        learning_rate=5e-5, max_steps=1000, warmup_ratio=0.03,
        lr_scheduler_type="cosine",
    )
    params = jax.jit(lambda k: init_llark_params(cfg, k))(jax.random.PRNGKey(0))
    partition = None
    if qlora:
        from llark_tpu.models.lora import init_lora_params
        from llark_tpu.models.quant import quantize_params_int8_incremental
        from llark_tpu.train.step import ParamPartition, trainable_mask

        params = init_lora_params(cfg, jax.random.PRNGKey(1), params)
        params = quantize_params_int8_incremental(cfg, params)
        partition = ParamPartition(params, trainable_mask(params, lora=True))
    # plain optimizer: with a partition the train step takes gradients over
    # the trainable leaves only (train/train.py does the same)
    optimizer = make_optimizer(args, params)
    state = jax.jit(lambda p: TrainState.create(p, optimizer, partition))(params)
    step_fn = jax.jit(
        make_train_step(
            cfg, optimizer, audio_patch_id=AUDIO_PATCH_ID, partition=partition
        ),
        donate_argnums=(0,),
    )

    rng = np.random.RandomState(0)
    n_frames = 60
    ids = rng.randint(4, cfg.vocab_size - 8, size=(batch, seq)).astype(np.int32)
    ids[:, 8 : 8 + n_frames] = AUDIO_PATCH_ID
    data = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(ids),
        "seq_lengths": jnp.full((batch,), seq, jnp.int32),
        "audio_encodings": jnp.asarray(
            rng.randn(batch, n_frames, cfg.mm_hidden_size).astype(np.float32)
        ),
        "audio_frame_counts": jnp.full((batch,), n_frames, jnp.int32),
    }

    state, metrics = step_fn(state, data)  # compile
    sync(metrics["loss"])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(4):
            state, metrics = step_fn(state, data)
        sync(metrics["loss"])
        best = min(best, (time.perf_counter() - t0) / 4)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs", nargs="+", default=["mpt1b"])
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--seq", type=int, default=SEQ)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    mode = os.environ.get("LLARK_TPU_FLASH_BWD", "fused")
    results = {"flash_bwd": mode}
    for name in args.configs:
        ms = bench_one(name, args.reps, args.seq) * 1e3
        results[name] = {"ms_per_step": round(ms, 1), "seq": args.seq}
        print(f"{name}: {ms:.1f} ms/step (flash_bwd={mode})", flush=True)
    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
