"""MoE dispatch-overhead benchmark (single chip).

EP needs >1 device on the expert axis to show parallel speedup; what CAN
be measured on one chip is the cost of the MoE machinery itself: the
GShard dense-dispatch einsums (one-hot [B,S,E,C] dispatch/combine)
around the expert GEMMs, vs a dense MLP with the SAME number of
ACTIVE parameters per token (top-2 of E experts ≈ dense with 2×
intermediate). Run:

    PYTHONPATH=/root/repo python scripts/bench/bench_moe_dispatch.py
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from llark_tpu.config import ModelConfig
from llark_tpu.models.fusion import init_llark_params, llark_forward
from llark_tpu.special_tokens import IGNORE_INDEX


def step_time(cfg, B=4, S=1024, iters=6):
    from llark_tpu.train.state import TrainState
    from llark_tpu.train.step import make_optimizer, make_train_step
    from llark_tpu.config import TrainingArguments

    params = init_llark_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    ids = rng.randint(4, cfg.vocab_size - 8, size=(B, S)).astype(np.int32)
    labels = np.where(np.arange(S)[None, :] >= 4, ids, IGNORE_INDEX).astype(np.int32)
    batch = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "seq_lengths": jnp.full((B,), S, jnp.int32),
    }
    args = TrainingArguments(max_steps=100, learning_rate=1e-4)
    opt = make_optimizer(args, params)
    state = TrainState.create(params, opt)
    fn = jax.jit(make_train_step(cfg, opt, audio_patch_id=3), donate_argnums=(0,))
    state, m = fn(state, batch)  # compile
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = fn(state, batch)
    _ = float(m["loss"])  # sync
    return (time.perf_counter() - t0) / iters


def main():
    # ~350M-class: d=1024, 16 layers. MoE: E=8 top-2 of i=2816 experts
    # (active MLP width 2×2816); dense control: i=5632 (same active width).
    common = dict(
        vocab_size=32000, hidden_size=1024, num_layers=16, num_heads=16,
        num_kv_heads=16, head_dim=64, max_seq_len=1024,
        dtype="bfloat16", param_dtype="bfloat16", remat=True,
    )
    dense = ModelConfig(intermediate_size=5632, **common)
    moe = ModelConfig(
        intermediate_size=2816, moe_num_experts=8, moe_top_k=2,
        moe_capacity_factor=1.25, **common,
    )
    t_dense = step_time(dense)
    t_moe = step_time(moe)
    print(json.dumps({
        "dense_ms_per_step": round(t_dense * 1e3, 1),
        "moe_ms_per_step": round(t_moe * 1e3, 1),
        "dispatch_overhead": round(t_moe / t_dense, 3),
        "note": "same active params/token (top-2 of 8 x i=2816 vs dense i=5632); "
                "MoE holds 4x the total MLP params",
    }))


if __name__ == "__main__":
    main()
