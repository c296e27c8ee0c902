"""Device-trace a window of MPT-1B train steps and print the op-level
time breakdown.

Purpose: the sustained pipeline bench measures 44% MFU
(results_train_pipeline.json); this attributes the other 56% op-by-op
(attention share, LN/elementwise, optimizer update, remat recompute) so
the top cost can be acted on instead of guessed at.

Usage: python scripts/bench/profile_train_step.py [outdir]
"""

import os
import sys

import numpy as np

import jax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_train_pipeline import BATCH, FRAMES, MM, SEQ, build_step, sync
from profile_jukebox import report

from llark_tpu.config import ModelConfig
from llark_tpu.special_tokens import IGNORE_INDEX


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_trace"
    cfg = ModelConfig.mpt_1b(param_dtype="bfloat16", dtype="bfloat16")
    cfg.mm_hidden_size = MM
    state, step_fn, _ = build_step(cfg)

    rng = np.random.RandomState(0)
    ids = rng.randint(5, 50000, size=(BATCH, SEQ)).astype(np.int32)
    ids[:, 1 : 1 + FRAMES] = 50368  # audio patch span
    labels = np.where(
        np.arange(SEQ)[None, :] >= SEQ // 2, ids, IGNORE_INDEX
    ).astype(np.int32)
    batch = {
        "input_ids": ids,
        "labels": labels,
        "seq_lengths": np.full((BATCH,), SEQ, np.int32),
        "audio_encodings": rng.randn(BATCH, FRAMES, MM).astype(np.float32),
        "audio_frame_counts": np.full((BATCH,), FRAMES, np.int32),
    }
    dev = {k: jax.device_put(v) for k, v in batch.items()}
    state, m = step_fn(state, dev)  # compile
    sync(m["loss"])

    with jax.profiler.trace(outdir):
        for _ in range(3):
            state, m = step_fn(state, dev)
        sync(m["loss"])
    report(outdir)


if __name__ == "__main__":
    main()
