"""Sweep the Jukebox-encoder clip batch size on the real chip.

The headline metric (bench.py) runs B=2 ("measured sweet spot, B>=3
spills" — round 1). Round-2 changes (int16 upload, bf16 download,
bucket-free jit graph) may have moved the spill point; this probe
re-measures device throughput per B with K dispatches queued per host
sync (tunnel RTT ~40-50 ms would otherwise dominate).

Usage: python scripts/bench/bench_jukebox_batch.py [B ...]
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    bs = [int(a) for a in sys.argv[1:]] or [2, 3, 4]
    from llark_tpu.encoders.jukebox import (
        JukeboxEncoder,
        JukeboxPriorConfig,
        JukeboxVQVAEConfig,
    )

    results = {}
    for b in bs:
        try:
            enc = JukeboxEncoder.random_init(
                JukeboxVQVAEConfig(dtype="bfloat16"),
                JukeboxPriorConfig(dtype="bfloat16"),
                pool_frames_per_second=10.0,
                transfer_dtype="int16",
                output_dtype="bfloat16",
            )
            audio = np.random.RandomState(0).randn(b, enc.samples_per_ctx)
            audio = audio.astype(np.float32)
            xfer = enc._prepare_transfer(audio)
            t0 = time.perf_counter()
            out = enc._encode(enc.vq_params, enc.prior_params, xfer)
            jax.device_get(jnp.sum(out).astype(jnp.float32))
            compile_s = time.perf_counter() - t0

            K = 4
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                outs = [
                    enc._encode(enc.vq_params, enc.prior_params, xfer)
                    for _ in range(K)
                ]
                jax.device_get(jnp.sum(sum(jnp.sum(o) for o in outs)).astype(jnp.float32))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            clips_s = b * K / best
            results[b] = {
                "clips_per_s_device": round(clips_s, 3),
                "ms_per_batch": round(1e3 * best / K, 1),
                "compile_s": round(compile_s, 1),
            }
            print(f"B={b}: {results[b]}", flush=True)
        except Exception as e:  # noqa: BLE001 — report OOM/spill per B
            results[b] = {"error": f"{type(e).__name__}: {e}"}
            print(f"B={b}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
