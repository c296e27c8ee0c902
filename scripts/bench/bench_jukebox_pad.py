"""Bounded MXU-occupancy experiment: 128-padded Jukebox prior widths.

VERDICT r3 next-round item 7. The round-3 device profile pinned the
remaining Jukebox-encode gap INSIDE the matmul fusions at 76-84% MXU
occupancy on off-tile widths (4800/3600/1200 are 64- but not 128-aligned;
PERFORMANCE.md "Jukebox ceiling"). The cheap lever before declaring the
ceiling: pad the contraction widths to 128 multiples

    width      4800 -> 4864   (38 x 128)
    qkv        3600 -> 3712   (29 x 128, via m_attn = 1280/4864, 8 heads
                               x head_dim 160 -> 160 stays 128-unaligned
                               per head but the fused dot is 3712 wide)
    attn inner 1200 -> 1280   (10 x 128)

and measure the same B=2 encode dispatch. This probe uses random weights
at the padded dims — it measures the THROUGHPUT HEADROOM only. If it wins
meaningfully, the production version zero-pads imported weights and masks
the LayerNorm reductions to the first 4800 dims (numerics-preserving);
if it loses or is flat, the negative goes next to the "custom Pallas
emitter not pursued" note.

Usage (idle TPU host): python scripts/bench/bench_jukebox_pad.py
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from llark_tpu.encoders.jukebox import (
    JukeboxEncoder,
    JukeboxPriorConfig,
    JukeboxVQVAEConfig,
)


def bench_cfg(tag: str, prior_cfg: JukeboxPriorConfig, b: int = 2) -> dict:
    enc = JukeboxEncoder.random_init(
        JukeboxVQVAEConfig(dtype="bfloat16"),
        prior_cfg,
        pool_frames_per_second=10.0,
        transfer_dtype="int16",
        output_dtype="bfloat16",
    )
    audio = np.random.RandomState(0).randn(b, enc.samples_per_ctx).astype(np.float32)
    xfer = enc._prepare_transfer(audio)
    t0 = time.perf_counter()
    out = enc._encode(enc.vq_params, enc.prior_params, xfer)
    jax.device_get(jnp.sum(out).astype(jnp.float32))
    compile_s = time.perf_counter() - t0

    K = 4
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [enc._encode(enc.vq_params, enc.prior_params, xfer) for _ in range(K)]
        jax.device_get(jnp.sum(sum(jnp.sum(o) for o in outs)).astype(jnp.float32))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    row = {
        "tag": tag,
        "width": prior_cfg.width,
        "attn_width": prior_cfg.attn_width,
        "clips_per_s_device": round(b * K / best, 3),
        "ms_per_dispatch": round(1e3 * best / K, 1),
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(row), flush=True)
    del enc
    return row


def main():
    base = bench_cfg("baseline-4800", JukeboxPriorConfig(dtype="bfloat16"))
    padded = bench_cfg(
        "padded-4864",
        JukeboxPriorConfig(
            dtype="bfloat16", width=4864, m_attn=1280.0 / 4864.0, m_mlp=1.0
        ),
    )
    # FLOP-normalized comparison: the padded graph does (4864/4800)^2 more
    # MLP work, so equal ms/dispatch means the padded matmuls run ~2.7%
    # more efficiently — the win only matters if wall clock DROPS.
    speedup = base["ms_per_dispatch"] / padded["ms_per_dispatch"]
    print(json.dumps({
        "wall_speedup_padded_vs_base": round(speedup, 4),
        "flop_ratio_padded_vs_base": round((4864 / 4800) ** 2, 4),
        "verdict": ("PAD WINS: implement masked-LN zero-padded import"
                    if speedup > 1.02 else
                    "PAD DOES NOT PAY: record the negative, ceiling stands"),
    }))


if __name__ == "__main__":
    main()
