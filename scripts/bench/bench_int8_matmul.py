"""A/B: XLA int8 dequant-dot vs the Pallas fused kernel, 7B shapes.

The round-4 verdict's open question (weak #8): prefill tops at 50.7% MFU
and 7B training at 40.9%, both ATTRIBUTED to "int8 weights dequantized
into bf16 dots" — but whether XLA actually fuses the int8->bf16 convert
into the dot operand read (1 weight byte/elem of HBM traffic) or
materializes a bf16 copy (3x traffic) was asserted, not probed. This
bench times both paths on the exact 7B projection shapes at the two
phases that matter:

  * prefill chunk 256 x admit 2 -> x [512, 4096]  (compute-bound regime)
  * 8-slot decode (sublane-padded) -> x [16, 4096] (bandwidth-bound regime)

Method (tunnel-safe, PERFORMANCE.md round-2 lessons): each side runs
`iters` chained matmuls inside ONE jitted lax.scan (outputs feed a
zero-scaled dependency back into the carry, so the chain cannot be
elided), synced once by device_get of a small reduction. Reports
ms/matmul, effective TFLOP/s, and effective weight GB/s per side.

Run on a TPU host:
  JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python scripts/bench/bench_int8_matmul.py
CPU smoke: python scripts/bench/bench_int8_matmul.py --tiny
"""
import argparse
import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from llark_tpu.models.quant import quantize_weight, quantized_dense
from llark_tpu.ops.int8_matmul import int8_matmul, quantized_dense_kernel

ap = argparse.ArgumentParser()
ap.add_argument("--tiny", action="store_true", help="CPU smoke (interpret)")
ap.add_argument("--iters", type=int, default=64)
ap.add_argument("--repeats", type=int, default=3)
ap.add_argument("--decode-sweep", action="store_true",
                help="sweep decode row counts m in {1,4,8} instead of the "
                     "default prefill/decode pair (m=1 is single-stream "
                     "decode, the bench.py headline's shape)")
args = ap.parse_args()

if args.tiny:
    jax.config.update("jax_platforms", "cpu")
    SHAPES = [("toy", 16, 128, 256)]
    DTYPE = jnp.float32
elif args.decode_sweep:
    SHAPES = [
        (f"{proj} m={m}", m, k, n)
        for m in (1, 4, 8)
        for proj, k, n in (
            ("attn 4096x4096", 4096, 4096),
            ("mlp up 4096x11008", 4096, 11008),
            ("mlp down 11008x4096", 11008, 4096),
        )
    ]
    DTYPE = jnp.bfloat16
else:
    # 7B Llama projections; lm_head (32004) is excluded — 32004 % 128 != 0,
    # the kernel's gate skips it in production too
    SHAPES = [
        ("attn 4096x4096 prefill", 512, 4096, 4096),
        ("mlp up 4096x11008 prefill", 512, 4096, 11008),
        ("mlp down 11008x4096 prefill", 512, 11008, 4096),
        ("attn 4096x4096 decode", 16, 4096, 4096),
        ("mlp up 4096x11008 decode", 16, 4096, 11008),
        ("mlp down 11008x4096 decode", 16, 11008, 4096),
    ]
    DTYPE = jnp.bfloat16

rng = np.random.RandomState(0)


def timed(fn, x):
    """Median-of-repeats wall time for one jitted chained-scan call."""
    y = fn(x)
    float(jax.device_get(y))  # compile + warm
    best = float("inf")
    for _ in range(args.repeats):
        t0 = time.time()
        float(jax.device_get(fn(x)))
        best = min(best, time.time() - t0)
    return best / args.iters


for name, m, k, n in SHAPES:
    w = (rng.randn(k, n) * 0.02).astype(np.float32)
    wq = quantize_weight(jnp.asarray(w))
    wq = {"q": wq["q"], "scale": wq["scale"]}
    x0 = jnp.asarray(rng.randn(m, k), DTYPE)

    def chain(step):
        def body(x, _):
            y = step(x)
            # feed a zero-scaled slice back so the scan cannot collapse;
            # pad when N < K (toy shapes only)
            dep = y[:, :k] if n >= k else jnp.pad(y, ((0, 0), (0, k - n)))
            return x + (0.0 * dep).astype(x.dtype), ()

        @jax.jit
        def run(x):
            x, _ = jax.lax.scan(body, x, None, length=args.iters)
            return jnp.sum(x[0, :8].astype(jnp.float32))

        return run

    xla_fn = chain(
        lambda x: quantized_dense(x[None], wq, None, DTYPE)[0]
    )
    if args.decode_sweep:
        # the production wrapper: pads m to the sublane minimum (16 for
        # bf16) — at m<16 the kernel's honest cost includes the padding,
        # exactly as quantized_dense would pay it in the decode loop
        pallas_fn = chain(
            lambda x: quantized_dense_kernel(
                x, wq, None, DTYPE, interpret=bool(args.tiny)
            )
        )
    else:
        pallas_fn = chain(
            functools.partial(
                lambda x, interp: int8_matmul(
                    x, wq["q"], wq["scale"], interpret=interp
                ),
                interp=bool(args.tiny),
            )
        )
    t_xla = timed(xla_fn, x0)
    t_pal = timed(pallas_fn, x0)
    flops = 2.0 * m * k * n
    wbytes = float(k * n)  # int8: 1 byte/elem is the fused-read floor
    print(json.dumps({
        "shape": name, "m": m, "k": k, "n": n,
        "xla_ms": round(t_xla * 1e3, 4),
        "pallas_ms": round(t_pal * 1e3, 4),
        "pallas_vs_xla": round(t_xla / t_pal, 3),
        "xla_tflops": round(flops / t_xla / 1e12, 1),
        "pallas_tflops": round(flops / t_pal / 1e12, 1),
        "xla_weight_gbps": round(wbytes / t_xla / 1e9, 1),
        "pallas_weight_gbps": round(wbytes / t_pal / 1e9, 1),
    }))
