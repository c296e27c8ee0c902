"""Pallas int8 weight-only matmul: dequantize inside the dot's operand read.

The serving/training int8 path (models/quant.py quantized_dense) computes
`(x @ q.astype(bf16)) * scale` and RELIES on XLA fusing the int8->bf16
convert into the dot operand read — if it instead materializes a bf16
copy of the weights, every projection pays 3x the weight HBM traffic
(1 byte read + 2 bytes written + 2 bytes re-read per element). This
kernel removes the question: the int8 bytes are the ONLY weight bytes
that cross HBM; the convert happens in VMEM registers feeding the MXU,
and the per-output-channel scale is applied to the f32 accumulator
(cheap: [M, bn] elementwise per tile, vs [K, bn] on the weight side).

This is the round-5 probe for the asserted quantized-matmul ceiling
(prefill 50.7% MFU / 7B train 40.9% MFU were both attributed to the
int8 dequant-dot; VERDICT r4 weak #8): an A/B against the XLA path on
the 7B projection shapes either lifts the dominant phase or pins the
ceiling with a measurement. Grid layout follows ops/int4_matmul.py:
output tiles only, whole contraction dim resident in VMEM per tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _int8_matmul_kernel(
    x_ref,  # VMEM [M, K]   activations (compute dtype)
    q_ref,  # VMEM [K, bn]  int8 weights
    s_ref,  # VMEM [8, bn]  per-output-channel scale (row 0 valid)
    o_ref,  # VMEM [M, bn]
):
    x = x_ref[...]
    w = q_ref[...].astype(x.dtype)  # in-register dequant (lossless: int8
    # fits bf16's 8 explicit mantissa bits; compute dtype matches the XLA
    # path so outputs are bit-comparable)
    acc = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[...] = (acc * s_ref[0, :][None, :]).astype(o_ref.dtype)


def _pick_block_n(n: int, k: int, vmem_budget: int = 6 * 1024 * 1024) -> int:
    """Largest multiple-of-128 divisor of n whose weight-tile working set
    (int8 + bf16 in-register copy ~ 3 bytes/elem over K rows) fits the
    budget; the [M, K] activation block is grid-invariant and amortized."""
    limit = max(128, vmem_budget // (3 * k))
    candidates = [b for b in range(128, n + 1, 128) if n % b == 0]
    if not candidates:
        raise ValueError(f"N {n} has no multiple-of-128 divisor")
    fitting = [b for b in candidates if b <= limit]
    return max(fitting) if fitting else min(candidates)


def int8_matmul(
    x: jnp.ndarray,  # [M, K] activations (compute dtype)
    q: jnp.ndarray,  # [K, N] int8 weights
    scale: jnp.ndarray,  # [N] or [1, N] f32 per-output-channel scales
    *,
    block_n: int = 0,  # 0 = auto (VMEM-budgeted)
    block_m: int = 256,  # M tile (prefill chunks can exceed VMEM with K=11008)
    interpret: bool = False,
) -> jnp.ndarray:
    """y[M, N] = (x @ q) * scale; int8 weight bytes only in HBM."""
    m, k = x.shape
    kq, n = q.shape
    if kq != k:
        raise ValueError(f"weight rows {kq} != activation cols {k}")
    scale = scale.reshape(-1)
    if scale.shape != (n,):
        raise ValueError(f"scale size {scale.shape} != out dim {n}")
    bn = block_n or _pick_block_n(n, k)
    if n % bn:
        raise ValueError(f"N {n} must divide block_n {bn}")
    bm = min(block_m, m)
    if m % bm:
        raise ValueError(f"M {m} must divide block_m {bm} (callers pad)")
    # sublane-pad the scale row (f32 min tile is 8 x 128)
    s_pad = jnp.zeros((8, n), jnp.float32).at[0].set(scale.astype(jnp.float32))

    # N is the minor grid axis so consecutive steps reuse the resident
    # activation block and stream weight tiles (weights are the traffic
    # this kernel exists to bound)
    grid = (m // bm, n // bn)
    return pl.pallas_call(
        _int8_matmul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda mi, ni: (mi, 0)),
            pl.BlockSpec((k, bn), lambda mi, ni: (0, ni)),
            pl.BlockSpec((8, bn), lambda mi, ni: (0, ni)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda mi, ni: (mi, ni)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        interpret=interpret,
    )(x, q, s_pad)


def quantized_dense_kernel(x, wq, b, dtype, *, interpret: bool = False):
    """Drop-in for models/quant.py quantized_dense on 2D weight leaves:
    flattens leading dims, pads M to the sublane minimum, and dispatches
    the fused kernel. Callers gate on shape compatibility (K and N
    multiples of 128)."""
    q, scale = wq["q"], wq["scale"]
    lead = x.shape[:-1]
    xm = x.reshape(-1, x.shape[-1]).astype(dtype)
    m = xm.shape[0]
    # pad rows to the sublane minimum, or to the M tile when tiling kicks in
    sub = 16 if dtype == jnp.bfloat16 else 8
    pad = (-m) % (256 if m > 256 else sub)
    if pad:
        xm = jnp.pad(xm, ((0, pad), (0, 0)))
    y = int8_matmul(xm, q, scale, interpret=interpret)
    y = y[:m].reshape(*lead, q.shape[-1])
    if b is not None:
        y = y + b.astype(dtype)
    return y
