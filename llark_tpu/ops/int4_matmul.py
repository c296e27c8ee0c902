"""Pallas int4 weight-only matmul: unpack nibbles in VMEM, not HBM.

XLA cannot fuse an int4 nibble-unpack chain into a dot's operand read — it
materializes the dequantized weights in HBM, destroying the bandwidth win.
This kernel reads the PACKED int8 bytes into VMEM, unpacks + scales
in-register, and runs the matmul per output tile, so only int4 bytes ever
cross HBM.

Packing contract (pair layout, quantize_weight_int4): packed[r] holds
original row 2r in the low nibble and 2r+1 in the high nibble. The
activation splits outside the kernel into even/odd columns (a cheap
strided slice), so the kernel needs NO interleave:

    y = x_even @ (W_lo * s_rows) + x_odd @ (W_hi * s_rows)

Grid is over OUTPUT tiles only — the whole contraction dim lives in VMEM
per tile (sized by an in-function VMEM budget), so per-step overhead is a
handful of steps per matmul, not thousands.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _int4_matmul_kernel(
    xe_ref,  # VMEM [M, Hp]    even-row activations (whole contraction)
    xo_ref,  # VMEM [M, Hp]    odd-row activations
    wp_ref,  # VMEM [Hp, bd]   packed int8 (two nibbles per byte)
    s_ref,  # VMEM [Gpad, bd]  group scales (first n_groups rows valid)
    o_ref,  # VMEM [M, bd]
    *,
    n_groups: int,
    rpg: int,  # packed rows per group
):
    wp = wp_ref[...].astype(jnp.int32)
    lo = wp & 0xF
    hi = (wp >> 4) & 0xF
    # bf16 weights for the MXU (int4 fits in 3 mantissa bits — lossless)
    lo = jnp.where(lo > 7, lo - 16, lo).astype(jnp.bfloat16)
    hi = jnp.where(hi > 7, hi - 16, hi).astype(jnp.bfloat16)

    bd = lo.shape[1]
    s = s_ref[:n_groups, :].astype(jnp.bfloat16)  # [G, bd]
    s_rows = jnp.broadcast_to(
        s[:, None, :], (n_groups, rpg, bd)
    ).reshape(n_groups * rpg, bd)
    lo = lo * s_rows
    hi = hi * s_rows

    xe = xe_ref[...].astype(jnp.bfloat16)
    xo = xo_ref[...].astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        xe, lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        xo, hi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[...] = acc.astype(o_ref.dtype)


def _pick_block_d(d: int, hp: int, vmem_budget: int = 8 * 1024 * 1024) -> int:
    """Largest multiple-of-128 divisor of d whose tile working set
    (packed int8 + lo/hi/scaled bf16 copies ~ 7 bytes/elem) fits VMEM."""
    limit = max(128, vmem_budget // (7 * hp))
    candidates = [b for b in range(128, d + 1, 128) if d % b == 0]
    if not candidates:
        raise ValueError(f"D {d} has no multiple-of-128 divisor")
    fitting = [b for b in candidates if b <= limit]
    return max(fitting) if fitting else min(candidates)


def int4_matmul(
    x: jnp.ndarray,  # [M, H] activations (compute dtype)
    q4: jnp.ndarray,  # [H/2, D] packed int8 (pair layout)
    scale: jnp.ndarray,  # [H/group, D] f32 group scales
    *,
    group: int = 128,
    block_d: int = 0,  # 0 = auto (VMEM-budgeted)
    interpret: bool = False,
) -> jnp.ndarray:
    """y[M, D] = x @ dequant(q4, scale); packed bytes only in HBM."""
    m, h = x.shape
    hp, d = q4.shape
    if hp * 2 != h:
        raise ValueError(f"packed rows {hp} != H/2 ({h}/2)")
    n_groups = h // group
    if scale.shape != (n_groups, d):
        raise ValueError(f"scale shape {scale.shape} != {(n_groups, d)}")
    rpg = group // 2  # packed rows per group
    bd = block_d or _pick_block_d(d, hp)
    if d % bd:
        raise ValueError(f"D {d} must divide block_d {bd}")

    xe = x[:, 0::2]  # [M, H/2] even original rows
    xo = x[:, 1::2]
    g_pad = ((n_groups + 7) // 8) * 8  # sublane minimum
    s_pad = jnp.zeros((g_pad, d), jnp.float32)
    s_pad = s_pad.at[:n_groups].set(scale.astype(jnp.float32))

    grid = (d // bd,)
    return pl.pallas_call(
        functools.partial(_int4_matmul_kernel, n_groups=n_groups, rpg=rpg),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, hp), lambda di: (0, 0)),
            pl.BlockSpec((m, hp), lambda di: (0, 0)),
            pl.BlockSpec((hp, bd), lambda di: (0, di)),
            pl.BlockSpec((g_pad, bd), lambda di: (0, di)),
        ],
        out_specs=pl.BlockSpec((m, bd), lambda di: (0, di)),
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        interpret=interpret,
    )(xe, xo, q4, s_pad)
