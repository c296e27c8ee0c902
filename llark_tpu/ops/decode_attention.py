"""Fused flash-decode attention: streaming KV-cache reads for short-query steps.

Decode attention through plain XLA always reads the FULL padded cache
(the mask is applied after the dots), so serving with a max_seq_len-
sized cache pays for dead positions on every step. This kernel reads
only the LIVE context:

  * the cache stays blocked in HBM; the grid's trailing dimension walks
    S-blocks so Mosaic double-buffers contiguous fetches (int8 cache is
    read as int8 — dequant scales fold into the dots, matching
    ops/attention.py xla_attention semantics)
  * per-row kv_lengths are scalar-prefetched; the BlockSpec index_map
    clamps past-the-end block indices to the last needed block, so
    revisited blocks are NOT refetched — bytes read scale with the live
    context, not the padded max_seq_len
  * online-softmax (m, l, acc) scratch persists across the sequential
    grid; output is written once on each output block's final live block
  * GQA: a kv head's whole q-head group shares one cache fetch
  * multi-query windows (speculative verify, Sq<=16) apply in-window
    causal masking from per-row first-query positions

Measured constraint (PERFORMANCE.md round-2 roofline): Pallas grid-cell
overhead is ~0.7-1 us on this stack, so cell count dominates at decode
shapes. The default ALL-HEADS layout therefore puts every kv head in one
cell — grid (B, S-blocks), in-kernel unrolled loop over heads — cutting
cells by Hkv x vs the per-head layout (kept as all_heads=False for
block-size flexibility). XLA's dense padded read streams at ~490 GB/s;
this kernel wins when live context is well below the padded cache
length (the common serving regime), loses near cache-full.

Reference kernel role: m2t/llava/model/mpt/attention.py flash_attn_fn
at decode time (the reference has no decode-specialized kernel at all —
its flash-attn path is prefill-only and decode falls back to dense).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llark_tpu.ops.attention import DEFAULT_MASK_VALUE, xla_attention


def _decode_kernel(
    # scalar prefetch
    kvlen_ref,  # SMEM [B] int32: live cache length per row (mask bound)
    qpos_ref,  # SMEM [B] int32: absolute position of the FIRST query token
    slope_ref,  # SMEM [H] f32: per-head alibi slopes (0 = disabled)
    table_ref,  # SMEM [B, max_blocks] int32 block table (paged; [1,1] dense)
    # inputs
    q_ref,  # VMEM [1, group, sq, D]
    k_ref,  # VMEM [1, 1, block_k, D] (int8 or compute dtype)
    v_ref,  # VMEM [1, 1, block_k, D]
    *rest,  # optional k_scale/v_scale [1, 1, 1, block_k]; o_ref; 3 scratch
    block_k: int,
    num_k_blocks: int,
    group: int,
    sq: int,
    scale: float,
    quant: bool,
    sk: int,
):
    if quant:
        ks_ref, vs_ref, o_ref, acc_ref, m_ref, l_ref = rest
    else:
        o_ref, acc_ref, m_ref, l_ref = rest
    rows = group * sq
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    kb = pl.program_id(2)
    kv_len = kvlen_ref[bi]
    q_pos = qpos_ref[bi]
    last_block = jnp.maximum(pl.cdiv(kv_len, block_k), 1) - 1

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(kb <= last_block)
    def _():
        q = q_ref[0].reshape(rows, q_ref.shape[-1]).astype(jnp.float32) * scale
        kblk = k_ref[0, 0].astype(jnp.float32)  # [block_k, D]
        s = jax.lax.dot_general(
            q, kblk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [rows, block_k]
        if quant:
            s = s * ks_ref[0, 0, 0][None, :]
        k_pos = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (rows, block_k), 1
        )
        # absolute position of each query row: q_pos + local index (rows are
        # head-major: row = g*sq + j)
        q_pos_row = q_pos + jax.lax.broadcasted_iota(
            jnp.int32, (group, sq, 1), 1
        ).reshape(rows, 1)
        # alibi: slope * (k_pos - q_pos_row); slopes are 0 for non-alibi
        if group == 1:
            slope = slope_ref[hi].reshape(1, 1)
        else:
            slope = jnp.stack(
                [slope_ref[hi * group + r] for r in range(group)]
            ).reshape(group, 1)
        slope = jnp.broadcast_to(slope[:, None, :], (group, sq, 1)).reshape(rows, 1)
        s = s + slope * (k_pos - q_pos_row).astype(jnp.float32)
        # causality: keys after a row's own position are invisible; the
        # per-batch-row live length bounds everything (at sq=1 the length
        # bound alone implies causality)
        mask = k_pos < kv_len
        if sq > 1:
            mask = mask & (k_pos <= q_pos_row)
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_ref[:, :1]  # [rows, 1]
        l_prev = l_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)  # [rows, block_k]
        if quant:
            # fold V's dequant scale in BEFORE masking: a garbage scale in
            # the (non-divisible) tail block must not turn 0 into NaN
            pv = p * vs_ref[0, 0, 0][None, :]
        else:
            pv = p
        p = jnp.where(mask, p, 0.0)
        pv = jnp.where(mask, pv, 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:] = jnp.broadcast_to(
            alpha * l_prev + jnp.sum(p, axis=1, keepdims=True), l_ref.shape
        )
        vblk = v_ref[0, 0]
        if sk % block_k:
            # tail block rows beyond sk hold unspecified pad values; zero
            # them so 0-prob x non-finite cannot poison the accumulator
            vrow = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_k, 1), 0
            )
            vblk = jnp.where(vrow < sk, vblk.astype(jnp.float32), 0.0)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            pv.astype(jnp.float32),
            vblk.astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(kb == jnp.minimum(last_block, num_k_blocks - 1))
    def _():
        l = l_ref[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        d = o_ref.shape[-1]
        o_ref[0] = (acc_ref[:] / l_safe).reshape(group, sq, d).astype(o_ref.dtype)


def _decode_kernel_all_heads(
    # scalar prefetch
    kvlen_ref,  # SMEM [B] int32
    qpos_ref,  # SMEM [B] int32: first-query absolute positions
    slope_ref,  # SMEM [H] f32
    table_ref,  # SMEM [B, max_blocks] int32 block table (paged; [1,1] dense)
    # inputs
    q_ref,  # VMEM [1, H, sq, D]
    k_ref,  # VMEM [1, Hkv, block_k, D] (int8 or compute dtype)
    v_ref,  # VMEM [1, Hkv, block_k, D]
    *rest,  # optional k_scale/v_scale [1, Hkv, 1, block_k]; o_ref; 3 scratch
    block_k: int,
    num_k_blocks: int,
    hkv: int,
    group: int,
    sq: int,
    scale: float,
    quant: bool,
    sk: int,
):
    """All-heads-per-cell layout: grid (B, S-blocks); the in-kernel loop
    over kv heads is a static unroll. Cuts grid cells by Hkv x — the
    per-cell overhead (~0.7 us) otherwise dominates decode shapes."""
    if quant:
        ks_ref, vs_ref, o_ref, acc_ref, m_ref, l_ref = rest
    else:
        o_ref, acc_ref, m_ref, l_ref = rest
    rows_h = group * sq
    d = q_ref.shape[-1]
    bi = pl.program_id(0)
    kb = pl.program_id(1)
    kv_len = kvlen_ref[bi]
    q_pos = qpos_ref[bi]
    last_block = jnp.maximum(pl.cdiv(kv_len, block_k), 1) - 1

    @pl.when(kb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(kb <= last_block)
    def _():
        k_pos = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (rows_h, block_k), 1
        )
        q_pos_row = q_pos + jax.lax.broadcasted_iota(
            jnp.int32, (group, sq, 1), 1
        ).reshape(rows_h, 1)
        mask = k_pos < kv_len
        if sq > 1:
            mask = mask & (k_pos <= q_pos_row)
        if sk % block_k:
            vrow_valid = (
                kb * block_k
                + jax.lax.broadcasted_iota(jnp.int32, (block_k, 1), 0)
            ) < sk
        for h in range(hkv):
            sl = slice(h * rows_h, (h + 1) * rows_h)
            q = q_ref[0, h * group:(h + 1) * group].reshape(
                rows_h, d
            ).astype(jnp.float32) * scale
            kblk = k_ref[0, h].astype(jnp.float32)  # [block_k, D]
            s = jax.lax.dot_general(
                q, kblk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if quant:
                s = s * ks_ref[0, h, 0][None, :]
            if group == 1:
                slope = slope_ref[h].reshape(1, 1)
            else:
                slope = jnp.stack(
                    [slope_ref[h * group + r] for r in range(group)]
                ).reshape(group, 1)
            slope = jnp.broadcast_to(
                slope[:, None, :], (group, sq, 1)
            ).reshape(rows_h, 1)
            s = s + slope * (k_pos - q_pos_row).astype(jnp.float32)
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

            m_prev = m_ref[sl, :1]
            l_prev = l_ref[sl, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            pv = p * vs_ref[0, h, 0][None, :] if quant else p
            p = jnp.where(mask, p, 0.0)
            pv = jnp.where(mask, pv, 0.0)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[sl] = jnp.broadcast_to(
                alpha * l_prev + jnp.sum(p, axis=1, keepdims=True),
                (rows_h, l_ref.shape[1]),
            )
            vblk = v_ref[0, h]
            if sk % block_k:
                vblk = jnp.where(vrow_valid, vblk.astype(jnp.float32), 0.0)
            acc_ref[sl] = acc_ref[sl] * alpha + jax.lax.dot_general(
                pv.astype(jnp.float32),
                vblk.astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_ref[sl] = jnp.broadcast_to(m_new, (rows_h, m_ref.shape[1]))

    @pl.when(kb == jnp.minimum(last_block, num_k_blocks - 1))
    def _():
        l = l_ref[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[:] / l_safe).reshape(
            hkv * group, sq, d
        ).astype(o_ref.dtype)


# the dense path keeps double-buffered K+V blocks within this budget by
# halving block_k; paged mode can't halve (block_k == pool block size), so
# max_paged_block_size is the hard cap BatchedServer and flash_decode_attention
# validate against
_PAGED_VMEM_BUDGET = 8 * 1024 * 1024


def max_paged_block_size(num_kv_heads: int, head_dim: int, itemsize: int) -> int:
    """Largest kv_block_size whose double-buffered K+V blocks
    (2 buffers x (K+V) = 4 copies of [Hkv, block, D]) fit the VMEM budget,
    rounded down to the Mosaic-required multiple of 8."""
    cap = _PAGED_VMEM_BUDGET // (num_kv_heads * head_dim * itemsize * 4)
    return max(8, (cap // 8) * 8)


def flash_decode_attention(
    q: jnp.ndarray,  # [B, H, 1, D]
    k_cache: jnp.ndarray,  # [B, Hkv, S, D] int8 or compute dtype
    v_cache: jnp.ndarray,
    *,
    kv_lengths: jnp.ndarray,  # [B] int32 live length (newest token included)
    q_positions: Optional[jnp.ndarray] = None,  # [B] abs query positions
    k_scale: Optional[jnp.ndarray] = None,  # [B, Hkv, S] f32 (int8 cache)
    v_scale: Optional[jnp.ndarray] = None,
    slopes: Optional[jnp.ndarray] = None,  # [H] alibi slope magnitudes
    block_k: int = 512,
    all_heads: bool = True,
    interpret: bool = False,
    block_tables: Optional[jnp.ndarray] = None,  # [B, max_blocks] int32
) -> jnp.ndarray:
    """Short-query decode attention against a (possibly int8) KV cache.

    Equivalent to `xla_attention(q, cache, ..., q_offset=q_positions)` for
    small Sq (single-token decode: Sq=1; speculative verify: Sq=gamma+1)
    but reads only ceil(kv_len / block_k) cache blocks per row, as
    contiguous pipelined DMAs. `q_positions` is the absolute position of
    each row's FIRST query; queries within a row sit at consecutive
    positions. Returns [B, H, Sq, D] in q.dtype.

    Paged mode (`block_tables` given): the caches are block POOLS of shape
    [N_blocks, Hkv, block_size, D] (scales [N_blocks, Hkv, block_size])
    shared by all rows; row b's logical block i lives in physical block
    `block_tables[b, i]`. The table rides in scalar-prefetch memory and
    the indirection happens in the BlockSpec index_map, so the kernel body
    is IDENTICAL to the dense one — HBM still sees one contiguous
    pipelined DMA per live block, and consecutive repeats (clamped
    past-the-end cells, parked rows pointing at one parking block) skip
    the refetch. Requires all_heads=True.
    """
    b, h, sq, d = q.shape
    paged = block_tables is not None
    if paged:
        if not all_heads:
            raise ValueError("paged decode requires the all-heads layout")
        n_blocks, hkv, block_k, _ = k_cache.shape
        # paged block_k is pinned to the physical pool block size, so the
        # dense path's halve-until-it-fits VMEM guard below cannot apply —
        # validate up front instead of failing in Mosaic with an opaque
        # compile error (or exhausting VMEM at runtime)
        cap = max_paged_block_size(hkv, d, k_cache.dtype.itemsize)
        if block_k > cap:
            raise ValueError(
                f"paged kv_block_size={block_k} needs "
                f"{hkv * block_k * d * k_cache.dtype.itemsize * 4 / 2**20:.1f} "
                f"MiB of double-buffered K+V VMEM (budget "
                f"{_PAGED_VMEM_BUDGET / 2**20:.0f} MiB); use kv_block_size "
                f"<= {cap} for {hkv} KV heads x head_dim {d}"
            )
        max_blocks = block_tables.shape[1]
        sk = max_blocks * block_k  # logical length; always block-divisible
        table_arr = block_tables.astype(jnp.int32).reshape(b, max_blocks)
    else:
        _, hkv, sk, _ = k_cache.shape
        block_k = min(block_k, sk)
        if sk >= 128:
            # Mosaic's last-two-dims rule: the int8-scale block's last dim
            # is block_k, which must be 128-divisible unless it spans the
            # whole cache — clamp sub-128 requests up
            block_k = max(block_k, 128)
        table_arr = jnp.zeros((1, 1), jnp.int32)  # unused by dense maps
    group = h // hkv
    quant = k_scale is not None

    kvlen_arr = kv_lengths.astype(jnp.int32).reshape(b)
    if q_positions is None:
        q_positions = kvlen_arr - 1
    qpos_arr = jnp.broadcast_to(
        jnp.asarray(q_positions, jnp.int32).reshape(-1), (b,)
    )
    if slopes is None:
        slopes_arr = jnp.zeros((h,), dtype=jnp.float32)
    else:
        slopes_arr = jnp.abs(slopes).astype(jnp.float32).reshape(h)

    if all_heads and not paged:
        # keep the double-buffered k+v blocks (+ scales) within ~8 MB VMEM
        itemsize = k_cache.dtype.itemsize
        while hkv * block_k * d * itemsize * 2 * 2 > 8 * 1024 * 1024 and block_k > 128:
            block_k //= 2
    num_k_blocks = pl.cdiv(sk, block_k)

    # Past-the-end grid cells clamp to the row's last live block: a revisit
    # of the previous cell's index skips the DMA entirely, so HBM traffic
    # scales with kv_len, not the padded cache.
    if all_heads:
        kernel = functools.partial(
            _decode_kernel_all_heads,
            block_k=block_k,
            num_k_blocks=num_k_blocks,
            hkv=hkv,
            group=group,
            sq=sq,
            scale=1.0 / math.sqrt(d),
            quant=quant,
            sk=sk,
        )

        if paged:

            def kv_index(bi, kb, kvlen, qpos, slope, table):
                last = jnp.maximum(pl.cdiv(kvlen[bi], block_k), 1) - 1
                return (table[bi, jnp.minimum(kb, last)], 0, 0, 0)

            def sc_index(bi, kb, kvlen, qpos, slope, table):
                last = jnp.maximum(pl.cdiv(kvlen[bi], block_k), 1) - 1
                return (table[bi, jnp.minimum(kb, last)], 0, 0, 0)

            kv_block = (1, hkv, block_k, d)
            scale_block = (1, hkv, 1, block_k)
        else:

            def kv_index(bi, kb, kvlen, qpos, slope, table):
                last = jnp.maximum(pl.cdiv(kvlen[bi], block_k), 1) - 1
                return (bi, 0, jnp.minimum(kb, last), 0)

            def sc_index(bi, kb, kvlen, qpos, slope, table):
                last = jnp.maximum(pl.cdiv(kvlen[bi], block_k), 1) - 1
                return (bi, 0, 0, jnp.minimum(kb, last))

            kv_block = (1, hkv, block_k, d)
            scale_block = (1, hkv, 1, block_k)

        grid = (b, num_k_blocks)
        q_spec = pl.BlockSpec(
            (1, h, sq, d),
            lambda bi, kb, *_: (bi, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        kv_spec = pl.BlockSpec(kv_block, kv_index, memory_space=pltpu.VMEM)
        scale_spec = pl.BlockSpec(
            scale_block, sc_index, memory_space=pltpu.VMEM
        )
        out_spec = pl.BlockSpec(
            (1, h, sq, d),
            lambda bi, kb, *_: (bi, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        scratch_rows = hkv * group * sq
    else:
        kernel = functools.partial(
            _decode_kernel,
            block_k=block_k,
            num_k_blocks=num_k_blocks,
            group=group,
            sq=sq,
            scale=1.0 / math.sqrt(d),
            quant=quant,
            sk=sk,
        )

        def kv_index(bi, hi, kb, kvlen, qpos, slope, table):
            last = jnp.maximum(pl.cdiv(kvlen[bi], block_k), 1) - 1
            return (bi, hi, jnp.minimum(kb, last), 0)

        def sc_index(bi, hi, kb, kvlen, qpos, slope, table):
            last = jnp.maximum(pl.cdiv(kvlen[bi], block_k), 1) - 1
            return (bi, hi, 0, jnp.minimum(kb, last))

        grid = (b, hkv, num_k_blocks)
        q_spec = pl.BlockSpec(
            (1, group, sq, d),
            lambda bi, hi, kb, *_: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM,
        )
        kv_spec = pl.BlockSpec(
            (1, 1, block_k, d), kv_index, memory_space=pltpu.VMEM
        )
        scale_spec = pl.BlockSpec(
            (1, 1, 1, block_k), sc_index, memory_space=pltpu.VMEM
        )
        out_spec = pl.BlockSpec(
            (1, group, sq, d),
            lambda bi, hi, kb, *_: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM,
        )
        scratch_rows = group * sq

    in_specs = [q_spec, kv_spec, kv_spec]
    args = [q, k_cache, v_cache]
    if quant:
        # scales ride as [B, Hkv, 1, S]: the blocked trailing dims are then
        # (1|Hkv..., block_k) — legal under Mosaic's last-two-dims rule AND
        # already lane-aligned for the [rows, block_k] logits multiply
        in_specs += [scale_spec, scale_spec]
        args += [
            k_scale.astype(jnp.float32)[:, :, None, :],
            v_scale.astype(jnp.float32)[:, :, None, :],
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((scratch_rows, d), jnp.float32),
            pltpu.VMEM((scratch_rows, 128), jnp.float32),
            pltpu.VMEM((scratch_rows, 128), jnp.float32),
        ],
    )
    kv_bytes = k_cache.dtype.itemsize
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sk * d,
            bytes_accessed=2 * b * hkv * sk * d * kv_bytes,
            transcendentals=b * h * sk,
        ),
        interpret=interpret,
    )(kvlen_arr, qpos_arr, slopes_arr, table_arr, *args)


def decode_attention(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    *,
    kv_lengths: jnp.ndarray,
    q_positions: Optional[jnp.ndarray] = None,
    k_scale: Optional[jnp.ndarray] = None,
    v_scale: Optional[jnp.ndarray] = None,
    slopes: Optional[jnp.ndarray] = None,
    use_pallas: bool = True,
    block_k: int = 512,
    all_heads: bool = True,
    interpret: bool = False,
    block_tables: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Dispatching decode-attention entry point: the Pallas flash-decode
    kernel on TPU (small Sq, 128-aligned head_dim), XLA elsewhere. With
    `block_tables`, caches are block pools (see flash_decode_attention);
    the XLA fallback gathers each row's live blocks into a dense view
    first (correctness path for CPU tests / large Sq)."""
    b, h, sq, d = q.shape
    on_tpu = jax.default_backend() == "tpu"
    if use_pallas and (on_tpu or interpret) and sq <= 32 and d % 128 == 0:
        return flash_decode_attention(
            q,
            k_cache,
            v_cache,
            kv_lengths=kv_lengths,
            q_positions=q_positions,
            k_scale=k_scale,
            v_scale=v_scale,
            slopes=slopes,
            block_k=block_k,
            all_heads=all_heads,
            interpret=interpret,
            block_tables=block_tables,
        )
    if block_tables is not None:
        # dense view: [B, max_blocks] x [N, Hkv, bk, D] -> [B, Hkv, S, D]
        bk = k_cache.shape[2]
        max_blocks = block_tables.shape[1]

        def dense(pool):  # [N, Hkv, bk(,D)] -> [B, Hkv, max_blocks*bk(,D)]
            g = jnp.take(pool, block_tables.reshape(-1), axis=0)
            g = g.reshape((b, max_blocks) + pool.shape[1:])
            g = jnp.moveaxis(g, 1, 2)  # [B, Hkv, max_blocks, bk(, D)]
            return g.reshape(
                (b, pool.shape[1], max_blocks * bk) + pool.shape[3:]
            )

        k_cache, v_cache = dense(k_cache), dense(v_cache)
        if k_scale is not None:
            k_scale, v_scale = dense(k_scale), dense(v_scale)
    return xla_attention(
        q,
        k_cache,
        v_cache,
        causal=True,
        kv_lengths=kv_lengths,
        slopes=slopes,
        q_offset=0 if q_positions is None else q_positions,
        k_scale=k_scale,
        v_scale=v_scale,
    )
