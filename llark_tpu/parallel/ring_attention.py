"""Ring attention: causal self-attention over a sequence sharded across
chips (sequence/context parallelism).

SURVEY.md §5 marks this as the stretch goal the reference lacks: LLark
mean-pools Jukebox activations to 10 Hz *because* 345 Hz frames (~8200
audio tokens per 25 s clip) exceed a single device's attention budget.
With ring attention the un-pooled sequence can be split over a mesh axis:
each chip holds S/n queries and one K/V block, blocks rotate around the
ring with `jax.lax.ppermute`, and partial results merge with the
flash-attention running-softmax (max / log-sum-exp) rule — O(S/n) memory
per chip, full-sequence exactness.

All communication is ICI ppermute; no gather of the full sequence ever
materializes.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG = -1e30


def _block_attend(
    q: jnp.ndarray,  # [B, H, Sq, D]
    k: jnp.ndarray,  # [B, H, Sk, D]
    v: jnp.ndarray,
    q_pos: jnp.ndarray,  # [Sq] global positions
    k_pos: jnp.ndarray,  # [Sk]
    causal: bool,
    kv_lengths: Optional[jnp.ndarray],  # [B] global valid length
    slopes: Optional[jnp.ndarray],  # [H]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One (query-block, kv-block) pair -> (numerator, row_max, row_sum)."""
    d = q.shape[-1]
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (1.0 / math.sqrt(d))
    if slopes is not None:
        rel = (k_pos[None, :] - q_pos[:, None]).astype(jnp.float32)
        logits = logits + slopes[None, :, None, None] * rel[None, None]
    mask = jnp.ones((q_pos.shape[0], k_pos.shape[0]), bool)
    if causal:
        mask = k_pos[None, :] <= q_pos[:, None]
    mask = jnp.broadcast_to(mask[None, None], logits.shape)
    if kv_lengths is not None:
        valid = k_pos[None, None, None, :] < kv_lengths[:, None, None, None]
        mask = mask & valid
    logits = jnp.where(mask, logits, NEG)
    row_max = jnp.max(logits, axis=-1)  # [B, H, Sq]
    p = jnp.exp(logits - row_max[..., None])
    p = jnp.where(mask, p, 0.0)
    row_sum = jnp.sum(p, axis=-1)
    num = jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return num, row_max, row_sum


def _ring_attention_local(
    q: jnp.ndarray,  # [B, H, S_local, D] this chip's queries
    k: jnp.ndarray,  # [B, H, S_local, D] this chip's K block
    v: jnp.ndarray,
    kv_lengths: Optional[jnp.ndarray],  # [B] (replicated, global)
    slopes: Optional[jnp.ndarray],
    axis_name: str,
    causal: bool,
) -> jnp.ndarray:
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    s_local = q.shape[2]
    q_pos = idx * s_local + jnp.arange(s_local, dtype=jnp.int32)

    acc = jnp.zeros(q.shape[:3] + (q.shape[3],), jnp.float32)  # numerator
    m = jnp.full(q.shape[:3], -jnp.inf, jnp.float32)  # running max
    l = jnp.zeros(q.shape[:3], jnp.float32)  # running sum

    k_blk, v_blk = k, v
    perm = [(i, (i + 1) % n) for i in range(n)]
    for step in range(n):  # static python loop: n is the mesh-axis size
        owner = (idx - step) % n  # whose block we currently hold
        k_pos = owner * s_local + jnp.arange(s_local, dtype=jnp.int32)
        num, bm, bs = _block_attend(
            q, k_blk, v_blk, q_pos, k_pos, causal, kv_lengths, slopes
        )
        new_m = jnp.maximum(m, bm)
        # guard -inf - -inf (fully-masked rows)
        scale_old = jnp.where(jnp.isfinite(m), jnp.exp(m - new_m), 0.0)
        scale_new = jnp.where(jnp.isfinite(bm), jnp.exp(bm - new_m), 0.0)
        acc = acc * scale_old[..., None] + num * scale_new[..., None]
        l = l * scale_old + bs * scale_new
        m = new_m
        if step < n - 1:
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)

    out = acc / jnp.maximum(l, 1e-20)[..., None]
    return out.astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,  # [B, H, S, D] (global shapes)
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "tensor",
    *,
    causal: bool = True,
    kv_lengths: Optional[jnp.ndarray] = None,
    slopes: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Exact attention with the sequence dim sharded over `axis`.

    q/k/v enter with global shapes; shard_map splits S across the axis and
    each chip computes its queries against all K/V blocks as they rotate
    around the ring. Equivalent to xla_attention(causal, kv_lengths,
    slopes) up to fp accumulation order.
    """
    n = mesh.shape[axis]
    if q.shape[2] % n:
        raise ValueError(f"sequence {q.shape[2]} must divide axis size {n}")

    qkv_spec = P(None, None, axis, None)
    len_spec = P() if kv_lengths is not None else None
    slope_spec = P() if slopes is not None else None

    fn = partial(
        _ring_attention_local, axis_name=axis, causal=causal
    )

    in_specs = [qkv_spec, qkv_spec, qkv_spec]
    args = [q, k, v]
    # optional args ride as empty arrays (shard_map signatures are static)
    in_specs += [len_spec or P(), slope_spec or P()]
    args += [
        kv_lengths if kv_lengths is not None else jnp.zeros((0,), jnp.int32),
        slopes if slopes is not None else jnp.zeros((0,), jnp.float32),
    ]

    def body(q_, k_, v_, kvl, sl):
        return fn(
            q_, k_, v_,
            kvl if kvl.shape[0] else None,
            sl if sl.shape[0] else None,
        )

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=qkv_spec,
        check_vma=False,
    )(*args)
