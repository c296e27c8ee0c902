"""Paged KV-cache management for the continuous-batching server.

vLLM-style block paging, TPU-shaped: the caches are physical block POOLS
([L, N, Hkv, block, D], models/decoder.py init_paged_kv_cache) shared by
every slot, a host-side allocator hands logical->physical block lists to
requests, and the per-row tables ride to the device inside the cache
pytree where the flash-decode kernel consumes them as scalar-prefetch
index_map input (ops/decode_attention.py).

Why: the dense server provisions max_batch x max_cache_len of cache HBM
whether or not rows use it. Paging sizes HBM to the LIVE token budget,
so the same pool admits more concurrent slots — and each decode step's
weight read (the dominant HBM term for int8-7B decode) is amortized over
more rows. Reference role: beyond-reference; the reference serves batch=1
(scripts/inference/infer_from_webdataset.py:84-151).

The allocator is deliberately simple — allocation happens once per
admission (block count covers prompt + max_new + headroom, known up
front), freeing once per retirement; there is no copy-on-write or
swapping. Physical blocks 0..max_batch-1 are per-slot parking blocks
(never allocated): a slot's table resets there so parked/clamped writes
stay unique per row and unallocated reads dedupe to one fetch.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np


class BlockAllocator:
    """Host-side free-list over physical block ids.

    Ids [0, num_reserved) are parking blocks and never handed out."""

    def __init__(self, num_blocks: int, num_reserved: int):
        if num_blocks <= num_reserved:
            raise ValueError(
                f"pool of {num_blocks} blocks leaves nothing to allocate "
                f"after {num_reserved} reserved parking blocks"
            )
        self.num_blocks = num_blocks
        self.num_reserved = num_reserved
        self._free: List[int] = list(range(num_reserved, num_blocks))

    @property
    def free_blocks(self) -> int:
        return len(self._free)

    def alloc(self, n: int) -> Optional[List[int]]:
        """n physical blocks, or None if the pool can't serve it (the
        caller leaves the request queued until retirements free blocks)."""
        if n > len(self._free):
            return None
        out = self._free[:n]
        del self._free[:n]
        return out

    def free(self, ids: List[int]) -> None:
        self._free.extend(ids)


def make_block_insert_fn(block_size: int, n_blocks: int):
    """Jitted splice of one freshly-prefilled row into its allocated pool
    blocks — the paged counterpart of BatchedServer._insert_row.

    `row_cache` leaves are dense bucket caches [L, B, Hkv, bucket(,D)];
    `block_ids` is [n_blocks] physical ids covering the bucket span
    (positions past the prompt hold pad garbage — never read, since reads
    are bounded by each row's live kv length, and decode overwrites them
    in order). One jit per (bucket-blocks, block) shape.
    """

    def insert(paged_cache, row_cache, src_row, block_ids):
        def put(pool, rows):
            # pool [L, N, Hkv, bk(,D)]; rows [L, B, Hkv, S(,D)]
            if pool.ndim == 0 or rows.ndim < 4:
                return pool
            row = jax.lax.dynamic_slice_in_dim(rows, src_row, 1, axis=1)
            row = row[:, 0]  # [L, Hkv, S(,D)]
            pad = (-row.shape[2]) % block_size
            if pad:
                widths = [(0, 0), (0, 0), (0, pad)] + [(0, 0)] * (row.ndim - 3)
                row = jnp.pad(row, widths)
            for i in range(n_blocks):
                blk = jax.lax.dynamic_slice_in_dim(
                    row, i * block_size, block_size, axis=2
                )
                pool = jax.lax.dynamic_update_slice(
                    pool,
                    blk[:, None].astype(pool.dtype),  # [L,1,Hkv,bk(,D)]
                    (0, block_ids[i]) + (0,) * (pool.ndim - 2),
                )
            return pool

        out = dict(paged_cache)
        for key in ("k", "v", "k_scale", "v_scale"):
            if key in paged_cache and key in row_cache:
                out[key] = put(paged_cache[key], row_cache[key])
        return out

    return insert
