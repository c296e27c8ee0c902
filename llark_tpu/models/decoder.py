"""Unified functional decoder: Llama-2 (RoPE/RMSNorm/SwiGLU/GQA) and
MPT (ALiBi/LayerNorm/GELU/tied-embeddings) variants from one config.

TPU-first design notes (vs. reference m2t/models/llamav2.py + vendored
m2t/llava/model/mpt/modeling_mpt.py):
  * layer parameters are stacked [L, ...] and iterated with lax.scan —
    one compiled layer body, O(1) compile time in depth;
  * per-layer rematerialization via jax.checkpoint (reference used HF
    gradient_checkpointing, modeling_mpt.py:304-312);
  * KV cache is a static-shape pytree updated with dynamic_update_slice —
    no Python control flow under jit;
  * attention dispatches to the Pallas flash kernel on TPU
    (llark_tpu/ops/attention.py).

Params live in `param_dtype` (fp32 by default) and are cast to the compute
dtype (bf16) at use; norms and softmax accumulate in fp32.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from llark_tpu.config import ModelConfig
from llark_tpu.ops.attention import alibi_slopes, multihead_attention, xla_attention

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)).astype(x.dtype)


def layer_norm(
    x: jnp.ndarray, scale: jnp.ndarray, bias: Optional[jnp.ndarray], eps: float
) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _norm(cfg: ModelConfig, x, scale, bias):
    if cfg.norm_type == "rmsnorm":
        return rms_norm(x, scale, cfg.rms_norm_eps)
    return layer_norm(x, scale, bias, cfg.rms_norm_eps)


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------


def rope_freqs(head_dim: int, theta: float) -> jnp.ndarray:
    return 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))


def apply_rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """x: [B, H, S, D]; positions: [B, S] or [S]. Rotate-half convention
    (matches HF Llama so imported weights are compatible)."""
    d = x.shape[-1]
    freqs = rope_freqs(d, theta)  # [D/2]
    if positions.ndim == 1:
        positions = positions[None, :]
    angles = positions[..., None].astype(jnp.float32) * freqs  # [B, S, D/2]
    cos = jnp.cos(angles)[:, None, :, :]  # [B, 1, S, D/2]
    sin = jnp.sin(angles)[:, None, :, :]
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    out = jnp.concatenate([xf1 * cos - xf2 * sin, xf2 * cos + xf1 * sin], axis=-1)
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_decoder_params(cfg: ModelConfig, key: jax.Array) -> Params:
    """Initialize a parameter pytree. Layer weights are stacked on axis 0.

    Init-scheme registry (reference: m2t/llava/model/mpt/param_init_fns.py
    MODEL_INIT_REGISTRY): cfg.init_scheme selects how dense weights draw —
      kaiming  (default): N(0, 1/fan_in)
      xavier:  N(0, 2/(fan_in + fan_out))
      small:   N(0, (2/(5*fan_in)))  (per Nguyen & Salazar 2019, MPT's
               'small_init' used by llm-foundry configs)
    Pretrained imports overwrite these values, so the scheme matters only
    for training from scratch."""
    pdt = jnp.dtype(cfg.param_dtype)
    h, i, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    keys = jax.random.split(key, 16)
    scheme = getattr(cfg, "init_scheme", "kaiming")

    def _std(fan_in, fan_out):
        if scheme == "xavier":
            return math.sqrt(2.0 / (fan_in + fan_out))
        if scheme == "small":
            return math.sqrt(2.0 / (5.0 * fan_in))
        return 1.0 / math.sqrt(fan_in)  # kaiming

    def dense(k, shape, fan_in):
        fan_out = shape[-1]
        return (jax.random.normal(k, shape, jnp.float32) * _std(fan_in, fan_out)).astype(pdt)

    layers: Params = {
        "attn_norm_scale": jnp.ones((L, h), pdt),
        "mlp_norm_scale": jnp.ones((L, h), pdt),
        "wq": dense(keys[0], (L, h, nh * hd), h),
        "wk": dense(keys[1], (L, h, nkv * hd), h),
        "wv": dense(keys[2], (L, h, nkv * hd), h),
        "wo": dense(keys[3], (L, nh * hd, h), nh * hd),
    }
    if cfg.moe_num_experts > 0:
        from llark_tpu.models.moe import init_moe_layer_params

        layers.update(init_moe_layer_params(cfg, keys[9:13], dense))
    else:
        layers["w_up"] = dense(keys[4], (L, h, i), h)
        layers["w_down"] = dense(keys[5], (L, i, h), i)
        if cfg.mlp_activation == "silu":
            layers["w_gate"] = dense(keys[6], (L, h, i), h)
    if cfg.norm_type == "layernorm":
        layers["attn_norm_bias"] = jnp.zeros((L, h), pdt)
        layers["mlp_norm_bias"] = jnp.zeros((L, h), pdt)
    if cfg.use_bias:
        layers["bq"] = jnp.zeros((L, nh * hd), pdt)
        layers["bk"] = jnp.zeros((L, nkv * hd), pdt)
        layers["bv"] = jnp.zeros((L, nkv * hd), pdt)
        layers["bo"] = jnp.zeros((L, h), pdt)
        if cfg.moe_num_experts == 0:
            layers["b_up"] = jnp.zeros((L, i), pdt)
            layers["b_down"] = jnp.zeros((L, h), pdt)
            if cfg.mlp_activation == "silu":
                layers["b_gate"] = jnp.zeros((L, i), pdt)

    params: Params = {
        "embed": (jax.random.normal(keys[7], (cfg.vocab_size, h), jnp.float32) * 0.02).astype(pdt),
        "layers": layers,
        "final_norm_scale": jnp.ones((h,), pdt),
    }
    if cfg.norm_type == "layernorm":
        params["final_norm_bias"] = jnp.zeros((h,), pdt)
    if not cfg.tie_embeddings:
        params["lm_head"] = dense(keys[8], (h, cfg.vocab_size), h)
    return params


def init_kv_cache(
    cfg: ModelConfig, batch_size: int, max_len: int, dtype=None
) -> Params:
    shape = (cfg.num_layers, batch_size, cfg.num_kv_heads, max_len, cfg.head_dim)
    if cfg.kv_cache_quant:
        # int8 cache + per-(layer, row, head, position) dequant scales
        sshape = shape[:-1]
        return {
            "k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "k_scale": jnp.zeros(sshape, jnp.float32),
            "v_scale": jnp.zeros(sshape, jnp.float32),
            "index": jnp.zeros((), jnp.int32),
        }
    dtype = dtype or jnp.dtype(cfg.dtype)
    return {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
        "index": jnp.zeros((), jnp.int32),
    }


def init_paged_kv_cache(
    cfg: ModelConfig,
    batch_size: int,
    num_blocks: int,
    block_size: int,
    max_blocks_per_row: int,
    dtype=None,
) -> Params:
    """Block-POOL KV cache: physical blocks shared by all rows, one
    logical->physical block table per row (vLLM-style paging, TPU-shaped:
    the indirection lives in scalar-prefetch index_maps, ops/
    decode_attention.py). HBM cost is num_blocks * block_size tokens
    instead of batch * max_len — the serving win is packing MORE live
    rows into the same pool, amortizing the per-step weight read.

    Physical blocks 0..batch_size-1 are per-slot PARKING blocks: every
    table entry starts there, so clamped/parked writes of row b land in
    b's own block — writes stay unique across rows (scatter uses
    unique_indices) and reads of unallocated entries dedupe into one
    fetch. Allocate real blocks from batch_size upward.
    """
    shape = (
        cfg.num_layers, num_blocks, cfg.num_kv_heads, block_size, cfg.head_dim
    )
    tables = jnp.broadcast_to(
        jnp.arange(batch_size, dtype=jnp.int32)[:, None],
        (batch_size, max_blocks_per_row),
    )
    out = {
        "block_tables": tables,
        "index": jnp.zeros((), jnp.int32),
    }
    if cfg.kv_cache_quant:
        out.update(
            k=jnp.zeros(shape, jnp.int8),
            v=jnp.zeros(shape, jnp.int8),
            k_scale=jnp.zeros(shape[:-1], jnp.float32),
            v_scale=jnp.zeros(shape[:-1], jnp.float32),
        )
    else:
        dtype = dtype or jnp.dtype(cfg.dtype)
        out.update(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))
    return out


def _quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, H, S, D] -> (int8 values, f32 per-(B,H,S) scales)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)  # [B, H, S]
    sc = amax / 127.0
    q = jnp.round(xf / jnp.maximum(sc, 1e-8)[..., None]).astype(jnp.int8)
    return q, sc


# ---------------------------------------------------------------------------
# Layer body
# ---------------------------------------------------------------------------


def _dense(x, w, b, dtype):
    if isinstance(w, dict):  # int8/int4 weight-only (llark_tpu/models/quant.py)
        if "q4" in w or "q4c" in w:
            from llark_tpu.models.quant import quantized_dense_int4

            return quantized_dense_int4(x, w, b, dtype)
        from llark_tpu.models.quant import quantized_dense

        return quantized_dense(x, w, b, dtype)
    y = jnp.einsum("bsh,hd->bsd", x, w.astype(dtype), preferred_element_type=jnp.float32)
    y = y.astype(dtype)
    if b is not None:
        y = y + b.astype(dtype)
    return y


# deterministic per-target salt for LoRA-dropout key derivation
_LORA_TARGET_SALT = {
    "wq": 0, "wk": 1, "wv": 2, "wo": 3, "w_gate": 4, "w_up": 5, "w_down": 6,
}


def _lora_dense(cfg: ModelConfig, lp: Params, name: str, x, dtype, dropout_rng):
    """Base dense + optional low-rank delta: y = xW + scale * (drop(x) A) B.
    LoRA factors ride in the layer tree as `{name}_lora_a/b` (stacked [L,...],
    sliced by the decoder scan); absent keys mean a plain dense."""
    y = _dense(x, lp[name], lp.get("b" + name[1:]), dtype)  # wq->bq, w_up->b_up
    a = lp.get(f"{name}_lora_a")
    if a is None:
        return y
    bmat = lp[f"{name}_lora_b"]
    scale = float(cfg.lora_alpha) / float(max(cfg.lora_rank, 1))
    xl = x
    if dropout_rng is not None and cfg.lora_dropout > 0.0:
        keep = 1.0 - cfg.lora_dropout
        key = jax.random.fold_in(dropout_rng, _LORA_TARGET_SALT[name])
        mask = jax.random.bernoulli(key, keep, x.shape)
        xl = jnp.where(mask, x / keep, 0.0).astype(x.dtype)
    z = jnp.einsum(
        "bsh,hr->bsr", xl, a.astype(dtype), preferred_element_type=jnp.float32
    ).astype(dtype)
    delta = jnp.einsum(
        "bsr,rd->bsd", z, bmat.astype(dtype), preferred_element_type=jnp.float32
    ).astype(dtype)
    return y + scale * delta


def _layer_forward(
    cfg: ModelConfig,
    lp: Params,
    x: jnp.ndarray,  # [B, S, H] compute dtype
    positions: jnp.ndarray,  # [B, S]
    kv_lengths: Optional[jnp.ndarray],
    slopes: Optional[jnp.ndarray],
    k_cache: Optional[jnp.ndarray],  # [B, nkv, S_max, hd]
    v_cache: Optional[jnp.ndarray],
    cache_index: Optional[jnp.ndarray],  # scalar (prefill)
    cache_positions: Optional[jnp.ndarray],  # [B] per-row write pos (decode)
    dropout_rng: Optional[jax.Array] = None,  # per-layer key (LoRA dropout)
    prefix_lengths: Optional[jnp.ndarray] = None,  # [B] prefix-LM boundary
    prefill_from_empty: bool = False,  # static: cache starts empty this call
    k_scale_cache: Optional[jnp.ndarray] = None,  # [B, Hkv, S_max] int8-KV scales
    v_scale_cache: Optional[jnp.ndarray] = None,
    block_tables: Optional[jnp.ndarray] = None,  # [B, max_blocks]: caches are
    # block POOLS [N, Hkv, block, D] (init_paged_kv_cache)
    paged_chunk: bool = False,  # static: block-aligned multi-token prefill
    # chunk straight into pool blocks (caller contract: cache_positions and
    # s are both multiples of the block size)
) -> Tuple[jnp.ndarray, ...]:
    dtype = x.dtype
    b, s, h = x.shape
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    y = _norm(cfg, x, lp["attn_norm_scale"], lp.get("attn_norm_bias"))
    q = _lora_dense(cfg, lp, "wq", y, dtype, dropout_rng).reshape(b, s, nh, hd).transpose(0, 2, 1, 3)
    k = _lora_dense(cfg, lp, "wk", y, dtype, dropout_rng).reshape(b, s, nkv, hd).transpose(0, 2, 1, 3)
    v = _lora_dense(cfg, lp, "wv", y, dtype, dropout_rng).reshape(b, s, nkv, hd).transpose(0, 2, 1, 3)

    if not cfg.use_alibi:
        q = apply_rope(q, positions, cfg.rope_theta)
        k = apply_rope(k, positions, cfg.rope_theta)

    new_k_cache = new_v_cache = new_ks = new_vs = None
    if k_cache is not None:
        quant = k_scale_cache is not None
        if quant:
            k_store, k_sc = _quantize_kv(k)
            v_store, v_sc = _quantize_kv(v)
        else:
            k_store, v_store = k, v
        if block_tables is not None:
            if cache_positions is None:
                raise ValueError(
                    "paged caches support ragged decode writes and "
                    "block-aligned paged_chunk prefill (both keyed by "
                    "cache_positions); scalar-index prefill goes through "
                    "dense bucket caches + the server's block insert"
                )
            bk = k_cache.shape[2]
            kst = k_store.astype(k_cache.dtype)  # [B, Hkv, s, D]
            vst = v_store.astype(v_cache.dtype)
            new_k_cache, new_v_cache = k_cache, v_cache
            if quant:
                new_ks, new_vs = k_scale_cache, v_scale_cache
            zero = jnp.zeros((), jnp.int32)
            if paged_chunk:
                # prefill-chunk bulk write: positions and s are block-
                # aligned (server contract), so each row writes s//bk
                # WHOLE blocks — B*(s//bk) DUS of [1, Hkv, bk, D] instead
                # of the B*s per-token chain (which would not compile at
                # s=256)
                if s % bk:
                    raise ValueError(
                        f"paged_chunk requires the chunk ({s}) to be a "
                        f"multiple of the KV block size ({bk})"
                    )
                start_blk = cache_positions // bk  # [B]
                for bi in range(b):
                    for mi in range(s // bk):
                        blk_id = jnp.take(
                            block_tables[bi], start_blk[bi] + mi, mode="clip"
                        )
                        at = (blk_id, zero, zero, zero)
                        lo, hi = mi * bk, (mi + 1) * bk
                        new_k_cache = jax.lax.dynamic_update_slice(
                            new_k_cache, kst[bi : bi + 1, :, lo:hi], at
                        )
                        new_v_cache = jax.lax.dynamic_update_slice(
                            new_v_cache, vst[bi : bi + 1, :, lo:hi], at
                        )
                        if quant:
                            new_ks = jax.lax.dynamic_update_slice(
                                new_ks, k_sc[bi : bi + 1, :, lo:hi], at[:3]
                            )
                            new_vs = jax.lax.dynamic_update_slice(
                                new_vs, v_sc[bi : bi + 1, :, lo:hi], at[:3]
                            )
            else:
                # paged decode write: token t of row b lands at
                # pool[table[b, pos_t // bk], :, pos_t % bk]. Written as a
                # per-(row, token) dynamic-update-slice chain, NOT one
                # scatter: a scatter over (block, offset) prefers a
                # token-major operand layout (heads minor), and XLA then
                # relayout-COPIES the whole pool at program entry — 2.25 GB
                # per side for the 7B serving pool, which both OOMs the chip
                # and breaks donation aliasing. DUS has no layout preference,
                # so the pool keeps the default layout the Pallas decode
                # kernel consumes and every update applies in place. The
                # chain is B*s updates of [1, Hkv, 1, D] — decode has s=1 and
                # B <= slots, so it stays tiny.
                pos = cache_positions[:, None] + jnp.arange(s, dtype=jnp.int32)
                blk = jnp.take_along_axis(block_tables, pos // bk, axis=1)
                off = pos % bk  # [B, s]
                for bi in range(b):
                    for si in range(s):
                        at = (blk[bi, si], zero, off[bi, si], zero)
                        new_k_cache = jax.lax.dynamic_update_slice(
                            new_k_cache, kst[bi : bi + 1, :, si : si + 1], at
                        )
                        new_v_cache = jax.lax.dynamic_update_slice(
                            new_v_cache, vst[bi : bi + 1, :, si : si + 1], at
                        )
                        if quant:
                            new_ks = jax.lax.dynamic_update_slice(
                                new_ks, k_sc[bi : bi + 1, :, si : si + 1], at[:3]
                            )
                            new_vs = jax.lax.dynamic_update_slice(
                                new_vs, v_sc[bi : bi + 1, :, si : si + 1], at[:3]
                            )
            q_offset = cache_positions
            cache_kv_lengths = cache_positions + s
        elif cache_positions is not None:
            # ragged decode: each row writes at its own position
            def upd(c, x, pos):
                return jax.lax.dynamic_update_slice(c, x, (0, pos, 0))

            def upd_sc(c, x, pos):
                return jax.lax.dynamic_update_slice(c, x, (0, pos))

            new_k_cache = jax.vmap(upd)(k_cache, k_store.astype(k_cache.dtype), cache_positions)
            new_v_cache = jax.vmap(upd)(v_cache, v_store.astype(v_cache.dtype), cache_positions)
            if quant:
                new_ks = jax.vmap(upd_sc)(k_scale_cache, k_sc, cache_positions)
                new_vs = jax.vmap(upd_sc)(v_scale_cache, v_sc, cache_positions)
            q_offset = cache_positions
            cache_kv_lengths = cache_positions + s
        else:
            # prefill: static-shape insert at the shared scalar index
            new_k_cache = jax.lax.dynamic_update_slice(
                k_cache, k_store.astype(k_cache.dtype), (0, 0, cache_index, 0)
            )
            new_v_cache = jax.lax.dynamic_update_slice(
                v_cache, v_store.astype(v_cache.dtype), (0, 0, cache_index, 0)
            )
            if quant:
                new_ks = jax.lax.dynamic_update_slice(
                    k_scale_cache, k_sc, (0, 0, cache_index)
                )
                new_vs = jax.lax.dynamic_update_slice(
                    v_scale_cache, v_sc, (0, 0, cache_index)
                )
            q_offset = cache_index
            cache_kv_lengths = jnp.full((b,), cache_index + s, jnp.int32)
        if kv_lengths is not None:
            cache_kv_lengths = jnp.minimum(cache_kv_lengths, kv_lengths)
        att_k, att_v, att_ks, att_vs = new_k_cache, new_v_cache, new_ks, new_vs
        if paged_chunk:
            # chunk queries attend their row's whole admission span: gather
            # a dense per-row view from the pool (the tables passed for
            # admission are cropped to the span, so this reads exactly the
            # bucket-sized window the dense chunked path would read; the
            # view is a per-layer transient, not a persistent cache) and
            # fall through to the standard masked attention below.
            span = block_tables.shape[1]

            def _view(pool):
                g = jnp.take(pool, block_tables, axis=0,
                             mode="clip")  # [B, span, Hkv, bk(,D)]
                g = jnp.moveaxis(g, 1, 2)  # [B, Hkv, span, bk(,D)]
                return g.reshape(
                    (b, pool.shape[1], span * bk) + pool.shape[3:]
                )

            att_k, att_v = _view(new_k_cache), _view(new_v_cache)
            if quant:
                att_ks, att_vs = _view(new_ks), _view(new_vs)
        if prefill_from_empty:
            # The cache held nothing before this call, so attention only
            # needs the in-flight K/V — S x S on the (Pallas-capable) fast
            # path instead of S x max_cache_len over the padded cache.
            attn = multihead_attention(
                q,
                k,
                v,
                causal=True,
                kv_lengths=kv_lengths,
                slopes=slopes,
                use_pallas=cfg.use_pallas_attention,
                block_q=cfg.attention_block_q,
                block_k=cfg.attention_block_k,
            )
        elif block_tables is not None and not paged_chunk:
            # paged decode reads dispatch through decode_attention: the
            # Pallas kernel does the table indirection in its index_map on
            # TPU; elsewhere it gathers a dense per-row view first
            from llark_tpu.ops.decode_attention import decode_attention

            attn = decode_attention(
                q,
                new_k_cache,
                new_v_cache,
                kv_lengths=cache_kv_lengths,
                q_positions=cache_positions,
                k_scale=new_ks,
                v_scale=new_vs,
                slopes=slopes,
                use_pallas=cfg.use_flash_decode is not False,
                block_k=cfg.decode_block_k,
                block_tables=block_tables,
            )
        elif (cache_positions is not None and s <= 16
              and cfg.use_flash_decode is True and not paged_chunk):
            # short-query decode (single-token steps and speculative
            # verify windows): Pallas flash-decode streams only the live
            # cache blocks (ops/decode_attention.py); XLA elsewhere
            from llark_tpu.ops.decode_attention import decode_attention

            attn = decode_attention(
                q,
                att_k,
                att_v,
                kv_lengths=cache_kv_lengths,
                q_positions=cache_positions,
                k_scale=att_ks,
                v_scale=att_vs,
                slopes=slopes,
                block_k=cfg.decode_block_k,
            )
        else:
            attn = xla_attention(
                q,
                att_k,
                att_v,
                causal=True,
                kv_lengths=cache_kv_lengths,
                slopes=slopes,
                q_offset=q_offset,
                k_scale=att_ks,
                v_scale=att_vs,
            )
    else:
        attn = multihead_attention(
            q,
            k,
            v,
            causal=True,
            kv_lengths=kv_lengths,
            slopes=slopes,
            use_pallas=cfg.use_pallas_attention,
            block_q=cfg.attention_block_q,
            block_k=cfg.attention_block_k,
            prefix_lengths=prefix_lengths,
        )

    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, nh * hd)
    attn_out = _lora_dense(cfg, lp, "wo", attn, dtype, dropout_rng)
    x = x + attn_out

    y = _norm(cfg, x, lp["mlp_norm_scale"], lp.get("mlp_norm_bias"))
    moe_aux = jnp.float32(0.0)  # MoE: a {aux_loss, dropped_frac} dict
    if cfg.moe_num_experts > 0:
        from llark_tpu.models.moe import moe_ffn

        mlp_out, moe_aux = moe_ffn(cfg, lp, y)
    elif cfg.mlp_activation == "silu":
        gate = _lora_dense(cfg, lp, "w_gate", y, dtype, dropout_rng)
        up = _lora_dense(cfg, lp, "w_up", y, dtype, dropout_rng)
        z = jax.nn.silu(gate.astype(jnp.float32)).astype(dtype) * up
        mlp_out = _lora_dense(cfg, lp, "w_down", z, dtype, dropout_rng)
    else:
        up = _lora_dense(cfg, lp, "w_up", y, dtype, dropout_rng)
        z = jax.nn.gelu(up.astype(jnp.float32), approximate=True).astype(dtype)
        mlp_out = _lora_dense(cfg, lp, "w_down", z, dtype, dropout_rng)
    return x + mlp_out, new_k_cache, new_v_cache, new_ks, new_vs, moe_aux


# ---------------------------------------------------------------------------
# Full decoder forward
# ---------------------------------------------------------------------------


def decoder_forward(
    cfg: ModelConfig,
    params: Params,
    *,
    input_ids: Optional[jnp.ndarray] = None,  # [B, S]
    inputs_embeds: Optional[jnp.ndarray] = None,  # [B, S, H]
    seq_lengths: Optional[jnp.ndarray] = None,  # [B]
    positions: Optional[jnp.ndarray] = None,  # [B, S]
    kv_cache: Optional[Params] = None,
    cache_positions: Optional[jnp.ndarray] = None,  # [B] ragged decode writes
    return_hidden: bool = False,
    dropout_rng: Optional[jax.Array] = None,  # enables LoRA dropout (training)
    prefix_lengths: Optional[jnp.ndarray] = None,  # [B] prefix-LM boundaries
    prefill_from_empty: bool = False,  # static: this call fills an EMPTY cache
    trainable_token_start: Optional[int] = None,  # tied-LM-head freeze boundary
    paged_chunk: bool = False,  # static: block-aligned prefill chunk straight
    # into a paged pool (see _layer_forward; requires a paged kv_cache,
    # cache_positions % block == 0 and S % block == 0)
) -> Tuple[jnp.ndarray, Optional[Params]]:
    """Run the decoder. Returns (logits_or_hidden, updated_kv_cache|None).

    Training: pass input_ids/inputs_embeds + seq_lengths (right-padded mask).
    Prefill/decode: additionally pass kv_cache; positions default to
    cache_index + arange(S).
    """
    dtype = jnp.dtype(cfg.dtype)
    if inputs_embeds is None:
        inputs_embeds = embed_tokens(cfg, params, input_ids)
    x = inputs_embeds.astype(dtype)
    b, s, _ = x.shape

    cache_index = kv_cache["index"] if kv_cache is not None else None
    quant_cache = kv_cache is not None and "k_scale" in kv_cache
    # paged cache (init_paged_kv_cache): k/v (+scales) are block pools and
    # the per-row block tables ride in the cache dict (closure-captured —
    # they are layer-invariant, so they never enter the layer scan's xs)
    block_tables = kv_cache.get("block_tables") if kv_cache is not None else None
    if positions is None:
        pos = jnp.arange(s, dtype=jnp.int32)[None, :]
        if cache_positions is not None:
            pos = pos + cache_positions[:, None]
        elif cache_index is not None:
            pos = pos + cache_index
        positions = jnp.broadcast_to(pos, (b, s))

    slopes = alibi_slopes(cfg.num_heads) if cfg.use_alibi else None

    layer_rngs = (
        jax.random.split(dropout_rng, cfg.num_layers)
        if dropout_rng is not None and cfg.lora_dropout > 0.0
        else None
    )

    def body(carry, xs):
        xh = carry
        rng = None
        if layer_rngs is not None:
            xs, rng = xs[:-1], xs[-1]
            if len(xs) == 1:
                xs = xs[0]
        if kv_cache is not None:
            if quant_cache:
                lp, kc, vc, ks, vs = xs
            else:
                lp, kc, vc = xs
                ks = vs = None
            out, nk, nv, nks, nvs, _aux = _layer_forward(
                cfg, lp, xh, positions, seq_lengths, slopes, kc, vc,
                cache_index, cache_positions, rng,
                prefill_from_empty=prefill_from_empty,
                k_scale_cache=ks, v_scale_cache=vs,
                block_tables=block_tables,
                paged_chunk=paged_chunk,
            )
            return out, ((nk, nv, nks, nvs) if quant_cache else (nk, nv))
        lp = xs
        out, _, _, _, _, aux = _layer_forward(
            cfg, lp, xh, positions, seq_lengths, slopes, None, None, None, None,
            rng, prefix_lengths,
        )
        return out, aux

    if cfg.remat:
        policy = None
        if cfg.remat_policy == "dots":
            # keep every matmul output; recompute only the cheap tail
            # (norms, activations, residual adds) in the backward
            policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        elif cfg.remat_policy == "dots_narrow":
            # like "dots", but drop WIDE dot outputs (the 4h MLP hidden is
            # by far the largest saved buffer — [L,B,S,4h] OOM'd a 16 GB
            # chip at MPT-1B b4xs2048); the backward re-runs just that one
            # up-projection per layer (~4% extra FLOPs vs full remat's ~21%)
            wide = 3 * cfg.hidden_size

            def policy(prim, *avals, **params):
                if prim.name != "dot_general":
                    return False
                (_, rhs_c), (lhs_b, rhs_b) = params["dimension_numbers"]
                if lhs_b or rhs_b:
                    return False  # attention score/prob matrices
                rhs = avals[1].shape
                out_feat = 1
                for i, d in enumerate(rhs):
                    if i not in rhs_c:
                        out_feat *= d
                return out_feat < wide
        elif cfg.remat_policy != "full":
            raise ValueError(f"unknown remat_policy {cfg.remat_policy!r}")
        body = jax.checkpoint(body, prevent_cse=False, policy=policy)

    unroll = cfg.decode_unroll_layers
    if unroll is None and kv_cache is not None:
        # auto: unrolling trades the scan's whole-cache xs->ys copy for
        # ~0.1 ms/layer of fixed overhead, so it pays only when the
        # per-layer cache traffic is large (measured: 7B B8 int8 +15%,
        # 7B B4 int8 flat, MPT-1B B4 -31% -- see PERFORMANCE.md)
        kb = kv_cache["k"]
        cache_layer_bytes = 2 * int(np.prod(kb.shape[1:])) * kb.dtype.itemsize
        unroll = b >= 2 and cache_layer_bytes >= 48 * 1024 * 1024
    if kv_cache is not None and unroll and (s <= 16 or paged_chunk):
        # Unrolled decode: the layer scan threads the FULL cache through
        # xs->ys, which XLA may double-buffer (a whole-cache copy per
        # layer per token). Unrolling keeps the stacked cache in one
        # buffer updated by chained .at[l].set writes that XLA can apply
        # in place inside the token loop.
        Lk, Lv = kv_cache["k"], kv_cache["v"]
        Lks = kv_cache.get("k_scale")
        Lvs = kv_cache.get("v_scale")
        for l in range(cfg.num_layers):
            lp = jax.tree.map(lambda a: a[l], params["layers"])
            rng_l = layer_rngs[l] if layer_rngs is not None else None
            x, nk, nv, nks, nvs, _aux = _layer_forward(
                cfg, lp, x, positions, seq_lengths, slopes, Lk[l], Lv[l],
                cache_index, cache_positions, rng_l,
                prefill_from_empty=prefill_from_empty,
                k_scale_cache=None if Lks is None else Lks[l],
                v_scale_cache=None if Lvs is None else Lvs[l],
                block_tables=block_tables,
                paged_chunk=paged_chunk,
            )
            Lk = Lk.at[l].set(nk)
            Lv = Lv.at[l].set(nv)
            if quant_cache:
                Lks = Lks.at[l].set(nks)
                Lvs = Lvs.at[l].set(nvs)
        new_cache = {"k": Lk, "v": Lv, "index": kv_cache["index"] + s}
        if quant_cache:
            new_cache["k_scale"] = Lks
            new_cache["v_scale"] = Lvs
        if block_tables is not None:
            new_cache["block_tables"] = block_tables
        x = _norm(
            cfg, x, params["final_norm_scale"], params.get("final_norm_bias")
        )
        if return_hidden:
            return x, new_cache
        return compute_logits(cfg, params, x, trainable_token_start), new_cache

    if kv_cache is not None:
        xs = (params["layers"], kv_cache["k"], kv_cache["v"])
        if quant_cache:
            xs = xs + (kv_cache["k_scale"], kv_cache["v_scale"])
        if layer_rngs is not None:
            xs = xs + (layer_rngs,)
        if quant_cache:
            x, (new_k, new_v, new_ks, new_vs) = jax.lax.scan(body, x, xs)
            new_cache = {
                "k": new_k, "v": new_v, "k_scale": new_ks, "v_scale": new_vs,
                "index": kv_cache["index"] + s,
            }
        else:
            x, (new_k, new_v) = jax.lax.scan(body, x, xs)
            new_cache = {"k": new_k, "v": new_v, "index": kv_cache["index"] + s}
        if block_tables is not None:
            new_cache["block_tables"] = block_tables
    else:
        xs = params["layers"] if layer_rngs is None else (params["layers"], layer_rngs)
        x, aux = jax.lax.scan(body, x, xs)
        # MoE: surface the summed load-balancing loss + mean dropped-token
        # fraction to the train step via the (otherwise-None) cache slot —
        # callers that ignore it are unaffected; make_train_step adds
        # moe_aux_loss_weight × the loss and logs both as step metrics.
        new_cache = (
            {
                "moe_aux_loss": jnp.sum(aux["aux_loss"]),
                "moe_dropped_frac": jnp.mean(aux["dropped_frac"]),
            }
            if cfg.moe_num_experts > 0
            else None
        )

    x = _norm(
        cfg, x, params["final_norm_scale"], params.get("final_norm_bias")
    )
    if return_hidden:
        return x, new_cache

    logits = compute_logits(cfg, params, x, trainable_token_start)
    return logits, new_cache


def embed_tokens(cfg: ModelConfig, params: Params, input_ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(params["embed"], input_ids, axis=0).astype(jnp.dtype(cfg.dtype))


def compute_logits(
    cfg: ModelConfig,
    params: Params,
    hidden: jnp.ndarray,
    trainable_token_start: Optional[int] = None,
) -> jnp.ndarray:
    """LM head; tied to the embedding for MPT (reference: m2t/models/mpt.py:312).

    With tied embeddings the LM head IS the embedding table, so the
    adapter-stage freeze (`trainable_token_start`: only appended audio-token
    rows train) must also stop gradients here — the input-side detach in
    build_inputs_embeds alone would let head gradients drift every
    original-vocab row."""
    dtype = hidden.dtype
    if cfg.tie_embeddings:
        w = params["embed"]  # [V, H]
        if trainable_token_start is not None:
            w = jnp.concatenate(
                [jax.lax.stop_gradient(w[:trainable_token_start]),
                 w[trainable_token_start:]],
                axis=0,
            )
        w = w.astype(dtype)
        return jnp.einsum("bsh,vh->bsv", hidden, w, preferred_element_type=jnp.float32)
    w = params["lm_head"]  # [H, V]
    if isinstance(w, dict):
        if "q4c" in w:  # int4 cols layout: fused no-dequant-copy path
            from llark_tpu.models.quant import quantized_dense_int4

            return quantized_dense_int4(hidden, w, None, dtype).astype(jnp.float32)
        if "q4" in w:  # int4 rows layout
            from llark_tpu.models.quant import dequantize_weight_int4

            w4 = dequantize_weight_int4(w, dtype)
            return jnp.einsum(
                "bsh,hv->bsv", hidden, w4, preferred_element_type=jnp.float32
            )
        # int8 weight-only
        logits = jnp.einsum(
            "bsh,hv->bsv", hidden, w["q"].astype(dtype),
            preferred_element_type=jnp.float32,
        )
        return logits * w["scale"].reshape(-1).astype(jnp.float32)
    return jnp.einsum(
        "bsh,hv->bsv", hidden, w.astype(dtype), preferred_element_type=jnp.float32
    )
