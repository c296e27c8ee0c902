"""Mixture-of-Experts FFN with expert parallelism (EP).

The reference has no MoE models (SURVEY.md §2.8 lists EP as absent from
its parallelism inventory), so this is a beyond-reference capability —
included because EP is the one parallelism axis the rest of the stack
(DP/FSDP/TP/SP/PP) did not yet exercise.

TPU-first design — the canonical GShard/Switch dense-dispatch pattern
rather than a scatter/gather translation:

  * top-k routing with a STATIC expert capacity C per sequence row, so
    every shape is known at trace time (no data-dependent shapes under
    jit);
  * dispatch/combine are one-hot tensors [B, S, E, C] contracted with
    einsums — the token permutation becomes MXU work, and when the
    expert dimension E is sharded over the "expert" mesh axis, GSPMD
    lowers the [E, B, C, h] dispatch einsum into the all-to-all over
    ICI (the NCCL-free EP collective);
  * expert weights stack [L, E, h, i] so the per-layer scan slices them
    exactly like the dense MLP weights; PartitionSpec
    P(None, "expert", "fsdp", "tensor") gives EP × FSDP × TP composition
    for free (llark_tpu/parallel/mesh.py:_layer_specs);
  * the Switch-transformer load-balancing auxiliary loss is returned to
    the train step, which adds cfg.moe_aux_loss_weight × aux to the LM
    loss.

Routing semantics (cfg.moe_routing):
  * "switch" (default): top-k over the fp32 softmax of router logits,
    gates are the RAW softmax probabilities (Switch/GShard convention —
    no top-k renormalization), tokens beyond an expert's capacity are
    dropped (their MLP contribution is 0; the residual stream still
    carries x).
  * "mixtral": the selected top-k gates are renormalized to sum to 1
    per token and capacity must be set high enough that no token drops
    (HF MixtralSparseMoeBlock semantics — interop/hf.py selects this
    mode and moe_capacity_factor = E/K when importing a Mixtral
    checkpoint, so C = S and nothing is ever dropped).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from llark_tpu.config import ModelConfig

Params = Dict[str, Any]


def expert_capacity(seq_len: int, cfg: ModelConfig) -> int:
    """Static per-row expert capacity: ceil(S·K·cf / E), clamped to
    [1, S]. (At real sequence lengths C lands on large values; no lane
    padding is applied so capacity-factor semantics stay exact.)"""
    e, k = cfg.moe_num_experts, cfg.moe_top_k
    c = math.ceil(seq_len * k * cfg.moe_capacity_factor / e)
    return max(1, min(seq_len, c))


def init_moe_layer_params(
    cfg: ModelConfig, keys, dense_fn
) -> Params:
    """Stacked [L, ...] MoE params. `dense_fn(key, shape, fan_in)` is the
    decoder's init-scheme-aware initializer (models/decoder.py)."""
    h, i, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    e = cfg.moe_num_experts
    p: Params = {
        "moe_router": dense_fn(keys[0], (L, h, e), h),
        "moe_w_up": dense_fn(keys[1], (L, e, h, i), h),
        "moe_w_down": dense_fn(keys[2], (L, e, i, h), i),
    }
    if cfg.mlp_activation == "silu":
        p["moe_w_gate"] = dense_fn(keys[3], (L, e, h, i), h)
    return p


def moe_ffn(
    cfg: ModelConfig, lp: Params, y: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MoE feed-forward on the normed hidden states.

    y: [B, S, h] (compute dtype). Returns (out [B, S, h], metrics) where
    metrics = {"aux_loss": Switch load-balancing loss (fp32 scalar),
    "dropped_frac": fraction of (token, expert-choice) assignments dropped
    past capacity (fp32 scalar)} — both surfaced per step through the
    train-step metrics for observability (train/tracking.py).

    Each sequence row is its own GShard "group": capacity is per row, so
    the dispatch tensors shard over the batch axes and the expert einsums
    shard over the expert axis.
    """
    dtype = y.dtype
    b, s, h = y.shape
    e, k = cfg.moe_num_experts, cfg.moe_top_k
    c = expert_capacity(s, cfg)

    logits = jnp.einsum(
        "bsh,he->bse",
        y.astype(jnp.float32),
        lp["moe_router"].astype(jnp.float32),
    )
    probs = jax.nn.softmax(logits, axis=-1)  # [B,S,E] fp32

    masked = probs
    counts = jnp.zeros((b, 1, e), jnp.float32)  # slots already used per expert
    dispatch = jnp.zeros((b, s, e, c), jnp.float32)
    combine = jnp.zeros((b, s, e, c), jnp.float32)
    gate_sum = jnp.zeros((b, s), jnp.float32)  # Σ selected gates (mixtral renorm)
    top1 = None
    for kk in range(k):
        idx = jnp.argmax(masked, axis=-1)  # [B,S]
        oh = jax.nn.one_hot(idx, e, dtype=jnp.float32)  # [B,S,E]
        gate = jnp.sum(probs * oh, axis=-1)  # [B,S] raw softmax prob
        masked = masked * (1.0 - oh)
        # slot index for this token within its chosen expert: earlier
        # tokens in this round + all slots used by earlier rounds
        pos = jnp.cumsum(oh, axis=1) - oh + counts  # [B,S,E]
        counts = counts + jnp.sum(oh, axis=1, keepdims=True)
        pos_tok = jnp.sum(pos * oh, axis=-1)  # [B,S]
        keep = (pos_tok < c).astype(jnp.float32)  # capacity drop
        slot = jax.nn.one_hot(pos_tok.astype(jnp.int32), c, dtype=jnp.float32)
        upd = oh[..., None] * slot[..., None, :] * keep[..., None, None]
        dispatch = dispatch + upd
        combine = combine + gate[..., None, None] * upd
        gate_sum = gate_sum + gate
        if kk == 0:
            top1 = oh

    if cfg.moe_routing == "mixtral":
        # renormalize the selected gates to sum to 1 per token: combine is
        # linear in the raw gates, so one divide after the loop is exact
        combine = combine / jnp.maximum(gate_sum, 1e-9)[..., None, None]

    # Switch load-balancing loss: E · Σ_e f_e·p_e per row, meaned over rows
    f = jnp.mean(top1, axis=1)  # [B,E] top-1 token fraction
    p = jnp.mean(probs, axis=1)  # [B,E] mean router prob
    aux = e * jnp.mean(jnp.sum(f * p, axis=-1))
    # dropped-token fraction: each of the B·S·K (token, choice) pairs
    # contributes one dispatch entry iff it landed inside capacity
    dropped = 1.0 - jnp.sum(dispatch) / (b * s * k)
    metrics = {"aux_loss": aux, "dropped_frac": dropped}

    # dispatch → expert-major [E,B,C,h]: with E sharded over "expert" this
    # einsum IS the all-to-all
    ein = jnp.einsum("bsec,bsh->ebch", dispatch.astype(dtype), y)
    eout = expert_mlp(cfg, lp, ein, dtype)
    out = jnp.einsum("bsec,ebch->bsh", combine.astype(dtype), eout)
    return out, metrics


def _expert_dense(x: jnp.ndarray, w: Any, dtype) -> jnp.ndarray:
    """x [E, B, C, in] @ w [E, in, out] -> [E, B, C, out], where w may be
    a raw array or a quantized dict (models/quant.py). For int8 the
    per-output-channel scale commutes out of the contraction exactly as in
    quantized_dense; int4 is a storage format and dequantizes first."""
    from llark_tpu.models.quant import (
        dequantize_weight_int4,
        dequantize_weight_int4_cols,
        is_quantized,
        is_quantized_int4,
    )

    if is_quantized_int4(w):
        w = (dequantize_weight_int4_cols(w, dtype) if "q4c" in w
             else dequantize_weight_int4(w, dtype))
    if is_quantized(w):
        yq = jnp.einsum(
            "ebch,ehi->ebci", x, w["q"].astype(dtype),
            preferred_element_type=jnp.float32,
        )
        scale = w["scale"]  # [E, 1, out]
        return (yq * scale[:, None, :, :].astype(jnp.float32)).astype(dtype)
    return jnp.einsum("ebch,ehi->ebci", x, w.astype(dtype))


def expert_mlp(cfg: ModelConfig, lp: Params, ein: jnp.ndarray, dtype) -> jnp.ndarray:
    """The per-expert FFN on dispatched tokens ein [E, B, C, h]."""
    if "moe_w_gate" in lp and lp["moe_w_gate"] is not None:
        g = _expert_dense(ein, lp["moe_w_gate"], dtype)
        u = _expert_dense(ein, lp["moe_w_up"], dtype)
        z = jax.nn.silu(g.astype(jnp.float32)).astype(dtype) * u
    else:
        u = _expert_dense(ein, lp["moe_w_up"], dtype)
        z = jax.nn.gelu(u.astype(jnp.float32), approximate=True).astype(dtype)
    return _expert_dense(z, lp["moe_w_down"], dtype)
