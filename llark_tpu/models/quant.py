"""Int8 weight-only quantization for serving.

Parity target: the reference's bitsandbytes 4/8-bit path
(m2t/arguments.py:112-133, m2t/train.py:82-99) — there it enables QLoRA
training; here the TPU-native win is the DECODE hot loop, which is
HBM-bandwidth-bound: bf16 7B weights cap one v5e chip at ~58 tok/s, int8
halves the bytes per step.

Scheme: symmetric per-output-channel int8. For a weight W[in, out] with
scale s[out] = max|W[:, out]| / 127,

    y = (x @ W_q) * s        (exact rearrangement — the scale depends only
                              on the output channel, so it commutes out of
                              the contraction)

so the matmul consumes int8 weights directly (XLA fuses the int8->bf16
convert into the dot operand read) and the fp32 scale is a cheap
elementwise on the [B, S, out] result.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from llark_tpu.config import ModelConfig

Params = Dict[str, Any]

# weights worth quantizing: the large 2D projections; for MoE models the
# expert FFN stacks [L, E, in, out] are the bulk of the params and are
# quantized too (the router stays fp32 — tiny, and routing is fp32 math)
QUANT_TARGETS = (
    "wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
    "moe_w_gate", "moe_w_up", "moe_w_down",
)


def quantize_weight(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """[..., in, out] -> {'q': int8, 'scale': f32[..., 1, out]}."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # [..., 1, out]
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale}


def dequantize_weight(wq: Dict[str, jnp.ndarray], dtype=jnp.float32) -> jnp.ndarray:
    return (wq["q"].astype(jnp.float32) * wq["scale"]).astype(dtype)


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and "q" in w and "scale" in w


def quantize_params_int8(cfg: ModelConfig, params: Params) -> Params:
    """Quantize the decoder's large projections (and lm_head) to int8.
    Embeddings, norms, biases, the projector, and any LoRA factors stay in
    their original dtype."""
    out = dict(params)
    layers = dict(params["layers"])
    for name in QUANT_TARGETS:
        if name in layers and "_lora_" not in name:
            layers[name] = quantize_weight(layers[name])
    out["layers"] = layers
    if "lm_head" in params:
        out["lm_head"] = quantize_weight(params["lm_head"])
    return out


# ---------------------------------------------------------------------------
# int4 (group-wise, packed two nibbles per int8)
# ---------------------------------------------------------------------------


def quantize_weight_int4(w: jnp.ndarray, group: int = 128) -> Dict[str, jnp.ndarray]:
    """[..., in, out] -> {'q4': int8 [..., in/2, out] (two nibbles),
    'scale': f32 [..., in/group, out]} — symmetric group-wise int4
    (parity: the reference's bnb 4-bit, m2t/arguments.py:112-133).
    Group scales run along the contraction dim, so dequant happens inside
    a group-blocked matmul (quantized_dense_int4)."""
    *lead, fan_in, fan_out = w.shape
    if fan_in % group or fan_in % 2:
        raise ValueError(f"fan_in {fan_in} must divide group {group} and 2")
    wf = w.astype(jnp.float32).reshape(*lead, fan_in // group, group, fan_out)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # [..., G, 1, out]
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int8)
    q = q.reshape(*lead, fan_in, fan_out)
    # pair-packing: packed row r = original rows (2r, 2r+1) in (lo, hi)
    # nibbles — the layout the Pallas kernel expects (the activation splits
    # into even/odd columns outside, so the kernel needs no interleave)
    lo = q[..., 0::2, :] & 0x0F
    hi = jnp.left_shift(q[..., 1::2, :] & 0x0F, 4)
    packed = (lo | hi).astype(jnp.int8)
    return {"q4": packed, "scale": scale[..., 0, :]}  # scale [..., G, out]


def _unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """int8 [..., in/2, out] -> int8 [..., in, out], sign-extended nibbles
    (pair layout: packed row r -> original rows 2r, 2r+1)."""
    lo = packed & 0x0F
    hi = jnp.right_shift(packed, 4) & 0x0F
    lo = jnp.where(lo > 7, lo - 16, lo).astype(jnp.int8)
    hi = jnp.where(hi > 7, hi - 16, hi).astype(jnp.int8)
    *lead, half, out = packed.shape
    stacked = jnp.stack([lo, hi], axis=-2)  # [..., half, 2, out]
    return stacked.reshape(*lead, half * 2, out)


def dequantize_weight_int4(wq: Dict[str, jnp.ndarray], dtype=jnp.float32) -> jnp.ndarray:
    q = _unpack_int4(wq["q4"]).astype(dtype)  # compute dtype, not f32
    *lead, fan_in, out = q.shape
    g = wq["scale"].shape[-2]
    qg = q.reshape(*lead, g, fan_in // g, out)
    scaled = qg * wq["scale"][..., :, None, :].astype(dtype)
    return scaled.reshape(*lead, fan_in, out)


def is_quantized_int4(w) -> bool:
    return isinstance(w, dict) and ("q4" in w or "q4c" in w) and "scale" in w


def quantize_weight_int4_cols(w: jnp.ndarray, group: int = 128) -> Dict[str, jnp.ndarray]:
    """[..., in, out] -> {'q4c': int8 [..., in, out/2], 'scale': f32
    [..., in/group, out]} — same symmetric group-int4 numerics as
    quantize_weight_int4, but nibbles packed along the OUT (minor) axis:
    byte [h, d] = col 2d in the low nibble, col 2d+1 in the high nibble.
    This is exactly the layout `lax.bitcast_convert_type(int8 -> int4)`
    unpacks for free (a new minor axis, low nibble first), so the serving
    matmul can read s4 weights straight from HBM with no VPU unpack
    (quantized_dense_int4, XLA-native path)."""
    *lead, fan_in, fan_out = w.shape
    if fan_in % group or fan_out % 2:
        raise ValueError(f"fan_in {fan_in} must divide group {group}; fan_out even")
    wf = w.astype(jnp.float32).reshape(*lead, fan_in // group, group, fan_out)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int8)
    q = q.reshape(*lead, fan_in, fan_out)
    lo = q[..., :, 0::2] & 0x0F
    hi = jnp.left_shift(q[..., :, 1::2] & 0x0F, 4)
    return {"q4c": (lo | hi).astype(jnp.int8), "scale": scale[..., 0, :]}


def _unpack_int4_cols(q4c: jnp.ndarray) -> jnp.ndarray:
    """int8 [..., in, out/2] -> s4 [..., in, out] via bitcast (no VPU work)."""
    w4 = jax.lax.bitcast_convert_type(q4c, jnp.int4)  # [..., in, out/2, 2]
    return w4.reshape(*q4c.shape[:-1], q4c.shape[-1] * 2)


def dequantize_weight_int4_cols(wq: Dict[str, jnp.ndarray], dtype=jnp.float32) -> jnp.ndarray:
    q = _unpack_int4_cols(wq["q4c"]).astype(dtype)
    *lead, fan_in, out = q.shape
    g = wq["scale"].shape[-2]
    qg = q.reshape(*lead, g, fan_in // g, out)
    scaled = qg * wq["scale"][..., :, None, :].astype(dtype)
    return scaled.reshape(*lead, fan_in, out)


def _dense_int4_cols(x: jnp.ndarray, wq: Dict[str, jnp.ndarray], b, dtype):
    """y = x @ dequant(q4c) with the scale applied to the per-group PARTIAL
    SUMS, not the weights: y[m,d] = sum_g s[g,d] * (x_g @ w4_g)[m,d]. The
    weight-side work is a pure s4 read feeding the MXU; the only elementwise
    dequant cost is [G, M, D] on the output side (M=1 in decode)."""
    q4c, scale = wq["q4c"], wq["scale"]
    fan_in = q4c.shape[-2]
    n_groups = scale.shape[-2]
    group = fan_in // n_groups
    w4 = _unpack_int4_cols(q4c)  # [in, out] s4
    fan_out = w4.shape[-1]
    lead = x.shape[:-1]
    xg = x.reshape(-1, n_groups, group).astype(dtype)
    wg = w4.reshape(n_groups, group, fan_out)
    # batch over groups: [G, M, out]
    partial = jax.lax.dot_general(
        xg,
        wg.astype(dtype),
        dimension_numbers=(((2,), (1,)), ((1,), (0,))),
        preferred_element_type=jnp.float32,
    )
    y = jnp.einsum(
        "gmd,gd->md", partial, scale.astype(jnp.float32)
    ).astype(dtype)
    y = y.reshape(*lead, fan_out)
    if b is not None:
        y = y + b.astype(dtype)
    return y


def quantized_dense_int4(x: jnp.ndarray, wq: Dict[str, jnp.ndarray], b, dtype):
    """y = x @ dequant(q4) [+ b].

    STATUS (experimental): int4 storage/quantize/dequantize are correct and
    tested, but NO execution path is fast on TPU yet. Measured end-to-end
    7B decode on one v5e chip (int8 = 73.8 tok/s): rows layout + Pallas
    kernel (LLARK_TPU_INT4_KERNEL=1) = 35.9 tok/s — VPU-bound on the
    nibble unpack (~10 elementwise ops/byte); cols layout + native-s4
    bitcast dot = 9.2 tok/s — XLA materializes the dequantized weights
    instead of fusing the s4 convert into the dot operand read. int8
    (quantized_dense) is the recommended serving format; int4 remains a
    2x-smaller storage/checkpoint format. A Mosaic-level s4 operand load
    is the missing piece."""
    import os

    if "q4c" in wq:
        return _dense_int4_cols(x, wq, b, dtype)
    q4, scale = wq["q4"], wq["scale"]
    fan_in = q4.shape[-2] * 2
    group = fan_in // scale.shape[-2]
    use_kernel = (
        os.environ.get("LLARK_TPU_INT4_KERNEL")
        and jax.default_backend() == "tpu"
    )
    if (
        use_kernel
        and q4.ndim == 2
        and group >= 128
        and fan_in % 256 == 0
        and q4.shape[-1] % 128 == 0  # fan_out must tile (lm_head 32004 won't)
    ):
        from llark_tpu.ops.int4_matmul import int4_matmul

        lead = x.shape[:-1]
        xm = x.reshape(-1, fan_in)
        y = int4_matmul(xm, q4, scale.astype(jnp.float32), group=group)
        y = y.reshape(*lead, -1).astype(dtype)
    else:
        w = dequantize_weight_int4(wq, dtype)
        y = jnp.einsum(
            "bsh,hd->bsd", x, w, preferred_element_type=jnp.float32
        ).astype(dtype)
    if b is not None:
        y = y + b.astype(dtype)
    return y


def quantize_params_int4_incremental(
    cfg: ModelConfig, params: Params, group: int = 128, layout: str = "cols"
) -> Params:
    """int4 counterpart of quantize_params_int8_incremental (takes
    ownership of `params`). layout="cols" (default) packs nibbles along
    the out-axis for the XLA-native bitcast serving path
    (_dense_int4_cols); "rows" packs along the contraction axis for the
    Pallas kernel path."""
    def q_one(w):
        if layout == "cols":
            return quantize_weight_int4_cols(w, group)
        return quantize_weight_int4(w, group)

    def q_any(w):
        # stacked [L, ...] leaves (incl. [L, E, in, out] MoE experts):
        # serialize over layers so the f32 quantization intermediates are
        # 1/L-sized (a 7B stacked MLP leaf is 5.8 GB in f32 — quantizing
        # it in one shot OOMs a 16 GB chip)
        if w.ndim >= 3:
            return jax.lax.map(q_one, w)
        return q_one(w)

    qfn = jax.jit(q_any, donate_argnums=(0,))
    layers = params["layers"]
    for name in QUANT_TARGETS:
        if name in layers and "_lora_" not in name:
            w = layers.pop(name)
            layers[name] = qfn(w)
            del w
    if "lm_head" in params:
        w = params.pop("lm_head")
        if layout != "cols" and w.shape[-1] % 128:
            # rows layout + untileable fan_out (e.g. vocab 32004): the
            # Pallas kernel can't tile it — int8 keeps the head on the
            # fused no-dequant-copy path instead of materializing bf16
            params["lm_head"] = jax.jit(quantize_weight, donate_argnums=(0,))(w)
        else:
            params["lm_head"] = qfn(w)
        del w
    return params


def quantize_params_int8_incremental(cfg: ModelConfig, params: Params) -> Params:
    """Like quantize_params_int8, but one jitted program per weight and the
    bf16 source reference dropped as each leaf converts — peak device memory
    is params + one leaf, not 1.5x params (a 7B model in bf16 plus its int8
    copy exceeds one chip's HBM). TAKES OWNERSHIP: `params` is mutated and
    must not be used afterwards."""
    qfn = jax.jit(quantize_weight, donate_argnums=(0,))
    layers = params["layers"]  # mutate in place so old leaves free eagerly
    for name in QUANT_TARGETS:
        if name in layers and "_lora_" not in name:
            w = layers.pop(name)
            layers[name] = qfn(w)
            del w
    if "lm_head" in params:
        w = params.pop("lm_head")
        params["lm_head"] = qfn(w)
        del w
    return params


def quantized_dense(x: jnp.ndarray, wq: Dict[str, jnp.ndarray], b, dtype):
    """y = (x @ W_q) * scale [+ b]; int8 weights are converted to the
    compute dtype inside the dot (no dequantized copy in HBM).

    LLARK_TPU_INT8_KERNEL=1 swaps in the Pallas fused dequant-dot
    (ops/int8_matmul.py) for MXU-tileable 2D projections — the round-5
    probe of whether XLA really fuses the int8->bf16 convert into the
    dot operand read (A/B: scripts/bench/bench_int8_matmul.py, result
    recorded in PERFORMANCE.md)."""
    import os

    q = wq["q"]
    if (
        os.environ.get("LLARK_TPU_INT8_KERNEL")
        and jax.default_backend() == "tpu"
        and q.ndim == 2
        and q.shape[0] % 128 == 0
        and q.shape[1] % 128 == 0
    ):
        from llark_tpu.ops.int8_matmul import quantized_dense_kernel

        return quantized_dense_kernel(x, wq, b, dtype)
    y = jnp.einsum(
        "bsh,hd->bsd",
        x,
        wq["q"].astype(dtype),
        preferred_element_type=jnp.float32,
    )
    # per-layer-stacked weights carry scale [..., 1, out]; take the out row
    scale = wq["scale"]
    scale = scale.reshape(scale.shape[:-2] + (scale.shape[-1],))  # [..., out]
    y = (y * scale.astype(jnp.float32)).astype(dtype)
    if b is not None:
        y = y + b.astype(dtype)
    return y
