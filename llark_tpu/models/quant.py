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

# weights worth quantizing: the large 2D projections
QUANT_TARGETS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


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
    compute dtype inside the dot (no dequantized copy in HBM)."""
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
