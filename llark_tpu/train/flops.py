"""Model-FLOP accounting and MFU (model-FLOP utilization).

The reference publishes no utilization numbers at all (BASELINE.md has
only end-task metrics and a fleet throughput claim); MFU is the standard
TPU yardstick for "how much of the chip the training step actually
uses", so every training benchmark here reports it alongside ms/step.

Accounting follows the PaLM-appendix convention:
  * matmul FLOPs per token (fwd+bwd) = 6 * N_matmul, where N_matmul is
    every parameter that participates in a dense contraction (attention
    and MLP projections, router, lm_head/tied-embedding logits, the
    multimodal projector) — vocab *lookup* embeddings are excluded;
  * attention score/value FLOPs (fwd+bwd) = 6 * L * T_causal * d_attn
    per token, with T_causal = seq_len / 2 for causal masks;
  * MoE counts only the ACTIVE expert parameters per token (top_k of E).

MFU = achieved model FLOP/s / peak bf16 FLOP/s of the attached device.
"""

from __future__ import annotations

from typing import Optional

from llark_tpu.config import ModelConfig

# peak bf16 dense FLOP/s per chip, by device_kind substring (public specs)
_PEAK_BF16 = (
    ("v6", 918e12),  # v6e (Trillium)
    ("v5p", 459e12),
    ("v5", 197e12),  # v5e / "TPU v5 lite"
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 45e12),
)


def device_peak_flops(device=None) -> Optional[float]:
    """Peak bf16 FLOP/s for the attached device, or None if unknown/CPU."""
    import jax

    if device is None:
        devs = jax.devices()
        if not devs:
            return None
        device = devs[0]
    kind = getattr(device, "device_kind", "").lower()
    if "tpu" not in kind and getattr(device, "platform", "") != "tpu":
        return None
    for marker, peak in _PEAK_BF16:
        if marker in kind:
            return peak
    return None


def matmul_param_count(cfg: ModelConfig, multimodal: bool = True) -> int:
    """Parameters that feed dense contractions (active per token)."""
    h = cfg.hidden_size
    d_attn = cfg.num_heads * cfg.head_dim
    d_kv = cfg.num_kv_heads * cfg.head_dim
    per_layer = h * d_attn + 2 * h * d_kv + d_attn * h  # wq, wk, wv, wo
    if cfg.moe_num_experts > 0:
        mlps = 2 * h * cfg.intermediate_size
        if cfg.mlp_activation == "silu":
            mlps += h * cfg.intermediate_size
        per_layer += cfg.moe_top_k * mlps  # active experts only
        per_layer += h * cfg.moe_num_experts  # router
    else:
        per_layer += 2 * h * cfg.intermediate_size
        if cfg.mlp_activation == "silu":
            per_layer += h * cfg.intermediate_size
    total = cfg.num_layers * per_layer
    total += h * cfg.vocab_size  # logits matmul (tied or not, it computes)
    if multimodal:
        total += cfg.mm_hidden_size * h  # projector
    return total


def train_flops_per_token(
    cfg: ModelConfig, seq_len: int, multimodal: bool = True,
    frozen_base: bool = False,
) -> float:
    """Model FLOPs per trained token, forward + backward.

    frozen_base (QLoRA): the backward still propagates dL/dx through every
    frozen matmul (2N) but skips dL/dW (another 2N), so the base counts
    4N instead of 6N; the rank-r adapters add 6 * N_lora (~3% of base at
    r=64 on a 7B). Attention score/value FLOPs are weightless and stay 6x
    either way."""
    factor = 4.0 if frozen_base else 6.0
    matmul = factor * matmul_param_count(cfg, multimodal)
    if frozen_base and cfg.lora_rank:
        # adapters on the attention projections: (in x r + r x out) each
        h = cfg.hidden_size
        d_attn = cfg.num_heads * cfg.head_dim
        d_kv = cfg.num_kv_heads * cfg.head_dim
        r = cfg.lora_rank
        per_layer = r * (h + d_attn) + 2 * r * (h + d_kv) + r * (d_attn + h)
        matmul += 6.0 * cfg.num_layers * per_layer
    # causal attention: QK^T and PV each 2*(T/2)*d_attn fwd FLOPs/token,
    # x3 for fwd+bwd -> 6 * L * (T/2) * 2 * d_attn = 6 * L * T * d_attn
    attn = 6.0 * cfg.num_layers * seq_len * cfg.num_heads * cfg.head_dim
    return matmul + attn


def infer_flops_per_token(
    cfg: ModelConfig, seq_len: int, multimodal: bool = True
) -> float:
    """Model FLOPs per token, FORWARD only (prefill/decode accounting):
    2 * N_matmul + causal attention 2 * L * (T/2) * 2 * d_attn."""
    matmul = 2.0 * matmul_param_count(cfg, multimodal)
    attn = 2.0 * cfg.num_layers * seq_len * cfg.num_heads * cfg.head_dim
    return matmul + attn


def train_mfu(
    cfg: ModelConfig,
    seq_len: int,
    tokens_per_s: float,
    n_devices: int = 1,
    peak: Optional[float] = None,
) -> Optional[float]:
    """Achieved MFU in [0, 1], or None when the peak is unknown (CPU)."""
    peak = peak if peak is not None else device_peak_flops()
    if not peak or tokens_per_s <= 0:
        return None
    return train_flops_per_token(cfg, seq_len) * tokens_per_s / (peak * n_devices)
