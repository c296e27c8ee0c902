"""LoRA: low-rank adapters on the decoder's linear layers.

Parity target: the reference's bitsandbytes/PEFT path (m2t/train.py:79-106,
m2t/arguments.py:96-108; LoRA targets = every linear except the multimodal
projector and lm_head, m2t/llava/train/train.py:145-155 `find_all_linear_names`;
non-LoRA trainables — projector and embeddings — are saved separately,
m2t/train.py:264-273).

TPU-first design: LoRA factors live INSIDE ``params["layers"]`` as stacked
[L, in, r] / [L, r, out] arrays so the decoder's lax.scan slices them
alongside the base weights — one compiled layer body, zero Python branching
per layer. ``merge_lora`` folds the deltas into the base weights for
serving (no extra matmuls at inference).
"""

from __future__ import annotations

import math
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llark_tpu.config import ModelConfig

Params = Dict[str, Any]

# every attention/MLP linear; excludes mm_projector and lm_head/embed
# (reference find_all_linear_names drops ["mm_projector", "lm_head"])
LORA_TARGETS: Tuple[str, ...] = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def lora_scale(cfg: ModelConfig) -> float:
    return float(cfg.lora_alpha) / float(max(cfg.lora_rank, 1))


def lora_keys(params: Params) -> List[str]:
    return sorted(k for k in params.get("layers", {}) if "_lora_" in k)


def init_lora_params(cfg: ModelConfig, key: jax.Array, params: Params) -> Params:
    """Return params with zero-delta LoRA factors added for each target
    present in the layer tree. A ~ N(0, 1/in), B = 0 so training starts
    from the base model exactly."""
    if cfg.lora_rank <= 0:
        raise ValueError("cfg.lora_rank must be > 0 to add LoRA params")
    if cfg.moe_num_experts > 0:
        import logging

        logging.getLogger(__name__).warning(
            "MoE model: LoRA factors are added to the attention projections "
            "only — the expert FFN stacks (moe_w_*) are not LoRA targets "
            "and stay frozen under a frozen-base run"
        )
    pdt = jnp.dtype(cfg.param_dtype)
    r = cfg.lora_rank
    layers = dict(params["layers"])
    targets = [t for t in LORA_TARGETS if t in layers]
    keys = jax.random.split(key, len(targets))
    for k, name in zip(keys, targets):
        w = layers[name]  # [L, in, out]
        L, fan_in, fan_out = w.shape
        layers[f"{name}_lora_a"] = (
            jax.random.normal(k, (L, fan_in, r), jnp.float32) / math.sqrt(fan_in)
        ).astype(pdt)
        layers[f"{name}_lora_b"] = jnp.zeros((L, r, fan_out), pdt)
    out = dict(params)
    out["layers"] = layers
    return out


def merge_lora(cfg: ModelConfig, params: Params) -> Params:
    """Fold LoRA deltas into the base weights and drop the factors
    (serving path: zero adapter overhead)."""
    scale = lora_scale(cfg)
    layers = dict(params["layers"])
    for name in LORA_TARGETS:
        a = layers.pop(f"{name}_lora_a", None)
        b = layers.pop(f"{name}_lora_b", None)
        if a is None or b is None:
            continue
        w = layers[name]
        delta = jnp.einsum(
            "lir,lro->lio",
            a.astype(jnp.float32),
            b.astype(jnp.float32),
        ) * scale
        layers[name] = (w.astype(jnp.float32) + delta).astype(w.dtype)
    out = dict(params)
    out["layers"] = layers
    return out


def strip_lora(params: Params) -> Params:
    """Base params with LoRA factors removed (NOT merged)."""
    out = dict(params)
    out["layers"] = {k: v for k, v in params["layers"].items() if "_lora_" not in k}
    return out


def lora_layer_specs(cfg: ModelConfig, base_layer_specs: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpecs for the stacked LoRA factors, derived from the base
    weight's spec: A inherits the input-dim sharding, B the output-dim
    sharding; the rank dim is replicated (r is small)."""
    from jax.sharding import PartitionSpec as P

    specs: Dict[str, Any] = {}
    for name in LORA_TARGETS:
        base = base_layer_specs.get(name)
        if base is None:
            continue
        _, in_axis, out_axis = tuple(base) + (None,) * (3 - len(tuple(base)))
        specs[f"{name}_lora_a"] = P(None, in_axis, None)
        specs[f"{name}_lora_b"] = P(None, None, out_axis)
    return specs


# ---------------------------------------------------------------------------
# Adapter export / import (reference: adapter + non_lora_trainables.bin,
# m2t/train.py:264-273)
# ---------------------------------------------------------------------------


def _flatten(tree: Params, prefix: str = "") -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            flat.update(_flatten(v, key + "."))
        else:
            flat[key] = np.asarray(v)
    return flat


def save_lora_adapter(
    path: str, cfg: ModelConfig, params: Params, extra_non_lora: Optional[Params] = None
) -> str:
    """Write `adapter.npz` (LoRA factors) and `non_lora_trainables.npz`
    (projector + any extra trainables) under `path`. Returns the dir."""
    os.makedirs(path, exist_ok=True)
    adapter = {
        f"layers.{k}": np.asarray(v)
        for k, v in params["layers"].items()
        if "_lora_" in k
    }
    adapter["__lora_rank__"] = np.asarray(cfg.lora_rank)
    adapter["__lora_alpha__"] = np.asarray(cfg.lora_alpha)
    np.savez(os.path.join(path, "adapter.npz"), **adapter)

    non_lora: Dict[str, np.ndarray] = {}
    if "mm_projector" in params:
        non_lora.update(_flatten({"mm_projector": params["mm_projector"]}))
    if extra_non_lora:
        non_lora.update(_flatten(extra_non_lora))
    np.savez(os.path.join(path, "non_lora_trainables.npz"), **non_lora)
    return path


def load_lora_adapter(path: str, params: Params) -> Tuple[Params, Dict[str, int]]:
    """Apply a saved adapter onto a base param tree. Returns (params, meta)."""
    data = np.load(os.path.join(path, "adapter.npz"))
    meta = {
        "lora_rank": int(data["__lora_rank__"]),
        "lora_alpha": int(data["__lora_alpha__"]),
    }
    layers = dict(params["layers"])
    for k in data.files:
        if k.startswith("layers."):
            layers[k[len("layers."):]] = jnp.asarray(data[k])
    out = dict(params)
    out["layers"] = layers

    nl_path = os.path.join(path, "non_lora_trainables.npz")
    if os.path.exists(nl_path):
        nl = np.load(nl_path)
        for k in nl.files:
            parts = k.split(".")
            node = out
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(nl[k])
    return out, meta
