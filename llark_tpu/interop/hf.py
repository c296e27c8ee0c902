"""HF-checkpoint interop.

Parity targets:
  * weight IMPORT replaces the reference's `from_pretrained` load of
    Llama-2-7b-chat / MPT-1B (m2t/train.py:62-75, m2t/models/utils.py:126-199);
  * weight EXPORT produces a state dict the reference's wrapped models could
    load (`model.layers...`, plus `model.mm_projector.{weight,bias}` — the keys
    WrappedTrainer._save writes, m2t/models/trainer.py:35-65);
  * new-token embedding rows are mean-initialized exactly as
    `initialize_audio_tokenizer` does (m2t/models/llamav2.py:367-419).

All conversion is host-side numpy; the result is a pytree ready for
`shard_params` onto the device mesh. HF Linear stores [out, in]; our stacked
layout is [L, in, out], so every projection transposes on import.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional

import numpy as np

from llark_tpu.config import ModelConfig

log = logging.getLogger(__name__)

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# state-dict loading (safetensors / torch .bin, sharded or single-file)
# ---------------------------------------------------------------------------


def _load_one(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.float().numpy() if v.dtype == torch.bfloat16 else v.numpy()
            for k, v in sd.items()}


def load_hf_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a HF checkpoint directory or single weight file into numpy.
    Handles sharded checkpoints via the *.index.json manifest
    (the reference's shard-by-shard loader: m2t/models/utils.py:55-123)."""
    if os.path.isfile(path):
        return _load_one(path)
    for index_name in ("model.safetensors.index.json", "pytorch_model.bin.index.json"):
        idx = os.path.join(path, index_name)
        if os.path.exists(idx):
            with open(idx) as f:
                manifest = json.load(f)
            out: Dict[str, np.ndarray] = {}
            for shard in sorted(set(manifest["weight_map"].values())):
                out.update(_load_one(os.path.join(path, shard)))
            return out
    for name in ("model.safetensors", "pytorch_model.bin"):
        p = os.path.join(path, name)
        if os.path.exists(p):
            return _load_one(p)
    raise FileNotFoundError(f"no HF weights found under {path}")


# ---------------------------------------------------------------------------
# import: HF -> llark_tpu param tree
# ---------------------------------------------------------------------------


def _stack(sd: Dict[str, np.ndarray], pattern: str, n_layers: int,
           transpose: bool = False) -> np.ndarray:
    mats = [sd[pattern.format(i=i)] for i in range(n_layers)]
    out = np.stack([m.T if transpose else m for m in mats], axis=0)
    return np.ascontiguousarray(out)


def _maybe_stack(sd, pattern, n_layers, transpose=False):
    if pattern.format(i=0) in sd:
        return _stack(sd, pattern, n_layers, transpose)
    return None


def llama_params_from_hf(
    sd: Dict[str, np.ndarray], cfg: ModelConfig, dtype: Optional[str] = None
) -> Params:
    """HF LlamaForCausalLM state dict -> stacked decoder params."""
    L = cfg.num_layers
    pdt = np.dtype(dtype or cfg.param_dtype)

    def cast(x):
        return np.asarray(x, pdt)

    layers: Params = {
        "attn_norm_scale": cast(_stack(sd, "model.layers.{i}.input_layernorm.weight", L)),
        "mlp_norm_scale": cast(_stack(sd, "model.layers.{i}.post_attention_layernorm.weight", L)),
        "wq": cast(_stack(sd, "model.layers.{i}.self_attn.q_proj.weight", L, transpose=True)),
        "wk": cast(_stack(sd, "model.layers.{i}.self_attn.k_proj.weight", L, transpose=True)),
        "wv": cast(_stack(sd, "model.layers.{i}.self_attn.v_proj.weight", L, transpose=True)),
        "wo": cast(_stack(sd, "model.layers.{i}.self_attn.o_proj.weight", L, transpose=True)),
    }
    if "model.layers.0.block_sparse_moe.gate.weight" in sd:
        # Mixtral-style MoE: gate [E, H] -> router [L, H, E]; per-expert
        # w1 (gate), w3 (up), w2 (down) -> stacked [L, E, in, out]
        # (matches init_moe_layer_params, llark_tpu/models/moe.py)
        E = sd["model.layers.0.block_sparse_moe.gate.weight"].shape[0]
        if cfg.moe_num_experts and cfg.moe_num_experts != E:
            raise ValueError(
                f"checkpoint has {E} experts, cfg.moe_num_experts={cfg.moe_num_experts}"
            )

        def stack_experts(w_name: str) -> np.ndarray:
            return np.ascontiguousarray(np.stack([
                np.stack([
                    sd[f"model.layers.{i}.block_sparse_moe.experts.{e}.{w_name}.weight"].T
                    for e in range(E)
                ], axis=0)
                for i in range(L)
            ], axis=0))

        layers["moe_router"] = cast(
            _stack(sd, "model.layers.{i}.block_sparse_moe.gate.weight", L, transpose=True)
        )
        layers["moe_w_gate"] = cast(stack_experts("w1"))
        layers["moe_w_down"] = cast(stack_experts("w2"))
        layers["moe_w_up"] = cast(stack_experts("w3"))
    else:
        layers["w_gate"] = cast(_stack(sd, "model.layers.{i}.mlp.gate_proj.weight", L, transpose=True))
        layers["w_up"] = cast(_stack(sd, "model.layers.{i}.mlp.up_proj.weight", L, transpose=True))
        layers["w_down"] = cast(_stack(sd, "model.layers.{i}.mlp.down_proj.weight", L, transpose=True))
    params: Params = {
        "embed": cast(sd["model.embed_tokens.weight"]),
        "layers": layers,
        "final_norm_scale": cast(sd["model.norm.weight"]),
        "lm_head": cast(sd["lm_head.weight"].T),
    }
    return params


def mpt_params_from_hf(
    sd: Dict[str, np.ndarray], cfg: ModelConfig, dtype: Optional[str] = None
) -> Params:
    """HF MptForCausalLM state dict -> stacked decoder params.
    MPT fuses Wqkv ([3H, H]); we split into wq/wk/wv. Embeddings are tied
    (reference: m2t/models/mpt.py:312)."""
    L = cfg.num_layers
    h = cfg.hidden_size
    pdt = np.dtype(dtype or cfg.param_dtype)

    def cast(x):
        return np.asarray(x, pdt)

    wqkv = _stack(sd, "transformer.blocks.{i}.attn.Wqkv.weight", L)  # [L, 3H, H]
    wq, wk, wv = wqkv[:, :h, :], wqkv[:, h : 2 * h, :], wqkv[:, 2 * h :, :]

    layers: Params = {
        "attn_norm_scale": cast(_stack(sd, "transformer.blocks.{i}.norm_1.weight", L)),
        "mlp_norm_scale": cast(_stack(sd, "transformer.blocks.{i}.norm_2.weight", L)),
        "wq": cast(np.ascontiguousarray(wq.transpose(0, 2, 1))),
        "wk": cast(np.ascontiguousarray(wk.transpose(0, 2, 1))),
        "wv": cast(np.ascontiguousarray(wv.transpose(0, 2, 1))),
        "wo": cast(_stack(sd, "transformer.blocks.{i}.attn.out_proj.weight", L, transpose=True)),
        "w_up": cast(_stack(sd, "transformer.blocks.{i}.ffn.up_proj.weight", L, transpose=True)),
        "w_down": cast(_stack(sd, "transformer.blocks.{i}.ffn.down_proj.weight", L, transpose=True)),
    }
    for ours, theirs in (
        ("attn_norm_bias", "transformer.blocks.{i}.norm_1.bias"),
        ("mlp_norm_bias", "transformer.blocks.{i}.norm_2.bias"),
    ):
        stacked = _maybe_stack(sd, theirs, L)
        layers[ours] = cast(stacked) if stacked is not None else np.zeros(
            (L, h), pdt
        )

    params: Params = {
        "embed": cast(sd["transformer.wte.weight"]),
        "layers": layers,
        "final_norm_scale": cast(sd["transformer.norm_f.weight"]),
    }
    if "transformer.norm_f.bias" in sd:
        params["final_norm_bias"] = cast(sd["transformer.norm_f.bias"])
    else:
        params["final_norm_bias"] = np.zeros((h,), pdt)
    return params


def resize_embeddings(params: Params, new_vocab: int) -> Params:
    """Grow embed (and lm_head) to new_vocab rows; new rows/cols get the
    mean of the existing ones (reference: m2t/models/llamav2.py:367-419)."""
    out = dict(params)
    embed = np.asarray(params["embed"])
    old_vocab = embed.shape[0]
    if new_vocab < old_vocab:
        raise ValueError(f"cannot shrink vocab {old_vocab} -> {new_vocab}")
    if new_vocab > old_vocab:
        mean_row = embed.mean(axis=0, keepdims=True)
        out["embed"] = np.concatenate(
            [embed, np.repeat(mean_row, new_vocab - old_vocab, axis=0)], axis=0
        ).astype(embed.dtype)
    if "lm_head" in params:
        head = np.asarray(params["lm_head"])  # [H, V]
        if new_vocab > head.shape[1]:
            mean_col = head.mean(axis=1, keepdims=True)
            out["lm_head"] = np.concatenate(
                [head, np.repeat(mean_col, new_vocab - head.shape[1], axis=1)], axis=1
            ).astype(head.dtype)
    return out


def load_pretrained_backbone(path: str, cfg: ModelConfig) -> Params:
    """Import an HF checkpoint dir, detect arch, resize vocab to cfg.

    Mixtral checkpoints (block_sparse_moe.* tensors) force
    cfg.moe_routing="mixtral" and a drop-free capacity factor E/K, because
    HF's MixtralSparseMoeBlock renormalizes the top-k gates to sum to 1 and
    never drops tokens — running an imported Mixtral under Switch routing
    would systematically down-scale every MoE output."""
    sd = load_hf_state_dict(path)
    if any(k.startswith("transformer.blocks.") for k in sd):
        params = mpt_params_from_hf(sd, cfg)
    else:
        if ("model.layers.0.block_sparse_moe.gate.weight" in sd
                and cfg.moe_num_experts > 0):
            if cfg.moe_routing != "mixtral":
                log.warning(
                    "Mixtral checkpoint detected: switching moe_routing "
                    "'%s' -> 'mixtral' (renormalized gates, no drops)",
                    cfg.moe_routing,
                )
                cfg.moe_routing = "mixtral"
            drop_free = cfg.moe_num_experts / cfg.moe_top_k
            if cfg.moe_capacity_factor < drop_free:
                log.warning(
                    "Mixtral checkpoint: raising moe_capacity_factor "
                    "%.3g -> %.3g so no token is ever dropped",
                    cfg.moe_capacity_factor, drop_free,
                )
                cfg.moe_capacity_factor = drop_free
        params = llama_params_from_hf(sd, cfg)
    if np.asarray(params["embed"]).shape[0] != cfg.vocab_size:
        params = resize_embeddings(params, cfg.vocab_size)
    return params


# ---------------------------------------------------------------------------
# export: llark_tpu -> HF state dict
# ---------------------------------------------------------------------------


def hf_state_dict_from_params(
    cfg: ModelConfig, params: Params, include_projector: bool = True
) -> Dict[str, np.ndarray]:
    """Inverse of the importers. Keys match what the reference's wrapped
    models save/load, including `model.mm_projector.*`."""
    layers = params["layers"]
    L = cfg.num_layers
    sd: Dict[str, np.ndarray] = {}

    def unstack(name: str, arr, pattern: str, transpose: bool = False):
        a = np.asarray(arr, np.float32)
        for i in range(L):
            m = a[i]
            sd[pattern.format(i=i)] = np.ascontiguousarray(m.T if transpose else m)

    if cfg.arch == "mpt":
        sd["transformer.wte.weight"] = np.asarray(params["embed"], np.float32)
        wq = np.asarray(layers["wq"], np.float32).transpose(0, 2, 1)
        wk = np.asarray(layers["wk"], np.float32).transpose(0, 2, 1)
        wv = np.asarray(layers["wv"], np.float32).transpose(0, 2, 1)
        wqkv = np.concatenate([wq, wk, wv], axis=1)  # [L, 3H, H]
        for i in range(L):
            sd[f"transformer.blocks.{i}.attn.Wqkv.weight"] = np.ascontiguousarray(wqkv[i])
        unstack("wo", layers["wo"], "transformer.blocks.{i}.attn.out_proj.weight", True)
        unstack("w_up", layers["w_up"], "transformer.blocks.{i}.ffn.up_proj.weight", True)
        unstack("w_down", layers["w_down"], "transformer.blocks.{i}.ffn.down_proj.weight", True)
        unstack("attn_norm_scale", layers["attn_norm_scale"], "transformer.blocks.{i}.norm_1.weight")
        unstack("mlp_norm_scale", layers["mlp_norm_scale"], "transformer.blocks.{i}.norm_2.weight")
        sd["transformer.norm_f.weight"] = np.asarray(params["final_norm_scale"], np.float32)
        if "final_norm_bias" in params:
            sd["transformer.norm_f.bias"] = np.asarray(params["final_norm_bias"], np.float32)
    else:
        sd["model.embed_tokens.weight"] = np.asarray(params["embed"], np.float32)
        unstack("wq", layers["wq"], "model.layers.{i}.self_attn.q_proj.weight", True)
        unstack("wk", layers["wk"], "model.layers.{i}.self_attn.k_proj.weight", True)
        unstack("wv", layers["wv"], "model.layers.{i}.self_attn.v_proj.weight", True)
        unstack("wo", layers["wo"], "model.layers.{i}.self_attn.o_proj.weight", True)
        if "moe_router" in layers:
            # inverse of the Mixtral import in llama_params_from_hf
            unstack("moe_router", layers["moe_router"],
                    "model.layers.{i}.block_sparse_moe.gate.weight", True)
            for ours, theirs in (("moe_w_gate", "w1"), ("moe_w_down", "w2"),
                                 ("moe_w_up", "w3")):
                a = np.asarray(layers[ours], np.float32)  # [L, E, in, out]
                for i in range(L):
                    for e in range(a.shape[1]):
                        sd[
                            f"model.layers.{i}.block_sparse_moe.experts.{e}.{theirs}.weight"
                        ] = np.ascontiguousarray(a[i, e].T)
        else:
            unstack("w_gate", layers["w_gate"], "model.layers.{i}.mlp.gate_proj.weight", True)
            unstack("w_up", layers["w_up"], "model.layers.{i}.mlp.up_proj.weight", True)
            unstack("w_down", layers["w_down"], "model.layers.{i}.mlp.down_proj.weight", True)
        unstack("attn_norm_scale", layers["attn_norm_scale"], "model.layers.{i}.input_layernorm.weight")
        unstack("mlp_norm_scale", layers["mlp_norm_scale"], "model.layers.{i}.post_attention_layernorm.weight")
        sd["model.norm.weight"] = np.asarray(params["final_norm_scale"], np.float32)
        sd["lm_head.weight"] = np.ascontiguousarray(
            np.asarray(params["lm_head"], np.float32).T
        )

    if include_projector and "mm_projector" in params:
        # the reference stores the projector as nn.Linear: weight [H, mm]
        sd["model.mm_projector.weight"] = np.ascontiguousarray(
            np.asarray(params["mm_projector"]["kernel"], np.float32).T
        )
        sd["model.mm_projector.bias"] = np.asarray(
            params["mm_projector"]["bias"], np.float32
        )
    return sd


def save_hf_checkpoint(path: str, cfg: ModelConfig, params: Params) -> str:
    """Write pytorch_model.bin + a minimal config.json readable by the
    reference's loaders."""
    import torch

    os.makedirs(path, exist_ok=True)
    sd = hf_state_dict_from_params(cfg, params)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
               os.path.join(path, "pytorch_model.bin"))
    if cfg.arch == "mpt":
        config = {
            "model_type": "mpt",
            "d_model": cfg.hidden_size,
            "n_heads": cfg.num_heads,
            "n_layers": cfg.num_layers,
            "expansion_ratio": cfg.intermediate_size // cfg.hidden_size,
            "max_seq_len": cfg.max_seq_len,
            "vocab_size": cfg.vocab_size,
            "mm_hidden_size": cfg.mm_hidden_size,
        }
    else:
        # MoE state dicts carry Mixtral 'block_sparse_moe.*' tensor names,
        # so the config must say mixtral too — a loader handed model_type
        # 'llama' would instantiate a dense LlamaForCausalLM and silently
        # drop every expert weight
        moe = bool(cfg.moe_num_experts)
        config = {
            "model_type": "mixtral" if moe else "llama",
            "architectures": [
                "MixtralForCausalLM" if moe else "LlamaForCausalLM"
            ],
            "hidden_size": cfg.hidden_size,
            "intermediate_size": cfg.intermediate_size,
            "num_hidden_layers": cfg.num_layers,
            "num_attention_heads": cfg.num_heads,
            "num_key_value_heads": cfg.num_kv_heads,
            "max_position_embeddings": cfg.max_seq_len,
            "rms_norm_eps": cfg.rms_norm_eps,
            "rope_theta": cfg.rope_theta,
            "vocab_size": cfg.vocab_size,
            "mm_hidden_size": cfg.mm_hidden_size,
        }
        if moe:
            config["num_local_experts"] = cfg.moe_num_experts
            config["num_experts_per_tok"] = cfg.moe_top_k
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
    return path
