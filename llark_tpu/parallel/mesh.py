"""Device mesh + sharding rules.

The reference's distributed story is DDP over NCCL with FSDP hooks
(reference: scripts/training/train_llark.sh:20-22, m2t/train.py:186-220).
The TPU-native equivalent is a 3-axis logical mesh

    ("data", "fsdp", "tensor")

where:
  * batch is sharded over ("data", "fsdp") — pure DP uses data only;
  * parameters/optimizer state are sharded over "fsdp" (ZeRO-3
    equivalent) — XLA all-gathers weights per layer and
    reduce-scatters gradients, all over ICI;
  * "tensor" is Megatron-style intra-layer model parallelism for >8B
    configs or low-latency inference.

All collectives are emitted by GSPMD from these annotations; there is no
user-level NCCL analog (SURVEY.md §2.8).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from llark_tpu.config import ModelConfig


@dataclasses.dataclass(frozen=True)
class MeshAxes:
    data: str = "data"
    fsdp: str = "fsdp"
    tensor: str = "tensor"
    expert: str = "expert"  # EP: MoE expert dim (llark_tpu/models/moe.py)

    @property
    def batch(self) -> Tuple[str, str]:
        return (self.data, self.fsdp)


AXES = MeshAxes()


def make_mesh(
    shape: Tuple[int, ...] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a ("data", "fsdp", "tensor") mesh — or, with a 4-length
    shape, ("data", "fsdp", "tensor", "expert") for MoE/EP runs.

    Default: all devices on the fsdp axis (pure ZeRO-3-style sharding),
    which is the right single-slice default for 7B training.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (1, n, 1)
    if len(shape) not in (3, 4):
        raise ValueError(f"mesh shape must have 3 or 4 axes, got {shape}")
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not match {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    names = (AXES.data, AXES.fsdp, AXES.tensor, AXES.expert)[: len(shape)]
    return Mesh(dev_array, names)


def _layer_specs(cfg: ModelConfig) -> Dict[str, P]:
    """PartitionSpecs for the stacked [L, ...] layer params."""
    f, t = AXES.fsdp, AXES.tensor
    specs: Dict[str, P] = {
        "attn_norm_scale": P(None, None),
        "mlp_norm_scale": P(None, None),
        # attention: column-parallel qkv, row-parallel out
        "wq": P(None, f, t),
        "wk": P(None, f, t),
        "wv": P(None, f, t),
        "wo": P(None, t, f),
        # mlp: column-parallel up/gate, row-parallel down
        "w_up": P(None, f, t),
        "w_down": P(None, t, f),
    }
    if cfg.mlp_activation == "silu":
        specs["w_gate"] = P(None, f, t)
    if cfg.moe_num_experts > 0:
        # EP: expert dim over "expert" (requires a 4-axis mesh); the dense
        # MLP weights above are absent from MoE param trees, and vice versa
        e = AXES.expert
        del specs["w_up"], specs["w_down"]
        specs.pop("w_gate", None)
        specs["moe_router"] = P(None, f, None)
        specs["moe_w_up"] = P(None, e, f, t)
        specs["moe_w_down"] = P(None, e, t, f)
        if cfg.mlp_activation == "silu":
            specs["moe_w_gate"] = P(None, e, f, t)
    if cfg.norm_type == "layernorm":
        specs["attn_norm_bias"] = P(None, None)
        specs["mlp_norm_bias"] = P(None, None)
    if cfg.use_bias:
        specs.update(
            bq=P(None, t),
            bk=P(None, t),
            bv=P(None, t),
            bo=P(None, f),
        )
        if cfg.moe_num_experts == 0:
            specs["b_up"] = P(None, t)
            specs["b_down"] = P(None, f)
            if cfg.mlp_activation == "silu":
                specs["b_gate"] = P(None, t)
    if cfg.lora_rank > 0:
        from llark_tpu.models.lora import lora_layer_specs

        specs.update(lora_layer_specs(cfg, specs))
    return specs


def param_partition_specs(cfg: ModelConfig, multimodal: bool = True) -> Dict[str, Any]:
    """PartitionSpec tree matching init_llark_params/init_decoder_params."""
    f, t = AXES.fsdp, AXES.tensor
    specs: Dict[str, Any] = {
        "embed": P(None, f),
        "layers": _layer_specs(cfg),
        "final_norm_scale": P(None),
    }
    if cfg.norm_type == "layernorm":
        specs["final_norm_bias"] = P(None)
    if not cfg.tie_embeddings:
        specs["lm_head"] = P(f, t)
    if multimodal:
        specs["mm_projector"] = {"kernel": P(f, t), "bias": P(None)}
    return specs


def adapt_specs_to_params(specs: Any, params: Any) -> Any:
    """Expand P-leaf specs into {q, scale} / {q4, scale} / {q4c, scale}
    spec dicts wherever the param tree holds a quantized weight
    (llark_tpu/models/quant.py). The packed array keeps the base weight's
    spec (packing preserves dim count and which dim is in/out); scales are
    sharded only along the out axis."""

    def is_quant(p) -> bool:
        return isinstance(p, dict) and "scale" in p and (
            "q" in p or "q4" in p or "q4c" in p
        )

    def walk(spec, p):
        if is_quant(p):
            base = spec if isinstance(spec, P) else P()
            tail = base[-1] if len(base) else None
            scale_spec = P(*([None] * (p["scale"].ndim - 1) + [tail]))
            qkey = "q" if "q" in p else ("q4" if "q4" in p else "q4c")
            return {qkey: base, "scale": scale_spec}
        if isinstance(p, dict):
            return {k: walk(spec[k] if isinstance(spec, dict) else spec, v)
                    for k, v in p.items()}
        if isinstance(p, (list, tuple)):
            return type(p)(
                walk(spec[i] if isinstance(spec, (list, tuple)) else spec, v)
                for i, v in enumerate(p)
            )
        return spec

    return walk(specs, params)


def param_shardings(mesh: Mesh, specs) -> Any:
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def batch_sharding(mesh: Mesh):
    """NamedSharding factory for a host batch dict: dim 0 over (data, fsdp),
    everything else replicated. The single source of the batch-layout rule —
    train.py and any serving path should use this, not re-derive it."""

    def shard_for(x):
        nd = x.ndim if hasattr(x, "ndim") else 0
        if nd == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P(AXES.batch, *([None] * (nd - 1))))

    return shard_for


def shard_params(mesh: Mesh, params, specs):
    """Device_put a host param tree onto the mesh with the given specs."""
    sh = param_shardings(mesh, specs)
    return jax.tree.map(jax.device_put, params, sh)
