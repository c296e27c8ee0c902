"""Configuration dataclasses and CLI parsing.

Flag-name parity with the reference argument surface (reference:
m2t/arguments.py:22-109) plus TPU-native additions (mesh shape, remat,
pallas toggles). Everything is a plain dataclass so configs serialize to
JSON for the args.txt audit file (reference: m2t/arguments.py:136-155).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from typing import Dict, Optional, Tuple


@dataclasses.dataclass
class ModelConfig:
    """Decoder architecture. Defaults describe Llama-2-7B; `tiny()` and
    `mpt_1b()` provide the test and ablation variants."""

    arch: str = "llama"  # "llama" | "mpt"
    vocab_size: int = 32004  # 32000 + pad + 3 audio specials
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32  # < num_heads => GQA/MQA
    head_dim: Optional[int] = None  # default hidden/num_heads
    max_seq_len: int = 2048
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-5
    # MPT-specific
    use_alibi: bool = False
    use_bias: bool = False
    tie_embeddings: bool = False  # MPT ties lm_head to wte
    mlp_activation: str = "silu"  # "silu" (SwiGLU) | "gelu" (plain MLP)
    norm_type: str = "rmsnorm"  # "rmsnorm" | "layernorm"
    # Multimodal
    mm_hidden_size: int = 4800  # Jukebox embedding dim; 512 for CLAP
    use_audio_start_end: bool = True
    # Numerics
    dtype: str = "bfloat16"  # activation/compute dtype
    param_dtype: str = "float32"
    # Kernels
    use_pallas_attention: bool = True
    attention_block_q: int = 256
    attention_block_k: int = 256
    # int8 KV cache: halves cache HBM bytes/step and doubles slot/context
    # capacity; per-(head, position) scales folded into the attention dots
    kv_cache_quant: bool = False
    # Pallas flash-decode kernel for short cached steps: streams only the
    # live KV blocks from HBM (ops/decode_attention.py). Measured crossover
    # (PERFORMANCE.md round 2): wins when live context < ~0.55x the padded
    # cache (the serving regime -- caches sized for max context), loses to
    # XLA's dense padded read near cache-full. None = auto: off by default,
    # ON inside the serving stack (inference/server.py provisions padded
    # caches). Falls back to XLA off-TPU either way.
    use_flash_decode: Optional[bool] = None
    decode_block_k: int = 512
    # Unroll the layer loop for short (<=16-token) cached steps so the KV
    # cache updates apply in place instead of riding the scan's xs->ys
    # double buffer. None = auto: unroll at batch >= 2 where the KV term
    # dominates; scan for single-stream (measured on chip; PERFORMANCE.md)
    decode_unroll_layers: Optional[bool] = None
    remat: bool = True
    # remat policy: "full" recomputes the whole layer in the backward;
    # "dots" saves matmul outputs and recomputes only elementwise/norms
    # (jax dots_with_no_batch_dims_saveable) — measured on v5e MPT-1B
    # b4xs2048, full remat spends ~21% of the step recomputing forwards
    # the dots policy keeps (see PERFORMANCE.md round-3 profile)
    remat_policy: str = "full"
    # from-scratch init scheme: kaiming | xavier | small
    # (reference: m2t/llava/model/mpt/param_init_fns.py MODEL_INIT_REGISTRY)
    init_scheme: str = "kaiming"
    # LoRA (0 = disabled; see llark_tpu/models/lora.py)
    lora_rank: int = 0
    lora_alpha: float = 16.0
    lora_dropout: float = 0.0
    # Mixture-of-Experts (0 = dense MLP). GShard/Switch-style top-k
    # routing with static capacity; expert weights stack [L, E, ...] and
    # shard over the "expert" mesh axis (EP) — llark_tpu/models/moe.py.
    moe_num_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_aux_loss_weight: float = 0.01
    # "switch": raw-softmax gates + capacity drops (GShard/Switch).
    # "mixtral": top-k gates renormalized to sum 1, no token drops —
    # required for parity with imported Mixtral checkpoints
    # (HF MixtralSparseMoeBlock renormalizes and never drops).
    # load_pretrained_backbone auto-selects this when the checkpoint
    # carries block_sparse_moe.* tensors.
    moe_routing: str = "switch"

    def __post_init__(self):
        if self.head_dim is None:
            self.head_dim = self.hidden_size // self.num_heads
        if self.moe_routing not in ("switch", "mixtral"):
            raise ValueError(f"unknown moe_routing={self.moe_routing!r}")
        if self.moe_num_experts > 0 and self.moe_top_k > self.moe_num_experts:
            # with all experts masked, argmax over the zero row would
            # silently re-dispatch every token to expert 0 (moe_ffn)
            raise ValueError(
                f"moe_top_k={self.moe_top_k} must be <= "
                f"moe_num_experts={self.moe_num_experts}"
            )

    @classmethod
    def llama2_7b(cls, **kw) -> "ModelConfig":
        return cls(**kw)

    @classmethod
    def mpt_1b(cls, **kw) -> "ModelConfig":
        """MPT-1B ablation (reference: m2t/llava/model/mpt/configuration_mpt.py:7-17)."""
        base = dict(
            arch="mpt",
            vocab_size=50368 + 3,
            hidden_size=2048,
            intermediate_size=8192,
            num_layers=24,
            num_heads=16,
            num_kv_heads=16,
            max_seq_len=2048,
            use_alibi=True,
            tie_embeddings=True,
            mlp_activation="gelu",
            norm_type="layernorm",
        )
        base.update(kw)
        return cls(**base)

    @classmethod
    def tiny(cls, arch: str = "llama", **kw) -> "ModelConfig":
        """Small config for CPU tests."""
        base = dict(
            arch=arch,
            vocab_size=256,
            hidden_size=64,
            intermediate_size=128,
            num_layers=2,
            num_heads=4,
            num_kv_heads=4,
            max_seq_len=256,
            mm_hidden_size=48,
            use_pallas_attention=False,
            remat=False,
        )
        if arch == "mpt":
            base.update(
                use_alibi=True,
                tie_embeddings=True,
                mlp_activation="gelu",
                norm_type="layernorm",
            )
        base.update(kw)
        return cls(**base)


@dataclasses.dataclass
class ModelArguments:
    """Reference-parity model flags (reference: m2t/arguments.py:22-44)."""

    model_name_or_path: str = "llama2-7b"
    version: str = "v0"
    freeze_backbone: bool = False
    tune_mm_mlp_adapter: bool = False
    pretrain_mm_mlp_adapter: Optional[str] = None
    mm_use_audio_start_end: bool = True
    mm_hidden_size: int = 4800
    # MoE (beyond reference; llark_tpu/models/moe.py): >0 swaps the dense
    # MLP for top-k routed experts sharded over the "expert" mesh axis
    moe_num_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25


@dataclasses.dataclass
class DataArguments:
    """Reference-parity data flags (reference: m2t/arguments.py:47-78)."""

    train_data_path: Optional[str] = None
    eval_data_path: Optional[str] = None
    # fraction of the eval stream to keep (reference rsample_frac,
    # m2t/data_modules.py:709); None = all
    eval_data_subsample: Optional[float] = None
    is_multimodal: bool = True
    sep_audio_conv_front: bool = False
    task_sample_probs: Optional[Dict[str, float]] = None
    # gate for task_sample_probs (reference: m2t/arguments.py:68,
    # data_modules.py:698-700). True here (we always ship probs defaults)
    apply_task_sample_probs: bool = True
    # parity field: on-the-fly audio loading root (the reference's vendored
    # LLaVA preprocess reads it; the m2t audio path packs encodings into
    # shards instead, as do we)
    audio_folder: Optional[str] = None
    max_audio_frames: int = 256  # pad/truncate audio frame axis (static shapes)
    # parallel example-processing threads (1 = deterministic stream; >1
    # trades replay determinism for host throughput)
    num_workers: int = 1

    def __post_init__(self):
        if self.task_sample_probs is None:
            # reference: m2t/arguments.py:61-67
            self.task_sample_probs = {
                "captioning": 0.15,
                "reasoning": 0.55,
                "mir": 0.30,
            }


@dataclasses.dataclass
class TrainingArguments:
    """Training hyperparameters (reference: m2t/arguments.py:81-109 and the
    hyperparameters-of-record in scripts/training/train_llark.sh:24-44)."""

    output_dir: str = "/tmp/llark_tpu"
    cache_dir: Optional[str] = None
    optim: str = "adamw"
    model_max_length: int = 2048
    per_device_train_batch_size: int = 2
    gradient_accumulation_steps: int = 4
    learning_rate: float = 5e-5
    weight_decay: float = 0.0
    warmup_ratio: float = 0.03
    lr_scheduler_type: str = "cosine"
    max_steps: int = 100_000
    save_steps: int = 5000
    # eval-loss pass over eval_data_path every N steps (0 = disabled, the
    # reference's evaluation_strategy "no" default, train_llark.sh:44)
    eval_steps: int = 0
    save_total_limit: int = 1
    logging_steps: int = 1
    seed: int = 42
    bf16: bool = True
    gradient_checkpointing: bool = True
    # Quantized training (reference: m2t/arguments.py:112-133 bnb bits)
    bits: int = 16  # 16 = full; 8 = int8 frozen base (QLoRA with lora_enable)
    # LoRA (reference: m2t/arguments.py:96-108)
    lora_enable: bool = False
    lora_r: int = 64
    lora_alpha: int = 16
    lora_dropout: float = 0.05
    # warm-start LoRA factors from a saved adapter dir (reference:
    # m2t/llava/train/train.py:90 lora_weight_path)
    lora_weight_path: str = ""
    # reference lora_bias; only "none" is meaningful here (our LoRA adds no
    # bias terms) — any other value raises at startup
    lora_bias: str = "none"
    # pin the projector while training other stages (reference:
    # m2t/llava/train/train.py:68)
    freeze_mm_mlp_adapter: bool = False
    # TPU-native additions
    mesh_shape: Tuple[int, int, int] = (1, 1, 1)  # (data, fsdp, tensor)
    resume: bool = True
    # chunked cross-entropy for long sequences (0 = disabled); must divide
    # model_max_length. Enables un-pooled-audio training (see fusion.py
    # chunked_causal_lm_loss)
    loss_chunk: int = 0
    # profiling (SURVEY.md §5: reference has only wandb step logging;
    # here: jax.profiler device trace over a step window)
    profile_dir: Optional[str] = None  # write a trace here when set
    profile_start_step: int = 10
    profile_num_steps: int = 3
    # multi-host: call jax.distributed.initialize() before device use
    # (the reference's torch.distributed.launch equivalent; TPU pod slices
    # discover the topology from the runtime, no rank/world args needed)
    multihost: bool = False
    # preemption safety: on SIGTERM/SIGINT finish the in-flight step, write
    # a checkpoint, and exit cleanly so --resume continues from it (TPU
    # spot/maintenance events; the reference relies on save_steps alone)
    checkpoint_on_preemption: bool = True
    # experiment tracking (reference: train_llark.sh:33 `--report_to wandb`):
    # "jsonl" appends <output_dir>/metrics.jsonl per logged step;
    # "tensorboard" additionally writes TB events under <output_dir>/tb;
    # "none" disables tracking (stdout logging is unaffected)
    report_to: str = "jsonl"


def write_args_to_file(args_list, output_dir: str) -> None:
    """Dump all argument dataclasses to `<output_dir>/args.txt`
    (reference: m2t/arguments.py:136-155)."""
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, "args.txt")
    payload = {
        type(a).__name__: dataclasses.asdict(a) for a in args_list
    }
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2, default=str)
    os.replace(tmp, path)  # atomic: tolerate concurrent writers


def _add_dataclass_args(parser: argparse.ArgumentParser, dc_type) -> None:
    for f in dataclasses.fields(dc_type):
        name = "--" + f.name
        default = f.default if f.default is not dataclasses.MISSING else None
        if f.default_factory is not dataclasses.MISSING:  # type: ignore[misc]
            default = f.default_factory()  # type: ignore[misc]
        ftype = f.type if isinstance(f.type, type) else str
        if ftype is bool or str(f.type) == "bool":
            parser.add_argument(
                name, type=lambda s: s.lower() in ("1", "true", "yes"), default=default
            )
        elif str(f.type) in ("int", "float", "str"):
            parser.add_argument(name, type=eval(str(f.type)), default=default)  # noqa: S307
        elif str(f.type) in ("Optional[int]", "Optional[float]", "Optional[str]",
                             "int | None", "float | None", "str | None"):
            inner = str(f.type).replace("Optional[", "").rstrip("]").split(" |")[0]
            parser.add_argument(name, type=eval(inner), default=default)  # noqa: S307
        elif "Tuple[int" in str(f.type):
            parser.add_argument(
                name,
                type=lambda s: tuple(int(x) for x in s.replace(",", " ").split()),
                default=default,
            )
        else:
            parser.add_argument(name, type=json.loads if "Dict" in str(f.type) else str,
                                default=default)


def parse_args(argv=None):
    """Parse (ModelArguments, DataArguments, TrainingArguments) from CLI."""
    parser = argparse.ArgumentParser("llark_tpu")
    for dc in (ModelArguments, DataArguments, TrainingArguments):
        _add_dataclass_args(parser, dc)
    ns, _ = parser.parse_known_args(argv)
    d = vars(ns)

    def pick(dc_type):
        names = {f.name for f in dataclasses.fields(dc_type)}
        kw = {k: v for k, v in d.items() if k in names and v is not None}
        return dc_type(**kw)

    return pick(ModelArguments), pick(DataArguments), pick(TrainingArguments)
