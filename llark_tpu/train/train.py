"""Training entry point: `python -m llark_tpu.train.train --flags...`

Reference-parity orchestration (m2t/train.py:53-284):
  model select by name (mpt -> MPT else Llama) .......... :62-75
  freeze / adapter-tuning flags ......................... :79-106, 143-164
  tokenizer + audio special tokens ...................... :108-126, 176-182
  adapter (projector) init, optional pretrained load .... :128-137
  sample-batch smoke test before training ............... :240-253
  auto-resume from existing checkpoints ................. :255-260
  periodic + final save (projector side-save) ........... trainer.py:35-65
TPU-native replacements: GSPMD mesh instead of DDP launch; orbax instead
of torch.save; one jitted step with grad accumulation inside.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from llark_tpu.config import (
    DataArguments,
    ModelArguments,
    ModelConfig,
    TrainingArguments,
    parse_args,
    write_args_to_file,
)
from llark_tpu.data.pipeline import make_data_module
from llark_tpu.models.fusion import init_llark_params
from llark_tpu.parallel.mesh import (
    AXES,
    adapt_specs_to_params,
    batch_sharding,
    make_mesh,
    param_partition_specs,
    shard_params,
)
from llark_tpu.tokenization import TokenizerBundle, WordTokenizer
from llark_tpu.train.checkpoint import (
    CheckpointManager,
    apply_pretrained_projector,
    load_projector_weights,
)
from llark_tpu.train.state import TrainState
from llark_tpu.train.step import make_optimizer, make_train_step

log = logging.getLogger("llark_tpu.train")


def model_config_from_name(name: str, model_args: ModelArguments, training_args=None) -> ModelConfig:
    """Select architecture by model name (reference: m2t/train.py:62-75).
    A local directory with a config.json takes its dims from that file."""
    kw: Dict[str, Any] = {"mm_hidden_size": model_args.mm_hidden_size}
    if getattr(model_args, "moe_num_experts", 0):
        kw.update(
            moe_num_experts=model_args.moe_num_experts,
            moe_top_k=model_args.moe_top_k,
            moe_capacity_factor=model_args.moe_capacity_factor,
        )
    cfg_path = os.path.join(name, "config.json")
    if os.path.isdir(name) and os.path.exists(cfg_path):
        import json

        with open(cfg_path) as f:
            hf = json.load(f)
        # Mixtral-style MoE dims from the checkpoint config
        if hf.get("num_local_experts") and "moe_num_experts" not in kw:
            kw.update(
                moe_num_experts=hf["num_local_experts"],
                moe_top_k=hf.get("num_experts_per_tok", 2),
            )
        if hf.get("model_type") == "mpt":
            return ModelConfig.mpt_1b(
                vocab_size=hf.get("vocab_size", 50368),
                hidden_size=hf.get("d_model", 2048),
                intermediate_size=hf.get("d_model", 2048) * hf.get("expansion_ratio", 4),
                num_layers=hf.get("n_layers", 24),
                num_heads=hf.get("n_heads", 16),
                num_kv_heads=hf.get("n_heads", 16),
                max_seq_len=hf.get("max_seq_len", 2048),
                **kw,
            )
        return ModelConfig(
            vocab_size=hf.get("vocab_size", 32000),
            hidden_size=hf.get("hidden_size", 4096),
            intermediate_size=hf.get("intermediate_size", 11008),
            num_layers=hf.get("num_hidden_layers", 32),
            num_heads=hf.get("num_attention_heads", 32),
            num_kv_heads=hf.get("num_key_value_heads", hf.get("num_attention_heads", 32)),
            max_seq_len=hf.get("max_position_embeddings", 2048),
            rms_norm_eps=hf.get("rms_norm_eps", 1e-5),
            rope_theta=hf.get("rope_theta", 10000.0),
            **kw,
        )
    lname = name.lower()
    if "mpt" in lname:
        if "tiny" in lname:  # test-scale MPT: same arch family, tiny dims
            return ModelConfig.tiny(
                arch="mpt", use_alibi=True, tie_embeddings=True,
                mlp_activation="gelu", norm_type="layernorm", **kw,
            )
        return ModelConfig.mpt_1b(**kw)
    if "tiny" in lname:
        return ModelConfig.tiny(**kw)
    return ModelConfig.llama2_7b(**kw)


def build_tokenizer(model_args: ModelArguments, training_args: TrainingArguments) -> TokenizerBundle:
    """Local-path HF tokenizer if available, WordTokenizer otherwise (this
    environment has no network; reference used AutoTokenizer downloads,
    m2t/tokenizer.py:22-38)."""
    path = model_args.model_name_or_path
    import os

    if os.path.isdir(path):
        try:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(
                path, use_fast=False, padding_side="right"
            )
            return TokenizerBundle.from_tokenizer(tok, training_args.model_max_length)
        except Exception as e:  # noqa: BLE001
            log.warning("failed to load HF tokenizer from %s: %s", path, e)
    return TokenizerBundle.from_tokenizer(
        WordTokenizer(training_args.model_max_length)
    )


class PreemptionGuard:
    """SIGTERM/SIGINT -> finish the in-flight step, checkpoint, exit cleanly.

    TPU spot VMs and maintenance events deliver SIGTERM with a grace
    window; the reference's only recovery is the last periodic save
    (SURVEY.md §5). Signal handlers run on the main thread between step
    dispatches, so `triggered` is checked once per step. On multi-host
    runs each host sees its own signal; the saved step may differ by one
    across hosts, and `--resume` restores from the latest COMPLETE orbax
    checkpoint either way."""

    def __init__(self, enabled: bool = True):
        import signal

        self.triggered = False
        self._prev = {}
        if not enabled:
            return
        try:
            for sig in (signal.SIGTERM, signal.SIGINT):
                self._prev[sig] = signal.signal(sig, self._handler)
        except ValueError:  # not on the main thread (tests, notebooks)
            self._prev = {}

    def _handler(self, signum, frame):  # noqa: ARG002
        log.warning("received signal %d; will checkpoint and exit", signum)
        self.triggered = True

    def restore(self):
        import signal

        for sig, prev in self._prev.items():
            signal.signal(sig, prev)


def smoke_test_batch(batch: Dict[str, np.ndarray]) -> None:
    """Log shapes/dtypes of one batch before training
    (reference: m2t/train.py:240-253)."""
    for k, v in batch.items():
        if hasattr(v, "shape"):
            log.info("smoke batch %s: shape=%s dtype=%s", k, v.shape, v.dtype)
    assert batch["input_ids"].ndim == 2
    assert batch["audio_encodings"].ndim == 3


def compute_global_batch(training_args, mesh) -> int:
    """Rows per optimizer step. The batch rides only the (data, fsdp) axes;
    counting the tensor axis would silently inflate the effective batch
    (and per-chip activation memory) by the TP factor."""
    n_batch_shards = mesh.shape[AXES.data] * mesh.shape[AXES.fsdp]
    return (
        training_args.per_device_train_batch_size
        * training_args.gradient_accumulation_steps
        * n_batch_shards
    )


def train(
    model_args: ModelArguments,
    data_args: DataArguments,
    training_args: TrainingArguments,
    *,
    model_cfg: Optional[ModelConfig] = None,
    max_steps_override: Optional[int] = None,
) -> Dict[str, Any]:
    """Run training; returns summary dict (for tests / callers)."""
    if training_args.multihost:
        # TPU pod slice: one process per host; topology comes from the TPU
        # runtime (the reference's torch.distributed.launch + NCCL env is
        # not needed — collectives are emitted by GSPMD over ICI/DCN)
        jax.distributed.initialize()
        log.info(
            "multihost: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
    # INFO on the coordinator, WARNING on followers; handler/propagation
    # setup lives in main() — train() is also a library entry point and must
    # not mutate process-global logging state (it broke pytest's caplog for
    # every test that ran after a train() call)
    logging.getLogger("llark_tpu").setLevel(
        logging.INFO if jax.process_index() == 0 else logging.WARNING
    )
    write_args_to_file([model_args, data_args, training_args], training_args.output_dir)

    cfg = model_cfg or model_config_from_name(
        model_args.model_name_or_path, model_args
    )
    cfg.use_audio_start_end = model_args.mm_use_audio_start_end
    bundle = build_tokenizer(model_args, training_args)
    if cfg.vocab_size < len(bundle.tokenizer):
        cfg.vocab_size = int(np.ceil(len(bundle.tokenizer) / 128) * 128)

    mesh_shape = tuple(training_args.mesh_shape)
    if int(np.prod(mesh_shape)) <= 1:
        mesh_shape = (1, len(jax.devices()), 1)
    if cfg.moe_num_experts > 0 and len(mesh_shape) == 3:
        # MoE partition specs reference the "expert" axis; a 3-value
        # --mesh_shape gets a trailing expert axis of 1 (EP off, experts
        # replicated). Pass 4 values to actually shard experts.
        mesh_shape = mesh_shape + (1,)
    mesh = make_mesh(mesh_shape)

    params = init_llark_params(cfg, jax.random.PRNGKey(training_args.seed))
    if os.path.isdir(model_args.model_name_or_path):
        # local HF checkpoint dir: import backbone weights
        # (reference: from_pretrained load, m2t/train.py:62-75)
        try:
            from llark_tpu.interop.hf import load_pretrained_backbone

            backbone = load_pretrained_backbone(model_args.model_name_or_path, cfg)
            params.update(jax.tree.map(jnp.asarray, backbone))
            log.info("imported HF backbone from %s", model_args.model_name_or_path)
        except FileNotFoundError:
            log.warning(
                "no HF weights under %s; training from random init",
                model_args.model_name_or_path,
            )
    if model_args.pretrain_mm_mlp_adapter:
        params = apply_pretrained_projector(
            params, load_projector_weights(model_args.pretrain_mm_mlp_adapter)
        )
    if training_args.lora_enable:
        from llark_tpu.models.lora import init_lora_params, load_lora_adapter

        if training_args.lora_bias not in ("", "none"):
            raise NotImplementedError(
                "lora_bias != 'none' is not supported (our LoRA has no bias terms)"
            )
        cfg.lora_rank = training_args.lora_r
        cfg.lora_alpha = float(training_args.lora_alpha)
        cfg.lora_dropout = float(training_args.lora_dropout)
        params = init_lora_params(
            cfg, jax.random.PRNGKey(training_args.seed + 1), params
        )
        if training_args.lora_weight_path:
            # warm-start factors from a saved adapter
            # (reference: m2t/llava/train/train.py:90)
            params, meta = load_lora_adapter(training_args.lora_weight_path, params)
            log.info("warm-started LoRA from %s (%s)", training_args.lora_weight_path, meta)
    if training_args.bits in (4, 8):
        # QLoRA-style: quantized frozen base (reference: bnb 4/8-bit,
        # m2t/arguments.py:112-133). Requires a frozen-base mode.
        if not (training_args.lora_enable or model_args.freeze_backbone
                or model_args.tune_mm_mlp_adapter):
            raise ValueError(f"--bits {training_args.bits} requires lora_enable"
                             " / freeze_backbone / tune_mm_mlp_adapter "
                             "(the quantized base is frozen)")
        if training_args.bits == 8:
            from llark_tpu.models.quant import quantize_params_int8_incremental

            params = quantize_params_int8_incremental(cfg, params)
        else:
            # int4 group-wise base: half the frozen-weight HBM of int8
            # (measured slower to DEQUANTIZE per step than int8 — pick 4
            # for capacity, 8 for speed; models/quant.py docstrings)
            from llark_tpu.models.quant import quantize_params_int4_incremental

            # group must divide every fan-in; 128 works for production dims,
            # small test configs scale it down with their hidden size
            params = quantize_params_int4_incremental(
                cfg, params, group=min(128, cfg.hidden_size)
            )
        log.info("quantized frozen base weights to int%d", training_args.bits)
    elif training_args.bits != 16:
        raise ValueError(f"--bits {training_args.bits} unsupported (16/8/4)")

    # write the self-describing metadata only after every cfg mutation
    # (lora_rank/alpha/dropout above) so load_pretrained_model rebuilds the
    # architecture the checkpoint was actually trained with
    from llark_tpu.models.utils import save_model_metadata

    save_model_metadata(training_args.output_dir, cfg, bundle)

    specs = adapt_specs_to_params(param_partition_specs(cfg), params)
    params = shard_params(mesh, params, specs)

    # Reference flag semantics (m2t/train.py:143-164): tune_mm_mlp_adapter
    # alone does NOT freeze the backbone — the run of record
    # (train_llark.sh) sets tune=True freeze=False and trains the full
    # model, with the projector side-saved and original embedding rows
    # detached (trainable_token_start below). Freezing comes only from
    # freeze_backbone, LoRA, or an int8 base (non-differentiable leaves).
    partitioned = (
        model_args.freeze_backbone
        or training_args.lora_enable
        or training_args.bits in (4, 8)
    )
    param_partition = None
    if partitioned:
        from llark_tpu.train.step import ParamPartition, trainable_mask

        mask = trainable_mask(
            params,
            freeze_backbone=model_args.freeze_backbone,
            tune_mm_mlp_adapter=model_args.tune_mm_mlp_adapter,
            lora=training_args.lora_enable,
            freeze_mm_mlp_adapter=training_args.freeze_mm_mlp_adapter,
        )
        param_partition = ParamPartition(params, mask)
    optimizer = make_optimizer(training_args, params)

    def ensure_on_mesh(x):
        """Replicate any leaf not already laid out on this mesh (opt counts,
        step scalars, freshly-restored arrays)."""
        sh = getattr(x, "sharding", None)
        if isinstance(sh, NamedSharding) and sh.mesh == mesh:
            return x
        return jax.device_put(x, NamedSharding(mesh, P()))

    state = jax.tree.map(
        ensure_on_mesh, TrainState.create(params, optimizer, param_partition)
    )

    # trainable_token_start: only the 3 appended audio tokens' embedding rows
    # receive gradients during adapter tuning (reference llamav2.py:176-198)
    trainable_start = (
        len(bundle.tokenizer) - 3 if model_args.tune_mm_mlp_adapter else None
    )

    max_steps = max_steps_override or training_args.max_steps
    train_step = make_train_step(
        cfg,
        optimizer,
        audio_patch_id=bundle.audio_patch_id,
        grad_accum_steps=training_args.gradient_accumulation_steps,
        trainable_token_start=trainable_start,
        dropout_seed=training_args.seed if training_args.lora_enable else None,
        partition=param_partition,
        loss_chunk=training_args.loss_chunk or None,
    )
    step_fn = jax.jit(train_step, donate_argnums=(0,))

    ckpt = CheckpointManager(
        training_args.output_dir,
        save_total_limit=training_args.save_total_limit,
        save_projector=model_args.tune_mm_mlp_adapter,
    )
    start_step = 0
    if training_args.resume:
        restored = ckpt.restore(state)
        if restored is not None:
            state, _ = restored
            state = jax.tree.map(ensure_on_mesh, state)
            start_step = int(state.step)
            log.info("resumed from checkpoint at step %d", start_step)

    global_batch = compute_global_batch(training_args, mesh)
    data_module = make_data_module(
        bundle,
        data_args,
        batch_size=global_batch,
        max_seq_len=training_args.model_max_length,
        mm_hidden_size=cfg.mm_hidden_size,
        seed=training_args.seed,
    )
    # on resume, fast-forward the (deterministic, same-seed) stream so we
    # do not re-train on the first start_step batches (SURVEY §5: restore
    # of data-iterator position)
    iterator = data_module["train_iterator"](skip_batches=start_step)

    shard_for = batch_sharding(mesh)

    def put(batch):
        arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        return jax.tree.map(lambda x: jax.device_put(x, shard_for(x)), arrays)

    # periodic eval-loss pass (reference defaults to evaluation_strategy
    # "no"; enabled here with --eval_steps N + --eval_data_path)
    eval_every = training_args.eval_steps if "eval_iterator" in data_module else 0
    if training_args.eval_steps and "eval_iterator" not in data_module:
        log.warning(
            "--eval_steps %d set but no --eval_data_path given: no eval "
            "pass will run", training_args.eval_steps,
        )
    elif "eval_iterator" in data_module and not training_args.eval_steps:
        log.warning(
            "--eval_data_path given but --eval_steps is 0: no eval pass "
            "will run (set --eval_steps N to enable)",
        )
    eval_fn = None
    if eval_every:
        from llark_tpu.train.step import make_eval_step

        eval_fn = jax.jit(
            make_eval_step(
                cfg,
                audio_patch_id=bundle.audio_patch_id,
                loss_chunk=training_args.loss_chunk or None,
            )
        )

    def _pad_eval_batch(b, target):
        """Pad a partial final eval batch to the fixed global batch shape.
        Pad rows carry labels=IGNORE_INDEX everywhere, so they add exactly
        0 to both loss_sum and num_tokens."""
        from llark_tpu.special_tokens import IGNORE_INDEX

        b = {k: v for k, v in b.items() if isinstance(v, np.ndarray)}
        n = next(iter(b.values())).shape[0]
        if n == target:
            return b
        return {
            k: np.pad(
                v,
                [(0, target - n)] + [(0, 0)] * (v.ndim - 1),
                constant_values=(IGNORE_INDEX if k == "labels" else 0),
            )
            for k, v in b.items()
        }

    # eval materializes the same micro-batch size as a training micro-step:
    # with grad_accum > 1 the train step only ever holds global/accum rows of
    # activations at once, so pushing the full global batch through one
    # forward could OOM configs that rely on accumulation to fit
    accum = max(training_args.gradient_accumulation_steps, 1)
    eval_micro = max(global_batch // accum, 1)

    def run_eval(params) -> float:
        total, tokens = 0.0, 0
        for eb in data_module["eval_iterator"]():
            arrays = {k: v for k, v in eb.items() if isinstance(v, np.ndarray)}
            n = next(iter(arrays.values())).shape[0]
            for lo in range(0, n, eval_micro):
                mb = {k: v[lo:lo + eval_micro] for k, v in arrays.items()}
                m = eval_fn(params, put(_pad_eval_batch(mb, eval_micro)))
                total += float(m["loss_sum"])
                tokens += int(m["num_tokens"])
        return total / max(tokens, 1)

    history = []
    eval_history = []
    t_start = time.time()
    t_prev = t_start
    profiling = False
    guard = PreemptionGuard(training_args.checkpoint_on_preemption)
    preempted = False
    from llark_tpu.train.step import lr_schedule
    from llark_tpu.train.tracking import MetricsWriter

    schedule = lr_schedule(training_args)
    tracker = MetricsWriter(training_args.output_dir, training_args.report_to)
    try:
        with mesh:
            first = True
            for i, batch in enumerate(iterator):
                step_i = start_step + i
                if step_i >= max_steps:
                    break
                if first:
                    smoke_test_batch(batch)
                    first = False
                if training_args.profile_dir and step_i == training_args.profile_start_step:
                    jax.profiler.start_trace(training_args.profile_dir)
                    profiling = True
                state, metrics = step_fn(state, put(batch))
                if profiling and step_i >= (
                    training_args.profile_start_step + training_args.profile_num_steps - 1
                ):
                    jax.tree.map(
                        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
                        metrics,
                    )
                    jax.profiler.stop_trace()
                    profiling = False
                    log.info("wrote profiler trace to %s", training_args.profile_dir)
                if step_i % training_args.logging_steps == 0:
                    loss = float(metrics["loss"])  # device sync
                    if not np.isfinite(loss):
                        # non-finite guard: stop rather than burn steps on a
                        # diverged model (reference has no such guard — SURVEY §5)
                        log.error("non-finite loss %.3f at step %d; aborting", loss, step_i)
                        history.append(loss)
                        break
                    history.append(loss)
                    now = time.time()
                    dt = max(now - t_prev, 1e-9) / max(training_args.logging_steps, 1)
                    t_prev = now
                    log.info(
                        "step %d loss %.4f grad_norm %.3f | %.3f s/step %.0f tok/s",
                        step_i,
                        loss,
                        float(metrics["grad_norm"]),
                        dt,
                        float(metrics["num_tokens"]) / dt,
                    )
                    moe_metrics = {
                        k: float(metrics[k])
                        for k in ("moe_aux_loss", "moe_dropped_frac")
                        if k in metrics
                    }
                    tracker.log(
                        step_i,
                        loss=loss,
                        grad_norm=float(metrics["grad_norm"]),
                        learning_rate=float(schedule(step_i)),
                        step_time_s=dt,
                        tokens_per_s=float(metrics["num_tokens"]) / dt,
                        **moe_metrics,
                    )
                if eval_every and (step_i + 1) % eval_every == 0:
                    ev = run_eval(state.params)
                    eval_history.append((step_i + 1, ev))
                    log.info("step %d eval_loss %.4f", step_i + 1, ev)
                    tracker.log(step_i + 1, eval_loss=ev)
                if (step_i + 1) % training_args.save_steps == 0:
                    ckpt.save(step_i + 1, state, {"seed": training_args.seed, "batches_seen": step_i + 1})
                if guard.triggered:
                    log.warning("preemption: checkpointing at step %d and exiting", step_i + 1)
                    preempted = True
                    break
            if profiling:
                jax.profiler.stop_trace()
    finally:
        # never leak the signal handlers, even on exceptions
        guard.restore()
        tracker.close()

    final_step = int(state.step)
    if final_step > start_step:
        ckpt.save(final_step, state, {"seed": training_args.seed, "batches_seen": final_step})
    ckpt.wait()
    # re-save metadata now that the tokenizer has seen the data: the lazy
    # WordTokenizer interns word ids DURING training, so the pre-training
    # vocab snapshot would reload with different ids than the model was
    # trained on (HF tokenizers are fixed-vocab; re-saving is a no-op there)
    save_model_metadata(training_args.output_dir, cfg, bundle)
    if training_args.lora_enable:
        from llark_tpu.models.lora import save_lora_adapter

        host_params = jax.device_get(state.params)
        save_lora_adapter(
            os.path.join(training_args.output_dir, "adapter"),
            cfg,
            host_params,
            extra_non_lora={"embed": host_params["embed"]},
        )
        log.info("saved LoRA adapter to %s/adapter", training_args.output_dir)
    return {
        "final_step": final_step,
        "losses": history,
        "eval_losses": eval_history,
        "wall_s": time.time() - t_start,
        "state": state,
        "cfg": cfg,
        "bundle": bundle,
        "preempted": preempted,
    }


def main(argv=None):
    # jax import already ran basicConfig; give the package logger its own
    # handler and stop propagation so CLI runs don't print duplicate lines
    # via jax's root handler (CLI-only: library callers keep global state)
    pkg_log = logging.getLogger("llark_tpu")
    pkg_log.propagate = False
    if not pkg_log.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter("[%(asctime)s %(name)s] %(message)s"))
        pkg_log.addHandler(h)
    model_args, data_args, training_args = parse_args(argv)
    train(model_args, data_args, training_args)


if __name__ == "__main__":
    main()
