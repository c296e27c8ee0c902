"""Optimizer factory + jitted, mesh-sharded train step.

Equivalent of the reference's HF-Trainer inner loop + DDP all-reduce
(reference: m2t/train.py:255-260 and SURVEY.md §3.1), rebuilt TPU-first:

  * one jitted step = grad-accum microbatch scan -> grad -> optax update,
    gradient all-reduce / reduce-scatter emitted by GSPMD from shardings;
  * parameter freezing (freeze_backbone / tune_mm_mlp_adapter,
    reference m2t/train.py:79-106,143-164) via optax.masked — frozen
    subtrees get zero updates and no optimizer-state memory;
  * lr schedule: linear warmup + cosine decay
    (reference scripts/training/train_llark.sh:24-44).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from llark_tpu.config import ModelConfig, TrainingArguments
from llark_tpu.models.fusion import causal_lm_loss, llark_forward
from llark_tpu.train.state import TrainState


def lr_schedule(args: TrainingArguments) -> optax.Schedule:
    """HF lr_scheduler_type semantics: warmup to peak, then decay.
    cosine/linear decay to 0; 'constant'/'constant_with_warmup' hold peak."""
    warmup = max(1, int(args.max_steps * args.warmup_ratio))
    decay = max(args.max_steps - warmup, 1)
    if args.lr_scheduler_type == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=args.learning_rate,
            warmup_steps=warmup,
            decay_steps=max(args.max_steps, warmup + 1),
            end_value=0.0,
        )
    if args.lr_scheduler_type == "linear":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, args.learning_rate, warmup),
                optax.linear_schedule(args.learning_rate, 0.0, decay),
            ],
            boundaries=[warmup],
        )
    if args.lr_scheduler_type in ("constant", "constant_with_warmup"):
        w = warmup if args.lr_scheduler_type == "constant_with_warmup" else 1
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, args.learning_rate, w),
                optax.constant_schedule(args.learning_rate),
            ],
            boundaries=[w],
        )
    raise ValueError(
        f"unknown lr_scheduler_type {args.lr_scheduler_type!r}; "
        "use cosine | linear | constant | constant_with_warmup"
    )


def trainable_mask(
    params: Dict[str, Any],
    *,
    freeze_backbone: bool = False,
    tune_mm_mlp_adapter: bool = False,
    lora: bool = False,
    freeze_mm_mlp_adapter: bool = False,
) -> Dict[str, Any]:
    """True = trainable. Reached only when something freezes (the trainer
    partitions for freeze_backbone / LoRA / int8 base; tune_mm_mlp_adapter
    ALONE trains the full model, reference m2t/train.py:143-164).
    Adapter stage (frozen or int8 backbone + tune flag) trains
    mm_projector + embed (new-token rows gated inside the model by
    trainable_token_start). LoRA stage trains the low-rank factors +
    projector + embed (the reference's adapter + non_lora_trainables
    split, m2t/train.py:264-273). freeze_mm_mlp_adapter pins the
    projector (reference m2t/llava/train/train.py:68)."""

    def mask_entry(path_key: str, subtree):
        if path_key == "mm_projector":
            return jax.tree.map(lambda _: not freeze_mm_mlp_adapter, subtree)
        if lora:
            if path_key == "layers":
                return {
                    k: jax.tree.map(lambda _: "_lora_" in k, v)  # noqa: B023
                    for k, v in subtree.items()
                }
            trainable = path_key == "embed"
        elif tune_mm_mlp_adapter:
            # adapter stage: projector + embedding table (new-token rows
            # gated by trainable_token_start's stop_gradient in the model)
            trainable = path_key == "embed"
        elif freeze_backbone:
            trainable = False
        else:
            trainable = True
        return jax.tree.map(lambda _: trainable, subtree)

    return {k: mask_entry(k, v) for k, v in params.items()}


class ParamPartition:
    """Static index split of a param pytree into trainable/frozen leaves.

    Gradients are taken ONLY over the trainable leaf list — required for
    QLoRA (int8 base weights are not differentiable) and avoids
    materializing full-size zero gradients + optimizer state for frozen
    7B weights during adapter/LoRA stages."""

    def __init__(self, params, mask):
        leaves, self.treedef = jax.tree.flatten(params)
        mask_leaves, mask_def = jax.tree.flatten(mask)
        if len(mask_leaves) != len(leaves):
            raise ValueError("mask structure does not match params")
        self.train_idx = tuple(
            i for i, m in enumerate(mask_leaves) if bool(m)
        )

    def trainable(self, params):
        leaves = jax.tree.flatten(params)[0]
        return [leaves[i] for i in self.train_idx]

    def rebuild(self, params, train_leaves):
        leaves = list(jax.tree.flatten(params)[0])
        for j, i in enumerate(self.train_idx):
            leaves[i] = train_leaves[j]
        return jax.tree.unflatten(self.treedef, leaves)


def make_optimizer(
    args: TrainingArguments,
    params: Dict[str, Any],
    *,
    freeze_backbone: bool = False,
    tune_mm_mlp_adapter: bool = False,
    lora: bool = False,
) -> optax.GradientTransformation:
    schedule = lr_schedule(args)
    core = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(
            schedule,
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=args.weight_decay,
        ),
    )
    if freeze_backbone or tune_mm_mlp_adapter or lora:
        mask = trainable_mask(
            params,
            freeze_backbone=freeze_backbone,
            tune_mm_mlp_adapter=tune_mm_mlp_adapter,
            lora=lora,
        )
        labels = jax.tree.map(lambda m: "train" if m else "freeze", mask)
        # frozen leaves get zero updates (optax.masked would pass raw grads
        # through unchanged, silently un-freezing them)
        return optax.multi_transform(
            {"train": core, "freeze": optax.set_to_zero()}, labels
        )
    return core


def make_train_step(
    cfg: ModelConfig,
    optimizer: optax.GradientTransformation,
    *,
    audio_patch_id: int,
    grad_accum_steps: int = 1,
    trainable_token_start: Optional[int] = None,
    dropout_seed: Optional[int] = None,  # enables LoRA dropout when set
    partition: Optional["ParamPartition"] = None,  # grad over trainable only
    loss_chunk: Optional[int] = None,  # chunked CE (long-context memory)
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the (jittable) train step.

    Batch contract (all static shapes):
      input_ids          int32  [B, S]
      labels             int32  [B, S]
      seq_lengths        int32  [B]
      audio_encodings    f32/bf16 [B, T, mm_hidden]
      audio_frame_counts int32  [B]
    with B = grad_accum_steps * micro_batch.
    """

    def loss_fn(params, micro, rng):
        out, extras = llark_forward(
            cfg,
            params,
            micro["input_ids"],
            audio_encodings=micro.get("audio_encodings"),
            audio_patch_id=audio_patch_id,
            audio_frame_counts=micro.get("audio_frame_counts"),
            seq_lengths=micro.get("seq_lengths"),
            trainable_token_start=trainable_token_start,
            dropout_rng=rng,
            return_hidden=loss_chunk is not None,
        )
        if loss_chunk is not None:
            from llark_tpu.models.fusion import chunked_causal_lm_loss

            loss, n_tok = chunked_causal_lm_loss(
                cfg, params, out, micro["labels"], loss_chunk,
                trainable_token_start=trainable_token_start,
            )
        else:
            loss, n_tok = causal_lm_loss(out, micro["labels"])
        aux_metrics = {}
        if cfg.moe_num_experts > 0 and isinstance(extras, dict):
            loss = loss + cfg.moe_aux_loss_weight * extras["moe_aux_loss"]
            # surfaced as per-step metrics (observability: tracking.py)
            aux_metrics = {
                "moe_aux_loss": extras["moe_aux_loss"],
                "moe_dropped_frac": extras["moe_dropped_frac"],
            }
        return loss, (n_tok, aux_metrics)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    use_dropout = dropout_seed is not None and cfg.lora_dropout > 0.0

    def accumulate(g_fn, leaves, batch, rng):
        """(loss, n_tok, aux_metrics, grads) for g_fn(leaves, micro, rng),
        averaged over grad_accum_steps micro-batches inside a lax.scan (one
        shared implementation for the plain and partitioned paths)."""
        if grad_accum_steps <= 1:
            (loss, (n_tok, am)), grads = g_fn(leaves, batch, rng)
            return loss, n_tok, am, grads

        def reshape(x):
            return x.reshape(
                (grad_accum_steps, x.shape[0] // grad_accum_steps) + x.shape[1:]
            )

        micro_batches = jax.tree.map(reshape, batch)
        # aux-metrics structure is static: MoE surfaces two fp32 scalars
        am_zeros = (
            {"moe_aux_loss": jnp.float32(0.0), "moe_dropped_frac": jnp.float32(0.0)}
            if cfg.moe_num_experts > 0
            else {}
        )

        def accum(carry, xs):
            g_acc, loss_acc, tok_acc, am_acc, i = carry
            mrng = jax.random.fold_in(rng, i) if rng is not None else None
            (loss, (n_tok, am)), g = g_fn(leaves, xs, mrng)
            g_acc = jax.tree.map(jnp.add, g_acc, g)
            am_acc = jax.tree.map(jnp.add, am_acc, am)
            return (g_acc, loss_acc + loss, tok_acc + n_tok, am_acc, i + 1), None

        zeros = jax.tree.map(jnp.zeros_like, leaves)
        (g_sum, loss_sum, tok_sum, am_sum, _), _ = jax.lax.scan(
            accum,
            (zeros, 0.0, jnp.zeros((), jnp.int32), am_zeros, jnp.zeros((), jnp.int32)),
            micro_batches,
        )
        grads = jax.tree.map(lambda g: g / grad_accum_steps, g_sum)
        am = jax.tree.map(lambda a: a / grad_accum_steps, am_sum)
        return loss_sum / grad_accum_steps, tok_sum, am, grads

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        rng = (
            jax.random.fold_in(jax.random.PRNGKey(dropout_seed), state.step)
            if use_dropout
            else None
        )
        if partition is not None:
            return _partitioned_step(state, batch, rng)
        loss, n_tok, am, grads = accumulate(grad_fn, state.params, batch, rng)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params, opt_state=new_opt_state, step=state.step + 1
        )
        grad_norm = optax.global_norm(grads)
        metrics = {"loss": loss, "num_tokens": n_tok, "grad_norm": grad_norm, **am}
        return new_state, metrics

    def _partitioned_step(state: TrainState, batch, rng):
        """Differentiate only the trainable leaf list (QLoRA-safe: frozen
        int8 leaves never enter the grad)."""
        train_leaves = partition.trainable(state.params)

        def part_loss(tl, micro, mrng):
            params = partition.rebuild(state.params, tl)
            return loss_fn(params, micro, mrng)

        part_grad = jax.value_and_grad(part_loss, has_aux=True)
        loss, n_tok, am, grads = accumulate(part_grad, train_leaves, batch, rng)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, train_leaves)
        new_train = optax.apply_updates(train_leaves, updates)
        new_params = partition.rebuild(state.params, new_train)
        new_state = state.replace(
            params=new_params, opt_state=new_opt_state, step=state.step + 1
        )
        metrics = {
            "loss": loss,
            "num_tokens": n_tok,
            "grad_norm": optax.global_norm(grads),
            **am,
        }
        return new_state, metrics

    return train_step


def jit_train_step(
    train_step,
    mesh,
    state_shardings,
    batch_shardings,
):
    """jit with explicit in/out shardings and donated state."""
    return jax.jit(
        train_step,
        in_shardings=(state_shardings, batch_shardings),
        out_shardings=(state_shardings, None),
        donate_argnums=(0,),
    )


def make_eval_step(
    cfg: ModelConfig,
    *,
    audio_patch_id: int,
    loss_chunk: Optional[int] = None,
) -> Callable[[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]], Dict[str, jnp.ndarray]]:
    """Loss-only forward over one eval batch (no grads, no dropout).
    Same batch contract as make_train_step; returns summed loss*tokens and
    token count so the caller can average across batches exactly."""

    def eval_step(params, batch):
        out, _ = llark_forward(
            cfg,
            params,
            batch["input_ids"],
            audio_encodings=batch.get("audio_encodings"),
            audio_patch_id=audio_patch_id,
            audio_frame_counts=batch.get("audio_frame_counts"),
            seq_lengths=batch.get("seq_lengths"),
            return_hidden=loss_chunk is not None,
        )
        if loss_chunk is not None:
            from llark_tpu.models.fusion import chunked_causal_lm_loss

            loss, n_tok = chunked_causal_lm_loss(
                cfg, params, out, batch["labels"], loss_chunk
            )
        else:
            loss, n_tok = causal_lm_loss(out, batch["labels"])
        return {"loss_sum": loss * n_tok, "num_tokens": n_tok}

    return eval_step
