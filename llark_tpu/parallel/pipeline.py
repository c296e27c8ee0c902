"""Pipeline parallelism: the decoder's stacked layers over a "pipe" mesh axis.

TPU-native collective pipelining (GPipe schedule) for the scanned decoder.
The layer-stacked parameter layout ([L, ...] arrays, models/decoder.py)
shards DIRECTLY over the pipe axis — stage s holds layers
[s*L/P, (s+1)*L/P) as its local slab — and activations rotate
stage-to-stage with `lax.ppermute` inside one `jax.shard_map`ped program:
the whole schedule compiles to a single XLA executable whose transfers
ride ICI, with no host orchestration and no per-stage dispatch.

The reference has no pipeline story (4-GPU DDP fits its 7B in memory;
SURVEY.md §2.8 lists PP as absent) — this is a beyond-reference scaling
feature for deeper-than-HBM configs, complementing the fsdp/tensor axes
in parallel/mesh.py. Composes with DP on a ("data", "pipe") mesh.

Schedule: M microbatches through P stages take M + P - 1 ticks
(bubble fraction (P-1)/(M+P-1)); each tick every stage runs its slab on
the activation it holds and ppermutes the result to its right neighbor.
Stage 0 ingests embedded microbatch t at tick t; the last stage finishes
microbatch m at tick m + P - 1, so the stacked tick outputs' tail is
exactly the pipeline output. Backward is the automatic transpose
(ppermute reverses direction), i.e. the GPipe backward schedule;
per-layer `jax.checkpoint` (cfg.remat) bounds activation memory.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from llark_tpu.config import ModelConfig
from llark_tpu.models.decoder import _layer_forward, _norm, compute_logits
from llark_tpu.models.fusion import build_inputs_embeds, causal_lm_loss
from llark_tpu.ops.attention import alibi_slopes
from llark_tpu.train.state import TrainState

DATA_AXIS = "data"
PIPE_AXIS = "pipe"


def make_pp_mesh(n_data: int, n_pipe: int, devices=None) -> Mesh:
    """A ("data", "pipe") mesh. Keep "pipe" on the minor (fastest-wrapping)
    axis so neighbor ppermutes map to adjacent chips on the ICI torus."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data * n_pipe != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_pipe} does not match {len(devices)} devices"
        )
    return Mesh(
        np.asarray(devices).reshape(n_data, n_pipe), (DATA_AXIS, PIPE_AXIS)
    )


def pp_param_specs(cfg: ModelConfig, multimodal: bool = True) -> Dict[str, Any]:
    """PartitionSpecs: stacked layer arrays over "pipe" (dim 0 = L);
    embed / head / norms / projector replicated (they run on every
    device under the data axis — psum-free since batch is DP-sharded)."""
    layer_spec: Any = jax.tree.map(lambda _: P(PIPE_AXIS), _layer_leaf_probe(cfg))
    specs: Dict[str, Any] = {
        "embed": P(),
        "layers": layer_spec,
        "final_norm_scale": P(),
    }
    if cfg.norm_type == "layernorm":
        specs["final_norm_bias"] = P()
    if not cfg.tie_embeddings:
        specs["lm_head"] = P()
    if multimodal:
        specs["mm_projector"] = {"kernel": P(), "bias": P()}
    return specs


def _layer_leaf_probe(cfg: ModelConfig):
    """Abstract layer tree (keys only) so pp_param_specs can mirror it
    without materializing parameters."""
    from llark_tpu.models.decoder import init_decoder_params

    shapes = jax.eval_shape(
        lambda k: init_decoder_params(cfg, k), jax.random.PRNGKey(0)
    )
    return shapes["layers"]


def pp_param_shardings(mesh: Mesh, cfg: ModelConfig, multimodal: bool = True):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        pp_param_specs(cfg, multimodal),
        is_leaf=lambda x: isinstance(x, P),
    )


def make_pipeline_layers_fn(
    cfg: ModelConfig,
    mesh: Mesh,
    n_microbatches: int,
) -> Callable[[Any, jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """(stacked_layers, x [B,S,H], positions [B,S], seq_lengths [B]) ->
    hidden [B,S,H], the decoder layer stack pipelined over PIPE_AXIS with
    batch data-parallel over DATA_AXIS. Full-sequence training only (no
    KV cache — prefill/decode latency wants tensor, not pipeline,
    parallelism)."""
    n_pipe = mesh.shape[PIPE_AXIS]
    M = n_microbatches
    slopes = alibi_slopes(cfg.num_heads) if cfg.use_alibi else None
    if cfg.num_layers % n_pipe:
        raise ValueError(
            f"num_layers {cfg.num_layers} not divisible by pipe={n_pipe}"
        )

    def stage_stack(layers, h, pos, lens):
        def body(carry, lp):
            out, *_ = _layer_forward(
                cfg, lp, carry, pos, lens, slopes,
                None, None, None, None, None, None,
            )
            return out, None

        if cfg.remat:
            body = jax.checkpoint(body, prevent_cse=False)
        h, _ = jax.lax.scan(body, h, layers)
        return h

    def pipelined(layers, x, positions, seq_lengths):
        # local views: layers [L/P, ...], x [B_loc, S, H] (replicated over
        # pipe), positions [B_loc, S], seq_lengths [B_loc]
        stage = jax.lax.axis_index(PIPE_AXIS)
        bl, s, hdim = x.shape
        if bl % M:
            raise ValueError(
                f"per-data-shard batch {bl} not divisible by {M} microbatches"
            )
        mb = bl // M
        x_mb = x.reshape(M, mb, s, hdim)
        pos_mb = positions.reshape(M, mb, s)
        len_mb = seq_lengths.reshape(M, mb)
        ring = [(i, (i + 1) % n_pipe) for i in range(n_pipe)]

        def tick(buf, t):
            # stage 0 ingests microbatch t; others take the ppermuted buffer
            feed = jax.lax.dynamic_index_in_dim(
                x_mb, jnp.clip(t, 0, M - 1), 0, keepdims=False
            )
            inp = jnp.where(stage == 0, feed, buf)
            # stage s processes microbatch (t - s) this tick
            meta = jnp.clip(t - stage, 0, M - 1)
            h = stage_stack(
                layers,
                inp,
                jax.lax.dynamic_index_in_dim(pos_mb, meta, 0, keepdims=False),
                jax.lax.dynamic_index_in_dim(len_mb, meta, 0, keepdims=False),
            )
            return jax.lax.ppermute(h, PIPE_AXIS, ring), h

        buf0 = jnp.zeros((mb, s, hdim), x.dtype)
        _, hs = jax.lax.scan(tick, buf0, jnp.arange(M + n_pipe - 1))
        # the last stage emits completed microbatch m at tick m + P - 1:
        # its tick-output tail IS the pipeline output. Other stages' tails
        # are in-flight garbage — mask them out and psum to replicate.
        outs = hs[n_pipe - 1 :]  # [M, mb, S, H] (static slice)
        outs = jnp.where(stage == n_pipe - 1, outs, jnp.zeros_like(outs))
        outs = jax.lax.psum(outs, PIPE_AXIS)
        return outs.reshape(bl, s, hdim)

    layer_specs = jax.tree.map(lambda _: P(PIPE_AXIS), _layer_leaf_probe(cfg))
    return jax.shard_map(
        pipelined,
        mesh=mesh,
        in_specs=(
            layer_specs,
            P(DATA_AXIS, None, None),
            P(DATA_AXIS, None),
            P(DATA_AXIS),
        ),
        out_specs=P(DATA_AXIS, None, None),
        check_vma=False,
    )


def make_pp_train_step(
    cfg: ModelConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    *,
    n_microbatches: int,
    audio_patch_id: int,
    trainable_token_start: Optional[int] = None,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Full multimodal train step with the layer stack pipelined.

    Embedding/fusion and the LM head + loss run under plain GSPMD (data
    parallel, they are a sliver of the FLOPs); only the layer stack —
    where the depth lives — runs through the shard_map pipeline. Batch
    contract matches train/step.py's make_train_step.
    """
    pipeline = make_pipeline_layers_fn(cfg, mesh, n_microbatches)

    def loss_fn(params, batch):
        embeds = build_inputs_embeds(
            cfg,
            params,
            batch["input_ids"],
            batch.get("audio_encodings"),
            audio_patch_id,
            batch.get("audio_frame_counts"),
            trainable_token_start,
        )
        x = embeds.astype(jnp.dtype(cfg.dtype))
        b, s, _ = x.shape
        positions = jnp.broadcast_to(
            jnp.arange(s, dtype=jnp.int32)[None, :], (b, s)
        )
        hidden = pipeline(
            params["layers"], x, positions, batch["seq_lengths"]
        )
        hidden = _norm(
            cfg, hidden, params["final_norm_scale"], params.get("final_norm_bias")
        )
        logits = compute_logits(cfg, params, hidden, trainable_token_start)
        loss, n_tok = causal_lm_loss(logits, batch["labels"])
        return loss, n_tok

    def train_step(state: TrainState, batch):
        (loss, n_tok), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params, opt_state=new_opt, step=state.step + 1
        )
        metrics = {
            "loss": loss,
            "num_tokens": n_tok,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    return train_step
