"""LLark multimodal model: audio projector + vectorized splice + decoder.

The reference fuses audio by a per-example Python loop that concatenates
embedding segments around `<audio_start>` (reference: m2t/models/llamav2.py
:95-234, m2t/models/mpt.py:118-246). That is unjittable and O(batch) on the
host. Here the splice is a fully vectorized masked gather:

  patch_mask[b, s] = input_ids[b, s] == audio_patch_id
  frame_idx[b, s]  = cumsum(patch_mask)[b, s] - 1        (clipped)
  embeds[b, s]     = patch_mask ? projected_audio[b, frame_idx] : token_embed

which is equivalent because, by data-pipeline construction, patch tokens of
an example appear in order, and is a handful of fused VPU ops under jit.
Supports multiple audio segments per row sharing one frame buffer, rows
without audio, and the no-patch decode path for free.

The "tune only new token embeddings" trick (reference llamav2.py:176-198
detaches original-vocab embedding rows) becomes a stop_gradient over the
original-vocab rows of the embedding table.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from llark_tpu.config import ModelConfig
from llark_tpu.models.decoder import (
    compute_logits,
    decoder_forward,
    init_decoder_params,
)
from llark_tpu.special_tokens import IGNORE_INDEX

Params = Dict[str, Any]


def init_llark_params(cfg: ModelConfig, key: jax.Array) -> Params:
    """Decoder params + the single-linear multimodal projector
    (reference: m2t/models/llamav2.py:60-93 `initialize_adapter_modules`)."""
    k1, k2 = jax.random.split(key)
    params = init_decoder_params(cfg, k1)
    pdt = jnp.dtype(cfg.param_dtype)
    scale = 1.0 / jnp.sqrt(jnp.float32(cfg.mm_hidden_size))
    params["mm_projector"] = {
        "kernel": (
            jax.random.normal(k2, (cfg.mm_hidden_size, cfg.hidden_size), jnp.float32)
            * scale
        ).astype(pdt),
        "bias": jnp.zeros((cfg.hidden_size,), pdt),
    }
    return params


def project_audio(cfg: ModelConfig, params: Params, audio_encodings: jnp.ndarray) -> jnp.ndarray:
    """[B, T, mm_hidden] -> [B, T, hidden] in compute dtype."""
    dtype = jnp.dtype(cfg.dtype)
    w = params["mm_projector"]["kernel"].astype(dtype)
    b = params["mm_projector"]["bias"].astype(dtype)
    y = (
        jnp.einsum(
            "btm,mh->bth",
            audio_encodings.astype(dtype),
            w,
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        + b
    )
    return y


def splice_audio_embeddings(
    token_embeds: jnp.ndarray,  # [B, S, H]
    audio_embeds: jnp.ndarray,  # [B, T, H]
    input_ids: jnp.ndarray,  # [B, S]
    audio_patch_id: int,
    audio_frame_counts: Optional[jnp.ndarray] = None,  # [B] valid frames per row
) -> jnp.ndarray:
    """Vectorized replacement of `<audio_patch>` embedding slots with
    projected audio frames."""
    patch_mask = input_ids == audio_patch_id  # [B, S]
    frame_idx = jnp.cumsum(patch_mask.astype(jnp.int32), axis=1) - 1
    frame_idx = jnp.clip(frame_idx, 0, audio_embeds.shape[1] - 1)
    gathered = jnp.take_along_axis(audio_embeds, frame_idx[..., None], axis=1)
    if audio_frame_counts is not None:
        # guard: patch slots beyond a row's frame count keep the token embed
        in_range = frame_idx < audio_frame_counts[:, None]
        patch_mask = patch_mask & in_range
    return jnp.where(patch_mask[..., None], gathered.astype(token_embeds.dtype), token_embeds)


def build_inputs_embeds(
    cfg: ModelConfig,
    params: Params,
    input_ids: jnp.ndarray,
    audio_encodings: Optional[jnp.ndarray],
    audio_patch_id: int,
    audio_frame_counts: Optional[jnp.ndarray] = None,
    trainable_token_start: Optional[int] = None,
) -> jnp.ndarray:
    """Token embeddings with audio frames spliced in at patch positions."""
    embed_table = params["embed"]
    if trainable_token_start is not None:
        row_trainable = (
            jnp.arange(embed_table.shape[0]) >= trainable_token_start
        )[:, None]
        embed_table = jnp.where(
            row_trainable, embed_table, jax.lax.stop_gradient(embed_table)
        )
    dtype = jnp.dtype(cfg.dtype)
    token_embeds = jnp.take(embed_table, input_ids, axis=0).astype(dtype)
    if audio_encodings is None:
        return token_embeds
    audio_embeds = project_audio(cfg, params, audio_encodings)
    return splice_audio_embeddings(
        token_embeds, audio_embeds, input_ids, audio_patch_id, audio_frame_counts
    )


def llark_forward(
    cfg: ModelConfig,
    params: Params,
    input_ids: jnp.ndarray,  # [B, S]
    *,
    audio_encodings: Optional[jnp.ndarray] = None,  # [B, T, mm_hidden]
    audio_patch_id: int,
    audio_frame_counts: Optional[jnp.ndarray] = None,
    seq_lengths: Optional[jnp.ndarray] = None,
    kv_cache: Optional[Params] = None,
    trainable_token_start: Optional[int] = None,
    return_hidden: bool = False,
    dropout_rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, Optional[Params]]:
    """Full multimodal forward (reference: WrappedLlamav2ForCausalLM.forward)."""
    inputs_embeds = build_inputs_embeds(
        cfg,
        params,
        input_ids,
        audio_encodings,
        audio_patch_id,
        audio_frame_counts,
        trainable_token_start,
    )
    return decoder_forward(
        cfg,
        params,
        inputs_embeds=inputs_embeds,
        seq_lengths=seq_lengths,
        kv_cache=kv_cache,
        return_hidden=return_hidden,
        dropout_rng=dropout_rng,
        trainable_token_start=trainable_token_start,
    )


def causal_lm_loss(
    logits: jnp.ndarray,  # [B, S, V] (fp32 from compute_logits)
    labels: jnp.ndarray,  # [B, S] with IGNORE_INDEX on masked positions
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shift-by-one cross-entropy ignoring IGNORE_INDEX
    (reference: m2t/models/llamav2.py:314-325). Returns (loss, num_tokens)."""
    shift_logits = logits[:, :-1, :].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    logprobs = jax.nn.log_softmax(shift_logits, axis=-1)
    token_ll = jnp.take_along_axis(logprobs, safe_labels[..., None], axis=-1)[..., 0]
    num = jnp.maximum(jnp.sum(valid), 1)
    loss = -jnp.sum(jnp.where(valid, token_ll, 0.0)) / num
    return loss, jnp.sum(valid)


def chunked_causal_lm_loss(
    cfg: ModelConfig,
    params: Params,
    hidden: jnp.ndarray,  # [B, S, H] final decoder hidden states
    labels: jnp.ndarray,  # [B, S]
    chunk: int = 512,
    trainable_token_start: Optional[int] = None,  # tied-LM-head freeze boundary
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """causal_lm_loss without ever materializing the [B, S, V] logits:
    the LM head + log-softmax run per sequence chunk inside a remat'd
    lax.scan (logits recomputed in the backward pass). Long-context
    training (un-pooled 345 Hz audio, S ~ 9k, V 32k) OOMs otherwise —
    full-sequence fp32 logits alone are S*V*4 ≈ 1.2 GB plus gradients."""
    b, s, h = hidden.shape
    if s % chunk:
        raise ValueError(f"sequence {s} must divide loss chunk {chunk}")
    n = s // chunk
    # next-token targets aligned to each position; final position ignored
    next_labels = jnp.concatenate(
        [labels[:, 1:], jnp.full((b, 1), IGNORE_INDEX, labels.dtype)], axis=1
    )
    hidden_c = hidden.reshape(b, n, chunk, h).transpose(1, 0, 2, 3)  # [n,B,c,H]
    labels_c = next_labels.reshape(b, n, chunk).transpose(1, 0, 2)  # [n,B,c]

    def body(carry, xs):
        ll_sum, n_valid = carry
        h_c, y_c = xs
        logits = compute_logits(cfg, params, h_c, trainable_token_start).astype(jnp.float32)
        valid = y_c != IGNORE_INDEX
        safe = jnp.where(valid, y_c, 0)
        lp = jax.nn.log_softmax(logits, axis=-1)
        tok = jnp.take_along_axis(lp, safe[..., None], axis=-1)[..., 0]
        ll_sum = ll_sum + jnp.sum(jnp.where(valid, tok, 0.0))
        n_valid = n_valid + jnp.sum(valid)
        return (ll_sum, n_valid), None

    (ll_sum, n_valid), _ = jax.lax.scan(
        jax.checkpoint(body, prevent_cse=False),
        (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)),
        (hidden_c, labels_c),
    )
    loss = -ll_sum / jnp.maximum(n_valid, 1)
    return loss, n_valid
