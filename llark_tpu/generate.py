"""Generation: jitted prefill + decode with a static KV cache.

Replaces the reference's HF `model.generate(...)` +
`KeywordsStoppingCriteria("###")` (reference: m2t/infer.py:146-152,
m2t/generate.py:18-44) with a TPU-native two-graph design:

  * prefill: one jitted multimodal forward over the (padded) prompt that
    fills the KV cache and emits the first sampled token;
  * decode: one jitted single-token step, run in a host loop (or
    lax.while_loop via `generate_while`) against the static cache;
  * stopping: the `###` keyword check runs on host over the decoded ids
    (cheap), exactly mirroring KeywordsStoppingCriteria semantics; EOS
    and max-length also stop.

All shapes are static: prompts are right-padded to a bucket length and
`prompt_lengths` carries the true lengths. Position ids and cache indices
are derived from the true length so padding never pollutes the cache.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llark_tpu.config import ModelConfig
from llark_tpu.models.decoder import init_kv_cache
from llark_tpu.models.fusion import build_inputs_embeds
from llark_tpu.models import decoder as decoder_lib


@dataclasses.dataclass
class GenerationConfig:
    max_new_tokens: int = 256
    temperature: float = 0.0  # 0 => greedy
    top_p: float = 1.0
    top_k: int = 0  # 0 => disabled
    eos_token_id: Optional[int] = None
    stop_text: str = "###"  # reference keyword stop
    decode_chunk: int = 8  # tokens per jitted scan chunk (1 host sync/chunk)


def _sample(logits: jnp.ndarray, cfg: GenerationConfig, key: jax.Array) -> jnp.ndarray:
    """logits [B, V] -> token [B]."""
    if cfg.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / cfg.temperature
    if cfg.top_k > 0:
        k = min(cfg.top_k, logits.shape[-1])  # top_k > vocab degrades to no-op
        kth = jnp.sort(logits, axis=-1)[:, -k, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if cfg.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < cfg.top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def make_prefill_fn(cfg: ModelConfig, audio_patch_id: int, max_cache_len: int):
    """Jittable prefill: (params, input_ids, prompt_lengths, audio, frame_counts)
    -> (next_token_logits [B, V], kv_cache)."""

    def prefill(params, input_ids, prompt_lengths, audio_encodings, audio_frame_counts):
        b, s = input_ids.shape
        inputs_embeds = build_inputs_embeds(
            cfg, params, input_ids, audio_encodings, audio_patch_id, audio_frame_counts
        )
        cache = init_kv_cache(cfg, b, max_cache_len)
        logits, cache = decoder_lib.decoder_forward(
            cfg,
            params,
            inputs_embeds=inputs_embeds,
            seq_lengths=prompt_lengths,
            kv_cache=cache,
            # cache starts empty: attend S x S over the in-flight K/V (Pallas
            # path) instead of S x max_cache_len over the padded cache
            prefill_from_empty=True,
        )
        # logits at the last *real* prompt position of each row
        last = jnp.clip(prompt_lengths - 1, 0, s - 1)
        next_logits = jnp.take_along_axis(
            logits, last[:, None, None], axis=1
        )[:, 0, :]
        # cache index must continue from the true prompt length; cache was
        # filled for the padded region too, but kv_lengths at decode time
        # mask it out per-row via prompt_lengths + generated count.
        return next_logits, cache

    return prefill


def make_prefill_chunk_fn(cfg: ModelConfig):
    """Jittable prefill *continuation*: run one chunk of (already fused)
    prompt embeddings through the decoder, extending the KV cache at its
    current index. Skips the LM head (only the cache matters mid-prompt) —
    used by the server's chunked admission so decode rounds can interleave
    with long-prompt prefills."""

    def chunk(params, embeds, prompt_lengths, cache):
        _, cache = decoder_lib.decoder_forward(
            cfg,
            params,
            inputs_embeds=embeds,
            seq_lengths=prompt_lengths,
            kv_cache=cache,
            return_hidden=True,
        )
        return cache

    return chunk


def make_paged_prefill_chunk_fn(cfg: ModelConfig):
    """Paged counterpart of make_prefill_chunk_fn: run one block-aligned
    chunk of fused prompt embeddings and write its K/V STRAIGHT INTO the
    pool blocks named by the cache's (admission-cropped) block tables —
    no dense bucket cache, no post-prefill block insert. The transient-HBM
    fix for high-slot paged admission (PERFORMANCE.md round 3).

    Contract: `chunk_start` and the chunk length are multiples of the KV
    block size, and cache["block_tables"] rows are each admitted row's
    allocated span (pad rows -> their parking block)."""

    def chunk(params, embeds, prompt_lengths, cache, chunk_start):
        b = embeds.shape[0]
        cpos = jnp.full((b,), chunk_start, jnp.int32)
        _, cache = decoder_lib.decoder_forward(
            cfg,
            params,
            inputs_embeds=embeds,
            seq_lengths=prompt_lengths,
            kv_cache=cache,
            cache_positions=cpos,
            return_hidden=True,
            paged_chunk=True,
        )
        return cache

    return chunk


def make_prefill_last_fn(cfg: ModelConfig, pos_offset: int = 0):
    """Jittable tail of a chunked prefill: re-run each row's LAST fused
    prompt embedding (an idempotent cache rewrite at plen-1) to obtain the
    next-token logits the chunk passes skipped.

    pos_offset (static): absolute cache position of embeds[:, 0] — zero for
    whole-prompt chunking; the block-aligned shared-prefix length when the
    embeds hold only per-request suffixes (paged prefix caching)."""

    def last(params, embeds, prompt_lengths, cache):
        idx = jnp.clip(prompt_lengths - 1, 0, embeds.shape[1] - 1)
        last_embeds = jnp.take_along_axis(embeds, idx[:, None, None], axis=1)
        logits, cache = decoder_lib.decoder_forward(
            cfg,
            params,
            inputs_embeds=last_embeds,
            kv_cache=cache,
            cache_positions=idx + pos_offset,
        )
        return logits[:, 0, :], cache

    return last


def make_prefix_cache_fn(cfg: ModelConfig):
    """Build a b=1 KV cache holding exactly a shared prompt prefix.

    Prefix caching: every LLark request opens with the same conversation
    header (the fixed "A chat between a curious human..." system text of
    conv_v1_2 — reference m2t/llava/conversation.py:237-271), so its KV is
    computed ONCE and admission only prefills the per-request suffix
    (question + audio tokens). The returned cache has length == prefix
    length and index == prefix length; broadcast it into admission caches
    and continue with make_suffix_prefill_fn.
    """

    def build(params, prefix_ids):
        p = prefix_ids.shape[1]
        embeds = decoder_lib.embed_tokens(cfg, params, prefix_ids)
        cache = init_kv_cache(cfg, prefix_ids.shape[0], p)
        _, cache = decoder_lib.decoder_forward(
            cfg,
            params,
            inputs_embeds=embeds,
            seq_lengths=jnp.full((prefix_ids.shape[0],), p, jnp.int32),
            kv_cache=cache,
            prefill_from_empty=True,
            return_hidden=True,  # mid-prompt: only the cache matters
        )
        return cache

    return build


def make_suffix_prefill_fn(cfg: ModelConfig, audio_patch_id: int):
    """Jittable prefill of per-request suffixes over a cache whose first
    `cache["index"]` positions already hold a shared prefix KV (see
    make_prefix_cache_fn). Positions and attention windows are absolute
    (cache-index offset), so with a full-precision cache the result is
    token-identical to one-shot prefill of prefix+suffix; with
    kv_cache_quant the suffix attends the int8-quantized prefix
    (quantization-noise-level difference — same caveat as chunked
    prefill, see BatchedServer._chunked_prefill).

    (params, suffix_ids [B, Ss], suffix_lengths [B], audio, frame_counts,
    cache) -> (next_token_logits [B, V], cache).
    """

    def prefill(
        params, suffix_ids, suffix_lengths, audio_encodings,
        audio_frame_counts, cache,
    ):
        _, s = suffix_ids.shape
        inputs_embeds = build_inputs_embeds(
            cfg, params, suffix_ids, audio_encodings, audio_patch_id,
            audio_frame_counts,
        )
        abs_lengths = suffix_lengths + cache["index"]
        logits, cache = decoder_lib.decoder_forward(
            cfg,
            params,
            inputs_embeds=inputs_embeds,
            seq_lengths=abs_lengths,
            kv_cache=cache,
        )
        last = jnp.clip(suffix_lengths - 1, 0, s - 1)
        next_logits = jnp.take_along_axis(
            logits, last[:, None, None], axis=1
        )[:, 0, :]
        return next_logits, cache

    return prefill


def make_decode_fn(cfg: ModelConfig):
    """Jittable single-token decode step.

    Positions/kv-masking are per-row: row i's new token sits at position
    prompt_lengths[i] + step, and attends to [0, that position].
    """

    def decode(params, token, cache, write_positions):
        """write_positions [B]: absolute cache slot (= true prompt len + step)."""
        inputs_embeds = decoder_lib.embed_tokens(cfg, params, token[:, None])
        logits, new_cache = decoder_lib.decoder_forward(
            cfg,
            params,
            inputs_embeds=inputs_embeds,
            kv_cache=cache,
            cache_positions=write_positions,
        )
        return logits[:, 0, :], new_cache

    return decode


def make_multistep_decode_fn(cfg: ModelConfig, gen_cfg: "GenerationConfig", steps: int):
    """Jittable N-token decode: a lax.scan over single-token steps with
    sampling inside. One program per chunk instead of one per token —
    amortizes dispatch/sync latency (dominant in single-stream serving).

    Returns (tokens [B, steps], last_logits [B, V], cache).
    """
    decode = make_decode_fn(cfg)

    def decode_n(params, token, cache, write_positions, rng):
        def body(carry, _):
            tok, cache, pos, r = carry
            logits, cache = decode(params, tok, cache, pos)
            r, sub = jax.random.split(r)
            nxt = _sample(logits, gen_cfg, sub)
            return (nxt, cache, pos + 1, r), (nxt, logits)

        (token, cache, _, _), (toks, logits_seq) = jax.lax.scan(
            body, (token, cache, write_positions, rng), None, length=steps
        )
        return toks.T, logits_seq[-1], cache  # [B, steps]

    return decode_n


class Generator:
    """Stateful convenience wrapper: compiles prefill/decode once per shape."""

    def __init__(
        self,
        cfg: ModelConfig,
        params,
        audio_patch_id: int,
        gen_cfg: Optional[GenerationConfig] = None,
        max_cache_len: int = 2048,
    ):
        self.cfg = cfg
        self.params = params
        self.gen_cfg = gen_cfg or GenerationConfig()
        self.audio_patch_id = audio_patch_id
        self.max_cache_len = max_cache_len
        self._prefill = jax.jit(make_prefill_fn(cfg, audio_patch_id, max_cache_len))
        self._decode = jax.jit(make_decode_fn(cfg))
        self._decode_n: dict = {}  # chunk length -> jitted scan program

    def _get_decode_n(self, n: int):
        if n not in self._decode_n:
            self._decode_n[n] = jax.jit(
                make_multistep_decode_fn(self.cfg, self.gen_cfg, n)
            )
        return self._decode_n[n]

    def generate(
        self,
        input_ids: np.ndarray,  # [B, S] right-padded
        prompt_lengths: np.ndarray,  # [B]
        audio_encodings: Optional[np.ndarray] = None,  # [B, T, mm]
        audio_frame_counts: Optional[np.ndarray] = None,
        tokenizer=None,  # optional: enables "###" text stopping
        rng: Optional[jax.Array] = None,
    ) -> List[List[int]]:
        """Generate per-row token lists (without the prompt)."""
        gen_cfg = self.gen_cfg
        b, s = input_ids.shape
        if s + gen_cfg.max_new_tokens > self.max_cache_len:
            raise ValueError("prompt + max_new_tokens exceeds cache length")
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if audio_encodings is None:
            audio_encodings = np.zeros((b, 1, self.cfg.mm_hidden_size), np.float32)
            audio_frame_counts = np.zeros((b,), np.int32)
        if audio_frame_counts is None:
            audio_frame_counts = np.full((b,), audio_encodings.shape[1], np.int32)

        prompt_lengths = jnp.asarray(prompt_lengths, jnp.int32)
        logits, cache = self._prefill(
            self.params,
            jnp.asarray(input_ids),
            prompt_lengths,
            jnp.asarray(audio_encodings),
            jnp.asarray(audio_frame_counts),
        )
        # Prefill wrote [0, s) including pad slots; decode overwrites pad
        # slots per-row: row i's token at step t lives at prompt_len[i] + t,
        # and its kv window is [0, prompt_len[i] + t + 1).
        done = np.zeros((b,), bool)
        out: List[List[int]] = [[] for _ in range(b)]
        eos = gen_cfg.eos_token_id
        stop_text = gen_cfg.stop_text

        def absorb(tok_col: np.ndarray) -> None:
            for i in range(b):
                if not done[i]:
                    t = int(tok_col[i])
                    if eos is not None and t == eos:
                        done[i] = True
                        continue
                    out[i].append(t)
                    if stop_text and tokenizer is not None:
                        tail = tokenizer.decode(out[i][-8:])
                        if stop_text in tail:
                            done[i] = True

        # chunked decode: one jitted scan program + ONE host sync per chunk
        # (a per-token sync costs a full host<->device round trip each step)
        token = _sample(logits, gen_cfg, rng)
        absorb(np.asarray(token))
        emitted = 1
        chunk = max(1, int(gen_cfg.decode_chunk))
        while emitted < gen_cfg.max_new_tokens and not done.all():
            n = min(chunk, gen_cfg.max_new_tokens - emitted)
            rng, sub = jax.random.split(rng)
            toks, _last_logits, cache = self._get_decode_n(n)(
                self.params, token, cache, prompt_lengths + (emitted - 1), sub
            )
            tok_np = np.asarray(toks)  # [B, n] — the chunk's only transfer
            for j in range(n):
                absorb(tok_np[:, j])
                if done.all():
                    break
            token = toks[:, -1]
            emitted += n

        if stop_text and tokenizer is not None:
            out = [self._trim_stop(ids, tokenizer, stop_text) for ids in out]
        return out

    @staticmethod
    def _trim_stop(ids: List[int], tokenizer, stop_text: str) -> List[int]:
        """Drop a trailing stop keyword from the decoded suffix
        (reference: KeywordsStoppingCriteria + response trimming)."""
        while ids and stop_text in tokenizer.decode(ids[-4:]):
            ids = ids[:-1]
        return ids
