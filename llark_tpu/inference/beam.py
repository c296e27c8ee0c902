"""Beam search over the static-KV-cache decoder.

Parity: the reference inherits beam search from HF `model.generate`
(`num_beams=`); its MPT wrapper ships `_reorder_cache` for exactly this
(reference: m2t/llava/model/mpt/modeling_mpt.py:478-490). TPU-native
equivalent: beams ride the batch axis ([B*K] rows of one KV cache), each
step is ONE jitted decode + in-graph `lax.top_k` over [B, K*V] joint
scores, and the cache "reorder" is a batch-axis gather by parent index —
the dynamic `past_key_values` index_select becomes a static-shape gather
XLA can fuse. Per step, two [B, K] integer arrays (token, parent) leave
the device; liveness is mirrored on the host from those same arrays so
the early-exit check costs no extra device sync. Sequences are rebuilt on
the host from parent backpointers.

Finished beams stay in the pool with frozen scores by proposing exactly
one zero-logprob continuation (their own pad), the standard trick that
keeps shapes static under jit.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llark_tpu.config import ModelConfig
from llark_tpu.generate import make_decode_fn, make_prefill_fn

_NEG_INF = -1e30


@dataclasses.dataclass
class BeamSearchConfig:
    num_beams: int = 4
    max_new_tokens: int = 256
    eos_token_id: Optional[int] = None
    length_penalty: float = 0.0  # 0 = pure logprob; >0 favors longer outputs
    stop_text: str = "###"


def _make_beam_step_fn(cfg: ModelConfig, k: int, eos_id: int):
    decode = make_decode_fn(cfg)

    def step(params, tokens, cache, write_pos, scores, alive):
        # tokens/scores/alive [B, K]; write_pos [B]
        b = tokens.shape[0]
        flat_tokens = tokens.reshape(b * k)
        flat_pos = jnp.repeat(write_pos, k)
        logits, cache = decode(params, flat_tokens, cache, flat_pos)
        v = logits.shape[-1]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        logp = logp.reshape(b, k, v)
        # dead beams propose exactly one frozen-score child: their own pad
        # token (reuse eos id) at logprob 0, everything else -inf.
        pad_onehot = jax.nn.one_hot(eos_id, v, dtype=jnp.float32)
        dead_cont = jnp.where(pad_onehot > 0, 0.0, _NEG_INF)
        cont = jnp.where(alive[..., None], logp, dead_cont[None, None, :])
        total = scores[..., None] + cont  # [B, K, V]
        new_scores, idx = jax.lax.top_k(total.reshape(b, k * v), k)
        parent = idx // v  # [B, K] in [0, K)
        tok = (idx % v).astype(jnp.int32)
        # reorder: gather beams by parent along the flattened batch-beam axis
        # (leaf-generic so int8-cache scale leaves reorder too)
        gidx = (jnp.arange(b)[:, None] * k + parent).reshape(-1)  # [B*K]
        cache = {
            name: leaf if leaf.ndim == 0 else jnp.take(leaf, gidx, axis=1)
            for name, leaf in cache.items()
        }
        new_alive = jnp.take_along_axis(alive, parent, axis=1) & (tok != eos_id)
        return tok, parent, new_scores, new_alive, cache

    return step


class BeamSearcher:
    """Beam-search counterpart of `generate.Generator` (same call shape)."""

    def __init__(
        self,
        cfg: ModelConfig,
        params,
        audio_patch_id: int,
        beam_cfg: Optional[BeamSearchConfig] = None,
        max_cache_len: int = 2048,
    ):
        self.cfg = cfg
        self.params = params
        self.beam_cfg = beam_cfg or BeamSearchConfig()
        if self.beam_cfg.num_beams < 1:
            raise ValueError("num_beams must be >= 1")
        self.audio_patch_id = audio_patch_id
        self.max_cache_len = max_cache_len
        self._prefill = jax.jit(make_prefill_fn(cfg, audio_patch_id, max_cache_len))
        self._steps: dict = {}  # eos id -> jitted step (eos is baked into the graph)

    def generate(
        self,
        input_ids: np.ndarray,  # [B, S] right-padded
        prompt_lengths: np.ndarray,  # [B]
        audio_encodings: Optional[np.ndarray] = None,
        audio_frame_counts: Optional[np.ndarray] = None,
        tokenizer=None,
        return_all_beams: bool = False,
        rng=None,  # accepted for Generator interface parity; beam is deterministic
    ):
        """Best beam per row (token list without the prompt), or all K
        (tokens, score) pairs per row with return_all_beams=True."""
        bc = self.beam_cfg
        k = bc.num_beams
        b, s = input_ids.shape
        if s + bc.max_new_tokens > self.max_cache_len:
            raise ValueError("prompt + max_new_tokens exceeds cache length")
        eos = bc.eos_token_id
        if eos is None and tokenizer is not None:
            eos = getattr(tokenizer, "eos_token_id", None)
        if eos is None:
            eos = -1  # sentinel: matches no real token, beams never finish early
        eos = int(eos)
        if eos not in self._steps:
            self._steps[eos] = jax.jit(_make_beam_step_fn(self.cfg, k, eos))
        step_fn = self._steps[eos]

        if audio_encodings is None:
            audio_encodings = np.zeros((b, 1, self.cfg.mm_hidden_size), np.float32)
            audio_frame_counts = np.zeros((b,), np.int32)
        if audio_frame_counts is None:
            audio_frame_counts = np.full((b,), audio_encodings.shape[1], np.int32)
        prompt_lengths = np.asarray(prompt_lengths, np.int32)

        logits, cache = self._prefill(
            self.params,
            jnp.asarray(input_ids),
            jnp.asarray(prompt_lengths),
            jnp.asarray(audio_encodings),
            jnp.asarray(audio_frame_counts),
        )
        # expand to K beams: first step takes the top-K first tokens per row
        logp0 = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)  # [B, V]
        scores, tok0 = jax.lax.top_k(logp0, k)  # [B, K]
        tokens = tok0.astype(jnp.int32)
        cache = {
            name: leaf if leaf.ndim == 0 else jnp.repeat(leaf, k, axis=1)
            for name, leaf in cache.items()
        }
        alive = tokens != eos
        scores = jnp.asarray(scores)

        tok_np = np.asarray(jax.device_get(tokens))
        alive_np = tok_np != eos  # host mirror: no extra device sync per step
        steps_tok: List[np.ndarray] = [tok_np]  # [B, K] per step
        steps_parent: List[np.ndarray] = []  # parent of step t>=1 choices
        write_pos = jnp.asarray(prompt_lengths)

        for t in range(1, bc.max_new_tokens):
            if not alive_np.any():
                break
            tokens, parent, scores, alive, cache = step_fn(
                self.params, tokens, cache, write_pos + (t - 1), scores, alive
            )
            tok_np = np.asarray(jax.device_get(tokens))
            parent_np = np.asarray(jax.device_get(parent))
            alive_np = np.take_along_axis(alive_np, parent_np, axis=1) & (tok_np != eos)
            steps_tok.append(tok_np)
            steps_parent.append(parent_np)

        scores_np = np.asarray(jax.device_get(scores))  # [B, K]

        # host-side backtrace through parent pointers
        n_steps = len(steps_tok)
        all_rows: List[List[Tuple[List[int], float]]] = []
        for i in range(b):
            beams: List[Tuple[List[int], float]] = []
            for j in range(k):
                seq = []
                bj = j
                for t in range(n_steps - 1, 0, -1):
                    seq.append(int(steps_tok[t][i, bj]))
                    bj = int(steps_parent[t - 1][i, bj])
                seq.append(int(steps_tok[0][i, bj]))
                seq.reverse()
                # trim at eos and any trailing pad continuation
                if eos in seq:
                    seq = seq[: seq.index(eos)]
                score = float(scores_np[i, j])
                if bc.length_penalty > 0.0 and seq:
                    score = score / (len(seq) ** bc.length_penalty)
                beams.append((seq, score))
            beams.sort(key=lambda p: -p[1])
            all_rows.append(beams)

        if bc.stop_text and tokenizer is not None:
            from llark_tpu.generate import Generator

            all_rows = [
                [(Generator._trim_stop(seq, tokenizer, bc.stop_text), sc) for seq, sc in row]
                for row in all_rows
            ]
        if return_all_beams:
            return all_rows
        return [row[0][0] for row in all_rows]
