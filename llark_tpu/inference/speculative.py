"""Speculative decoding: draft-and-verify generation on TPU.

Beyond-reference serving feature (the reference serves strictly one token
per forward via HF `model.generate`, m2t/infer.py:146-152). Single-stream
decode on TPU is HBM-bandwidth-bound: every emitted token pays one full
read of the weights. Verifying G draft tokens in ONE decode forward reads
the weights once for up to G+1 emitted tokens, so acceptance rate maps
directly to a speedup of the bandwidth-bound hot loop.

Two draft sources:

  * model draft — a small decoder (e.g. the MPT-1B ablation architecture)
    proposes `gamma` greedy tokens per round from its own KV cache;
  * n-gram draft ("prompt lookup") — no weights needed: propose the
    continuation of the most recent earlier occurrence of the current
    k-gram tail in (prompt + generated) tokens. Music QA transcripts
    repeat vocabulary heavily, so this is surprisingly effective.

Verification is "sample-and-match": at each of the G+1 positions the
TARGET model's token is sampled (argmax when temperature=0); proposals
are accepted while they equal the target's token, and the first
mismatching position emits the target's token. Every emitted token is
therefore drawn exactly from the target distribution — greedy speculative
output is token-identical to plain greedy decode (tested). Compared to
ratio-based rejection sampling this trades a little acceptance length for
not needing draft probabilities on the host.

Numerics caveat: "token-identical to plain greedy" holds when matmul
accumulation is deterministic across graph shapes (fp32 params, or
`jax.default_matmul_precision("highest")`). Under TPU's default bf16
matmul passes, the (gamma+1)-token verify forward and the 1-token decode
forward can round differently and flip a near-tie argmax — the output is
still a valid sample from (numerically perturbed) target logits, the same
caveat every bf16 speculative-decoding implementation carries.

Cache-consistency notes (why rollback is free):
  * the decoder's ragged decode path (models/decoder.py `cache_positions`)
    writes row i's S tokens at [pos_i, pos_i+S) and masks attention to
    [0, pos_i + local position], so rejected-token KV entries are simply
    overwritten by the next round's writes and never attended to;
  * re-feeding an already-consumed token at its original position rewrites
    the identical K/V values (deterministic forward), which keeps the
    fixed [last_token, proposals...] input shape legal every round.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llark_tpu.config import ModelConfig
from llark_tpu.generate import GenerationConfig, _sample, make_prefill_fn
from llark_tpu.models import decoder as decoder_lib


def check_spec_dtype(cfg: ModelConfig, allow_divergent: bool) -> None:
    """Gate sub-fp32 speculation behind an explicit opt-in.

    Measured on chip (PERFORMANCE.md "bf16 speculation divergence"): at
    bf16 the (gamma+1)-token verify graph and the 1-token decode graph
    round matmuls differently, flipping near-tie argmaxes — natural greedy
    acceptance came back 0.06-0.10 with 24/24 streams diverging from plain
    decode. Every emitted token is still a valid sample from (numerically
    perturbed) target logits, but '--speculative' silently changing the
    text vs plain decode is a production correctness decision the operator
    must make, not a footnote. fp32 runs are token-exact (unit-tested)."""
    if allow_divergent:
        return
    if jnp.dtype(cfg.dtype) == jnp.float32:
        return
    raise ValueError(
        f"speculative decoding at dtype={cfg.dtype} can emit different text "
        "than plain greedy decode (bf16 matmuls round differently between "
        "the verify and decode graph shapes; measured 24/24 streams "
        "diverged on chip). Pass allow_divergent_spec=True "
        "(--allow-divergent-spec) to accept this, or run with dtype=float32 "
        "for token-exact speculation."
    )


def ngram_propose(
    history: Sequence[int], gamma: int, max_k: int = 3
) -> List[int]:
    """Prompt-lookup draft: continuation of the most recent earlier
    occurrence of the longest matching tail k-gram (k = max_k..1).
    Falls back to repeating the last token; wrong proposals only cost
    acceptance, never correctness."""
    h = np.asarray(history, np.int64)
    n = len(h)
    for k in range(min(max_k, n - 1), 0, -1):
        tail = h[n - k :]
        windows = np.lib.stride_tricks.sliding_window_view(h, k)  # [n-k+1, k]
        hits = np.flatnonzero(np.all(windows[:-1] == tail, axis=1))
        if hits.size:
            start = int(hits[-1]) + k
            out = list(map(int, h[start : start + gamma]))
            while len(out) < gamma:
                out.append(int(h[-1]))
            return out
    return [int(h[-1])] * gamma


def simulate_ngram_acceptance(
    tokens: Sequence[int], prompt_len: int, gamma: int = 4, max_k: int = 3
) -> Tuple[float, int]:
    """Replay n-gram drafting over an already-generated sequence and report
    (acceptance_rate, rounds): what fraction of proposed tokens WOULD have
    been accepted had this output been decoded speculatively. Host-only;
    lets serving benches report prompt-lookup potential without re-decoding
    (bench_serving's `ngram_acceptance` field)."""
    seq = list(map(int, tokens))
    pos = prompt_len + 1  # the first output token is emitted by prefill
    accepted = proposed = rounds = 0
    while pos < len(seq):
        props = ngram_propose(seq[:pos], gamma, max_k)
        m = 0
        while m < gamma and pos + m < len(seq) and props[m] == seq[pos + m]:
            m += 1
        accepted += m
        proposed += gamma
        rounds += 1
        pos += m + 1  # the round's mismatch position emits the target token
    return (accepted / proposed if proposed else 0.0), rounds


def _make_verify_fn(cfg: ModelConfig, gen_cfg: GenerationConfig, gamma: int):
    """Jitted target verification over [last_token, d_1..d_gamma].

    Returns (target_tokens [B, gamma+1], n_emit [B], cache):
      target_tokens[:, j] is the target's sampled token after consuming
      input position j; rows emit target_tokens[:, :n_emit] this round
      (n_emit = accepted proposals + 1, in [1, gamma+1]).
    """

    def verify(params, tokens_in, proposals, cache, write_positions, rng):
        # tokens_in [B, gamma+1]; proposals [B, gamma]; write_positions [B]
        embeds = decoder_lib.embed_tokens(cfg, params, tokens_in)
        logits, cache = decoder_lib.decoder_forward(
            cfg,
            params,
            inputs_embeds=embeds,
            kv_cache=cache,
            cache_positions=write_positions,
        )  # [B, gamma+1, V]
        b, g1, v = logits.shape
        keys = jax.random.split(rng, g1)
        target_toks = jnp.stack(
            [_sample(logits[:, j, :], gen_cfg, keys[j]) for j in range(g1)],
            axis=1,
        )  # [B, gamma+1]
        matches = (proposals == target_toks[:, :gamma]).astype(jnp.int32)
        accepted = jnp.cumprod(matches, axis=1)  # [B, gamma]
        n_emit = jnp.sum(accepted, axis=1) + 1  # [B] in [1, gamma+1]
        return target_toks, n_emit, cache

    return verify


def _make_draft_propose_fn(cfg: ModelConfig, gamma: int):
    """Jitted draft proposer: consume the last 2 emitted tokens (the
    second is always new to the draft; the first is an idempotent rewrite)
    to get proposal d_1, then roll the remaining gamma-1 greedy steps via
    the shared multistep-decode scan (generate.make_multistep_decode_fn)."""
    from llark_tpu.generate import make_multistep_decode_fn

    greedy = GenerationConfig(temperature=0.0)
    decode_rest = make_multistep_decode_fn(cfg, greedy, gamma - 1)

    def propose(params, last2, cache, positions2, rng):
        # last2 [B, 2] at cache positions [positions2, positions2+1]
        embeds = decoder_lib.embed_tokens(cfg, params, last2)
        logits, cache = decoder_lib.decoder_forward(
            cfg,
            params,
            inputs_embeds=embeds,
            kv_cache=cache,
            cache_positions=positions2,
        )
        d1 = _sample(logits[:, -1, :], greedy, rng)
        if gamma == 1:
            return d1[:, None], cache
        # consumes d1..d_{gamma-1} (each written at its own slot), samples
        # d_2..d_gamma; d_gamma itself is consumed next round via last2
        rest, _, cache = decode_rest(params, d1, cache, positions2 + 2, rng)
        return jnp.concatenate([d1[:, None], rest], axis=1), cache  # [B, gamma]

    return propose


def make_fused_rounds_fn(
    cfg: ModelConfig,
    draft_cfg: ModelConfig,
    gen_cfg: GenerationConfig,
    gamma: int,
    rounds: int,
    max_pos: int,
):
    """R complete speculative rounds (draft-propose -> target-verify ->
    accept -> advance) in ONE jitted program: a lax.scan whose carry is
    (target_cache, draft_cache, prev_tok, last_tok, pos, rng).

    Host-loop speculation pays ~4 host<->device round trips per round
    (propose dispatch, verify dispatch, two transfers); on a
    remotely-attached chip that latency swamps the bandwidth win the
    whole technique exists for (measured 0.52x plain decode). Fusing the
    loop syncs the host once per R rounds — up to R*(gamma+1) emitted
    tokens per dispatch, the speculative analogue of
    generate.make_multistep_decode_fn's chunked decode.

    Per-row device state is position-vector based (the same ragged
    `cache_positions` contract the host loop relies on), so rejected
    proposals are overwritten and never attended. EOS/stop handling stays
    on the host exactly as in chunked decode: device rows keep rolling,
    the host truncates.

    Returns fused(t_params, d_params, t_cache, d_cache, prev_tok,
    last_tok, pos, rng) -> (tokens [B, rounds, gamma+1], n_emit
    [B, rounds], t_cache, d_cache, prev_tok, last_tok, pos, rng).
    """
    greedy = GenerationConfig(temperature=0.0)
    from llark_tpu.generate import make_decode_fn

    draft_decode = make_decode_fn(draft_cfg)

    def one_round(t_params, d_params, carry, _):
        t_cache, d_cache, prev_tok, last_tok, pos, rng = carry
        rng, r_d, r_v = jax.random.split(rng, 3)
        b = last_tok.shape[0]

        # -- draft: consume [prev, last] at (pos-1, pos), roll gamma greedy
        last2 = jnp.stack([prev_tok, last_tok], axis=1)  # [B, 2]
        emb = decoder_lib.embed_tokens(draft_cfg, d_params, last2)
        d_logits, d_cache = decoder_lib.decoder_forward(
            draft_cfg,
            d_params,
            inputs_embeds=emb,
            kv_cache=d_cache,
            cache_positions=pos - 1,
        )
        d1 = _sample(d_logits[:, -1, :], greedy, r_d)

        def draft_body(c, _):
            tok, dc, p = c
            lg, dc = draft_decode(d_params, tok, dc, p)
            nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            return (nxt, dc, p + 1), nxt

        if gamma > 1:
            (_, d_cache, _), rest = jax.lax.scan(
                draft_body, (d1, d_cache, pos + 1), None, length=gamma - 1
            )
            proposals = jnp.concatenate([d1[:, None], rest.T], axis=1)
        else:
            proposals = d1[:, None]  # [B, gamma]

        # -- target: verify [last, d_1..d_gamma] at pos..pos+gamma
        tokens_in = jnp.concatenate([last_tok[:, None], proposals], axis=1)
        t_emb = decoder_lib.embed_tokens(cfg, t_params, tokens_in)
        t_logits, t_cache = decoder_lib.decoder_forward(
            cfg,
            t_params,
            inputs_embeds=t_emb,
            kv_cache=t_cache,
            cache_positions=pos,
        )  # [B, gamma+1, V]
        keys = jax.random.split(r_v, gamma + 1)
        target_toks = jnp.stack(
            [_sample(t_logits[:, j, :], gen_cfg, keys[j]) for j in range(gamma + 1)],
            axis=1,
        )  # [B, gamma+1]
        matches = (proposals == target_toks[:, :gamma]).astype(jnp.int32)
        n_emit = jnp.sum(jnp.cumprod(matches, axis=1), axis=1) + 1  # [B]

        new_last = jnp.take_along_axis(
            target_toks, (n_emit - 1)[:, None], axis=1
        )[:, 0]
        prev_idx = jnp.maximum(n_emit - 2, 0)[:, None]
        new_prev = jnp.where(
            n_emit >= 2,
            jnp.take_along_axis(target_toks, prev_idx, axis=1)[:, 0],
            last_tok,
        )
        # clamp: rows the host has finished keep rolling on-device until the
        # whole batch is done; freezing their position at the cache tail
        # keeps the (harmless, never-attended) writes in bounds
        new_pos = jnp.minimum(pos + n_emit, max_pos)
        carry = (t_cache, d_cache, new_prev, new_last, new_pos, rng)
        return carry, (target_toks, n_emit)

    def fused(t_params, d_params, t_cache, d_cache, prev_tok, last_tok, pos, rng):
        (t_cache, d_cache, prev_tok, last_tok, pos, rng), (toks, n_emit) = (
            jax.lax.scan(
                lambda c, x: one_round(t_params, d_params, c, x),
                (t_cache, d_cache, prev_tok, last_tok, pos, rng),
                None,
                length=rounds,
            )
        )
        # [rounds, B, g+1] -> [B, rounds, g+1]; [rounds, B] -> [B, rounds]
        return (
            jnp.swapaxes(toks, 0, 1),
            n_emit.T,
            t_cache,
            d_cache,
            prev_tok,
            last_tok,
            pos,
            rng,
        )

    return fused


class SpeculativeGenerator:
    """Drop-in alternative to `generate.Generator` with draft-and-verify
    decoding. Greedy output is token-identical to `Generator.generate`;
    sampled output is distribution-identical (sample-and-match).

    draft_cfg/draft_params absent => n-gram prompt-lookup drafting.
    """

    def __init__(
        self,
        cfg: ModelConfig,
        params,
        audio_patch_id: int,
        gen_cfg: Optional[GenerationConfig] = None,
        max_cache_len: int = 2048,
        draft_cfg: Optional[ModelConfig] = None,
        draft_params=None,
        gamma: int = 4,
        ngram_max_k: int = 3,
        fused_rounds: int = 4,
        allow_divergent: bool = False,
    ):
        if (draft_cfg is None) != (draft_params is None):
            raise ValueError("draft_cfg and draft_params must be given together")
        check_spec_dtype(cfg, allow_divergent)
        self.cfg = cfg
        self.params = params
        self.gen_cfg = gen_cfg or GenerationConfig()
        self.audio_patch_id = audio_patch_id
        self.max_cache_len = max_cache_len
        self.gamma = int(gamma)
        self.ngram_max_k = int(ngram_max_k)
        if self.gamma < 1:
            raise ValueError("gamma must be >= 1")
        self.draft_cfg = draft_cfg
        self.draft_params = draft_params
        # R>0 with a model draft: scan R full rounds per dispatch on-device
        # (n-gram proposals are host-computed, so they keep the host loop)
        self.fused_rounds = int(fused_rounds) if draft_cfg is not None else 0

        self._prefill = jax.jit(make_prefill_fn(cfg, audio_patch_id, max_cache_len))
        self._verify = jax.jit(_make_verify_fn(cfg, self.gen_cfg, self.gamma))
        if draft_cfg is not None:
            self._draft_prefill = jax.jit(
                make_prefill_fn(draft_cfg, audio_patch_id, max_cache_len)
            )
            self._draft_propose = jax.jit(_make_draft_propose_fn(draft_cfg, self.gamma))
            if self.fused_rounds > 0:
                self._fused = jax.jit(
                    make_fused_rounds_fn(
                        cfg, draft_cfg, self.gen_cfg, self.gamma,
                        self.fused_rounds, max_cache_len - self.gamma - 2,
                    ),
                    donate_argnums=(2, 3),
                )

    # -- drafting ----------------------------------------------------------

    def _propose(
        self,
        histories: List[List[int]],
        draft_cache,
        positions2: np.ndarray,
        rng,
    ) -> Tuple[np.ndarray, Any]:
        b = len(histories)
        if self.draft_cfg is None:
            props = np.stack(
                [
                    np.asarray(
                        ngram_propose(h, self.gamma, self.ngram_max_k), np.int32
                    )
                    for h in histories
                ]
            )
            return props, draft_cache
        # a done row can have a length-1 history (1-token prompt, first
        # sample was EOS); pad by repeating — its proposals are never used
        last2 = np.stack(
            [h[-2:] if len(h) >= 2 else [h[-1], h[-1]] for h in histories]
        ).astype(np.int32)
        props, draft_cache = self._draft_propose(
            self.draft_params,
            jnp.asarray(last2),
            draft_cache,
            jnp.asarray(positions2, jnp.int32),
            rng,
        )
        return np.asarray(jax.device_get(props)), draft_cache

    # -- main loop ---------------------------------------------------------

    def generate(
        self,
        input_ids: np.ndarray,  # [B, S] right-padded
        prompt_lengths: np.ndarray,  # [B]
        audio_encodings: Optional[np.ndarray] = None,
        audio_frame_counts: Optional[np.ndarray] = None,
        tokenizer=None,
        rng: Optional[jax.Array] = None,
    ) -> List[List[int]]:
        gen_cfg = self.gen_cfg
        b, s = input_ids.shape
        if s + gen_cfg.max_new_tokens + self.gamma > self.max_cache_len:
            raise ValueError(
                "prompt + max_new_tokens + gamma exceeds cache length"
            )
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if audio_encodings is None:
            audio_encodings = np.zeros((b, 1, self.cfg.mm_hidden_size), np.float32)
            audio_frame_counts = np.zeros((b,), np.int32)
        if audio_frame_counts is None:
            audio_frame_counts = np.full((b,), audio_encodings.shape[1], np.int32)

        prompt_lengths = np.asarray(prompt_lengths, np.int32)
        plens = jnp.asarray(prompt_lengths)
        rng, sub = jax.random.split(rng)
        logits, cache = self._prefill(
            self.params,
            jnp.asarray(input_ids),
            plens,
            jnp.asarray(audio_encodings),
            jnp.asarray(audio_frame_counts),
        )
        first = np.asarray(jax.device_get(_sample(logits, gen_cfg, sub)))

        draft_cache = None
        if self.draft_cfg is not None:
            _, draft_cache = self._draft_prefill(
                self.draft_params,
                jnp.asarray(input_ids),
                plens,
                jnp.asarray(audio_encodings),
                jnp.asarray(audio_frame_counts),
            )

        # host-side state: full per-row token history (prompt + emitted)
        histories: List[List[int]] = [
            list(map(int, input_ids[i, : prompt_lengths[i]])) for i in range(b)
        ]
        done = np.zeros((b,), bool)
        out: List[List[int]] = [[] for _ in range(b)]
        emitted = np.zeros((b,), np.int64)
        eos, stop_text = gen_cfg.eos_token_id, gen_cfg.stop_text

        def absorb_one(i: int, t: int) -> None:
            if done[i]:
                return
            if eos is not None and t == eos:
                done[i] = True
                return
            out[i].append(t)
            histories[i].append(t)
            emitted[i] += 1
            if emitted[i] >= gen_cfg.max_new_tokens:
                done[i] = True
            elif stop_text and tokenizer is not None:
                if stop_text in tokenizer.decode(out[i][-8:]):
                    done[i] = True

        for i in range(b):
            absorb_one(i, int(first[i]))

        rounds_accepted = 0
        rounds_proposed = 0

        if self.fused_rounds > 0 and not done.all():
            # on-device rounds: one dispatch + one transfer per
            # fused_rounds complete rounds (see make_fused_rounds_fn)
            prev_tok = jnp.asarray(
                [h[-2] if len(h) >= 2 else h[-1] for h in histories], jnp.int32
            )
            last_tok = jnp.asarray([h[-1] for h in histories], jnp.int32)
            pos = jnp.asarray(
                prompt_lengths + emitted.astype(np.int32) - 1, jnp.int32
            )
            while not done.all():
                rng, sub = jax.random.split(rng)
                (toks, n_emits, cache, draft_cache,
                 prev_tok, last_tok, pos, _r) = self._fused(
                    self.params, self.draft_params, cache, draft_cache,
                    prev_tok, last_tok, pos, sub,
                )
                toks_np = np.asarray(jax.device_get(toks))  # [B, R, g+1]
                n_np = np.asarray(jax.device_get(n_emits))  # [B, R]
                for r in range(self.fused_rounds):
                    for i in range(b):
                        if done[i]:
                            continue
                        before = int(emitted[i])
                        for j in range(int(n_np[i, r])):
                            absorb_one(i, int(toks_np[i, r, j]))
                            if done[i]:
                                break
                        rounds_accepted += max(0, int(emitted[i]) - before - 1)
                        rounds_proposed += self.gamma
            self.last_acceptance_rate = (
                rounds_accepted / rounds_proposed if rounds_proposed else 0.0
            )
            if stop_text and tokenizer is not None:
                from llark_tpu.generate import Generator

                out = [
                    Generator._trim_stop(ids, tokenizer, stop_text) for ids in out
                ]
            return out

        while not done.all():
            # positions: row i's last emitted token sits at prompt_len+emitted-1
            write_pos = prompt_lengths + emitted.astype(np.int32) - 1
            rng, r_draft, r_verify = jax.random.split(rng, 3)
            proposals, draft_cache = self._propose(
                histories, draft_cache, write_pos - 1, r_draft
            )
            last_tok = np.asarray([h[-1] for h in histories], np.int32)
            tokens_in = np.concatenate([last_tok[:, None], proposals], axis=1)
            target_toks, n_emit, cache = self._verify(
                self.params,
                jnp.asarray(tokens_in),
                jnp.asarray(proposals),
                cache,
                jnp.asarray(write_pos, jnp.int32),
                r_verify,
            )
            target_toks = np.asarray(jax.device_get(target_toks))
            n_emit = np.asarray(jax.device_get(n_emit))
            for i in range(b):
                if done[i]:
                    continue
                before = int(emitted[i])
                for j in range(int(n_emit[i])):
                    absorb_one(i, int(target_toks[i, j]))
                    if done[i]:
                        break
                # count only tokens actually emitted (EOS/stop/max can cut
                # a round short), minus the 1 the target emits regardless
                rounds_accepted += max(0, int(emitted[i]) - before - 1)
                rounds_proposed += self.gamma

        self.last_acceptance_rate = (
            rounds_accepted / rounds_proposed if rounds_proposed else 0.0
        )
        if stop_text and tokenizer is not None:
            from llark_tpu.generate import Generator

            out = [Generator._trim_stop(ids, tokenizer, stop_text) for ids in out]
        return out
