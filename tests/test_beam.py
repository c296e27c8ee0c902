"""Beam search: k=1 == greedy; k>1 finds higher-logprob sequences."""

import jax
import jax.numpy as jnp
import numpy as np

from llark_tpu.config import ModelConfig
from llark_tpu.generate import GenerationConfig, Generator
from llark_tpu.inference.beam import BeamSearchConfig, BeamSearcher
from llark_tpu.models.fusion import init_llark_params, llark_forward

PATCH_ID = 7


def _batch(cfg, seed=0):
    rng = np.random.RandomState(seed)
    T = 3
    audio = rng.randn(2, T, cfg.mm_hidden_size).astype(np.float32)
    prompts = [
        [9, 1, PATCH_ID, PATCH_ID, PATCH_ID, 4, 5],
        [9, PATCH_ID, PATCH_ID, PATCH_ID, 11],
    ]
    S = 8
    input_ids = np.zeros((len(prompts), S), np.int32)
    lengths = np.zeros((len(prompts),), np.int32)
    for i, p in enumerate(prompts):
        input_ids[i, : len(p)] = p
        lengths[i] = len(p)
    return input_ids, lengths, audio, np.full((len(prompts),), T, np.int32)


def _seq_logprob(cfg, params, prompt, audio, continuation):
    """Joint logprob of `continuation` after `prompt` via one full forward."""
    ids = list(map(int, prompt)) + list(map(int, continuation))
    logits, _ = llark_forward(
        cfg,
        params,
        jnp.asarray([ids], jnp.int32),
        audio_encodings=audio,
        audio_patch_id=PATCH_ID,
    )
    logp = jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1)
    total = 0.0
    for t, tok in enumerate(continuation):
        total += float(logp[len(prompt) - 1 + t, tok])
    return total


def test_beam_k1_matches_greedy():
    cfg = ModelConfig.tiny(dtype="float32", param_dtype="float32")
    params = init_llark_params(cfg, jax.random.PRNGKey(0))
    input_ids, lengths, audio, counts = _batch(cfg)
    n_new = 10

    ref = Generator(
        cfg, params, PATCH_ID,
        GenerationConfig(max_new_tokens=n_new, stop_text=""),
        max_cache_len=64,
    ).generate(input_ids, lengths, audio, counts)
    beam = BeamSearcher(
        cfg, params, PATCH_ID,
        BeamSearchConfig(num_beams=1, max_new_tokens=n_new, stop_text=""),
        max_cache_len=64,
    ).generate(input_ids, lengths, audio, counts)
    assert beam == ref


def test_beam_improves_joint_logprob():
    cfg = ModelConfig.tiny(dtype="float32", param_dtype="float32")
    params = init_llark_params(cfg, jax.random.PRNGKey(3))
    input_ids, lengths, audio, counts = _batch(cfg, seed=3)
    n_new = 8

    greedy = Generator(
        cfg, params, PATCH_ID,
        GenerationConfig(max_new_tokens=n_new, stop_text=""),
        max_cache_len=64,
    ).generate(input_ids, lengths, audio, counts)
    beams = BeamSearcher(
        cfg, params, PATCH_ID,
        BeamSearchConfig(num_beams=4, max_new_tokens=n_new, stop_text=""),
        max_cache_len=64,
    ).generate(input_ids, lengths, audio, counts, return_all_beams=True)

    for i in range(len(greedy)):
        prompt = [t for t in input_ids[i, : lengths[i]]]
        a = audio[i : i + 1]
        lp_greedy = _seq_logprob(cfg, params, prompt, a, greedy[i])
        best_seq, best_score = beams[i][0]
        lp_beam = _seq_logprob(cfg, params, prompt, a, best_seq)
        # beam's best must be at least as likely as greedy
        assert lp_beam >= lp_greedy - 1e-4
        # reported cumulative score must agree with a fresh full forward
        assert abs(lp_beam - best_score) < 1e-3
        # beams are distinct and score-sorted
        seqs = [tuple(s) for s, _ in beams[i]]
        assert len(set(seqs)) == len(seqs)
        scores = [sc for _, sc in beams[i]]
        assert scores == sorted(scores, reverse=True)


def test_beam_eos_trimming():
    cfg = ModelConfig.tiny(dtype="float32", param_dtype="float32")
    params = init_llark_params(cfg, jax.random.PRNGKey(0))
    input_ids, lengths, audio, counts = _batch(cfg)
    n_new = 10

    ref = BeamSearcher(
        cfg, params, PATCH_ID,
        BeamSearchConfig(num_beams=2, max_new_tokens=n_new, stop_text=""),
        max_cache_len=64,
    ).generate(input_ids, lengths, audio, counts)
    eos = ref[0][3]  # force an early stop on row 0's 4th token
    out = BeamSearcher(
        cfg, params, PATCH_ID,
        BeamSearchConfig(num_beams=2, max_new_tokens=n_new, stop_text="",
                         eos_token_id=eos),
        max_cache_len=64,
    ).generate(input_ids, lengths, audio, counts)
    for row in out:
        assert eos not in row
