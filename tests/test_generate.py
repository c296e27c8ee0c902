"""Generation tests: prefill+decode against a naive full-forward loop."""

import jax
import jax.numpy as jnp
import numpy as np

from llark_tpu.config import ModelConfig
from llark_tpu.generate import GenerationConfig, Generator
from llark_tpu.models.fusion import init_llark_params, llark_forward
from llark_tpu.tokenization import TokenizerBundle, WordTokenizer

PATCH_ID = 7


def naive_greedy(cfg, params, prompt_ids, audio, patch_id, n_new):
    """Reference: re-run the full forward each step, argmax last position."""
    ids = list(map(int, prompt_ids))
    out = []
    for _ in range(n_new):
        arr = jnp.asarray([ids], jnp.int32)
        logits, _ = llark_forward(
            cfg,
            params,
            arr,
            audio_encodings=audio,
            audio_patch_id=patch_id,
        )
        t = int(jnp.argmax(logits[0, -1]))
        out.append(t)
        ids.append(t)
    return out


def test_generate_matches_naive_greedy_ragged_batch():
    cfg = ModelConfig.tiny(dtype="float32", param_dtype="float32")
    params = init_llark_params(cfg, jax.random.PRNGKey(0))
    T = 3
    rng = np.random.RandomState(0)
    audio = rng.randn(1, T, cfg.mm_hidden_size).astype(np.float32)

    prompts = [
        [9, 1, PATCH_ID, PATCH_ID, PATCH_ID, 4, 5],
        [9, PATCH_ID, PATCH_ID, PATCH_ID, 11],
    ]
    n_new = 6
    expected = [
        naive_greedy(cfg, params, p, jnp.asarray(audio), PATCH_ID, n_new) for p in prompts
    ]

    S = 8
    B = len(prompts)
    input_ids = np.zeros((B, S), np.int32)
    lengths = np.zeros((B,), np.int32)
    for i, p in enumerate(prompts):
        input_ids[i, : len(p)] = p
        lengths[i] = len(p)
    batch_audio = np.concatenate([audio] * B, axis=0)

    gen = Generator(
        cfg,
        params,
        audio_patch_id=PATCH_ID,
        gen_cfg=GenerationConfig(max_new_tokens=n_new, stop_text=""),
        max_cache_len=32,
    )
    out = gen.generate(input_ids, lengths, batch_audio, np.full((B,), T, np.int32))
    assert out == expected


def test_generate_stops_on_keyword():
    """With a tokenizer, generation trims at the '###' keyword."""
    cfg = ModelConfig.tiny()
    params = init_llark_params(cfg, jax.random.PRNGKey(1))
    bundle = TokenizerBundle.from_tokenizer(WordTokenizer(128))
    hash_id = bundle.tokenizer.convert_tokens_to_ids("###")

    gen = Generator(
        cfg,
        params,
        audio_patch_id=bundle.audio_patch_id,
        gen_cfg=GenerationConfig(max_new_tokens=8, stop_text="###"),
        max_cache_len=64,
    )
    ids = np.array([[5, 6, 8, 9]], np.int32)
    out = gen.generate(
        ids, np.array([4], np.int32), tokenizer=bundle.tokenizer
    )[0]
    assert len(out) <= 8
    assert hash_id not in out or out.index(hash_id) == len(out) - 1


def test_generate_eos_stop():
    cfg = ModelConfig.tiny()
    params = init_llark_params(cfg, jax.random.PRNGKey(2))
    # find which token greedy decoding emits first, then declare it EOS
    gen0 = Generator(
        cfg,
        params,
        audio_patch_id=PATCH_ID,
        gen_cfg=GenerationConfig(max_new_tokens=3, stop_text=""),
        max_cache_len=32,
    )
    ids = np.array([[5, 6, 7, 8]], np.int32)
    first = gen0.generate(ids, np.array([4], np.int32))[0][0]

    gen = Generator(
        cfg,
        params,
        audio_patch_id=PATCH_ID,
        gen_cfg=GenerationConfig(max_new_tokens=5, eos_token_id=first, stop_text=""),
        max_cache_len=32,
    )
    out = gen.generate(ids, np.array([4], np.int32))[0]
    assert out == []  # first token was EOS -> empty completion


def test_top_k_sampling_restricts_support():
    """top_k masks everything outside the k highest logits."""
    import jax
    import jax.numpy as jnp

    from llark_tpu.generate import GenerationConfig, _sample

    logits = jnp.asarray([[0.0, 5.0, 4.0, -1.0, 3.0]])
    cfg = GenerationConfig(temperature=1.0, top_k=2)
    seen = {
        int(_sample(logits, cfg, jax.random.PRNGKey(i))[0]) for i in range(50)
    }
    assert seen <= {1, 2}
    assert len(seen) == 2  # both survivors actually reachable
