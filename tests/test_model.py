"""Decoder + fusion model tests on tiny configs (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llark_tpu.config import ModelConfig
from llark_tpu.models.decoder import (
    decoder_forward,
    init_decoder_params,
    init_kv_cache,
)
from llark_tpu.models.fusion import (
    causal_lm_loss,
    init_llark_params,
    llark_forward,
    splice_audio_embeddings,
)
from llark_tpu.special_tokens import IGNORE_INDEX

PATCH_ID = 7


def tiny_cfg(**kw):
    return ModelConfig.tiny(**kw)


def test_decoder_forward_shapes():
    cfg = tiny_cfg()
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    logits, cache = decoder_forward(cfg, params, input_ids=ids)
    assert logits.shape == (2, 16, cfg.vocab_size)
    assert cache is None
    assert bool(jnp.isfinite(logits).all())


def test_decoder_mpt_variant():
    cfg = tiny_cfg(arch="mpt")
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    assert "lm_head" not in params  # tied embeddings
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, cfg.vocab_size)
    logits, _ = decoder_forward(cfg, params, input_ids=ids)
    assert logits.shape == (2, 8, cfg.vocab_size)
    assert bool(jnp.isfinite(logits).all())


def test_causality():
    """Future tokens must not affect past logits."""
    cfg = tiny_cfg(dtype="float32", param_dtype="float32")
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    ids1 = jnp.array([[1, 2, 3, 4, 5, 6, 7, 8]])
    ids2 = ids1.at[0, 6].set(99)  # change a late token
    l1, _ = decoder_forward(cfg, params, input_ids=ids1)
    l2, _ = decoder_forward(cfg, params, input_ids=ids2)
    np.testing.assert_allclose(l1[0, :6], l2[0, :6], rtol=1e-5, atol=1e-5)
    assert not np.allclose(l1[0, 6], l2[0, 6])


def test_padding_invariance():
    """Right padding must not change logits of valid positions."""
    cfg = tiny_cfg(dtype="float32", param_dtype="float32")
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    ids = jnp.array([[1, 2, 3, 4]])
    ids_padded = jnp.array([[1, 2, 3, 4, 0, 0, 0, 0]])
    l1, _ = decoder_forward(cfg, params, input_ids=ids, seq_lengths=jnp.array([4]))
    l2, _ = decoder_forward(cfg, params, input_ids=ids_padded, seq_lengths=jnp.array([4]))
    np.testing.assert_allclose(l1[0, :4], l2[0, :4], rtol=1e-5, atol=1e-5)


def test_splice_audio_embeddings():
    B, S, T, H = 2, 6, 3, 4
    token_embeds = jnp.zeros((B, S, H))
    audio_embeds = jnp.stack(
        [jnp.full((T, H), i + 1.0) * jnp.arange(1, T + 1)[:, None] for i in range(B)]
    )
    ids = jnp.array(
        [
            [1, PATCH_ID, PATCH_ID, PATCH_ID, 2, 3],
            [PATCH_ID, PATCH_ID, 4, 5, 6, 7],
        ]
    )
    out = splice_audio_embeddings(token_embeds, audio_embeds, ids, PATCH_ID)
    # row 0: frames at positions 1..3
    np.testing.assert_allclose(out[0, 1], audio_embeds[0, 0])
    np.testing.assert_allclose(out[0, 2], audio_embeds[0, 1])
    np.testing.assert_allclose(out[0, 3], audio_embeds[0, 2])
    np.testing.assert_allclose(out[0, 0], 0.0)
    np.testing.assert_allclose(out[0, 4], 0.0)
    # row 1: frames at positions 0..1
    np.testing.assert_allclose(out[1, 0], audio_embeds[1, 0])
    np.testing.assert_allclose(out[1, 1], audio_embeds[1, 1])
    np.testing.assert_allclose(out[1, 2], 0.0)


def test_splice_matches_loop_reference():
    """Vectorized splice == per-row concatenation loop (the reference's
    algorithm, m2t/models/llamav2.py:138-222) on random data."""
    rng = np.random.RandomState(0)
    B, S, T, H = 3, 12, 4, 5
    token_embeds = rng.randn(B, S, H).astype(np.float32)
    audio_embeds = rng.randn(B, T, H).astype(np.float32)
    ids = np.full((B, S), 1, np.int32)
    starts = [2, 0, 5]
    for b, st in enumerate(starts):
        ids[b, st : st + T] = PATCH_ID

    expected = token_embeds.copy()
    for b, st in enumerate(starts):
        expected[b, st : st + T] = audio_embeds[b]

    out = splice_audio_embeddings(
        jnp.asarray(token_embeds), jnp.asarray(audio_embeds), jnp.asarray(ids), PATCH_ID
    )
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)


def test_llark_forward_and_loss():
    cfg = tiny_cfg()
    params = init_llark_params(cfg, jax.random.PRNGKey(0))
    B, S, T = 2, 24, 4
    ids = np.full((B, S), 3, np.int32)
    ids[:, 2 : 2 + T] = PATCH_ID
    labels = np.full((B, S), IGNORE_INDEX, np.int32)
    labels[:, 10:20] = 5
    audio = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.mm_hidden_size))

    logits, _ = llark_forward(
        cfg,
        params,
        jnp.asarray(ids),
        audio_encodings=audio,
        audio_patch_id=PATCH_ID,
        seq_lengths=jnp.array([S, S]),
    )
    assert logits.shape == (B, S, cfg.vocab_size)
    loss, n = causal_lm_loss(logits, jnp.asarray(labels))
    assert np.isfinite(float(loss))
    assert int(n) == 2 * 10


def test_loss_gradients_flow_to_projector_and_new_embeddings():
    cfg = tiny_cfg()
    params = init_llark_params(cfg, jax.random.PRNGKey(0))
    B, S, T = 1, 16, 2
    ids = np.full((B, S), 3, np.int32)
    ids[:, 1 : 1 + T] = PATCH_ID
    labels = np.asarray(ids, np.int32)
    audio = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.mm_hidden_size))
    trainable_start = cfg.vocab_size - 3

    def loss_fn(p):
        logits, _ = llark_forward(
            cfg,
            p,
            jnp.asarray(ids),
            audio_encodings=audio,
            audio_patch_id=PATCH_ID,
            trainable_token_start=trainable_start,
        )
        return causal_lm_loss(logits, jnp.asarray(labels))[0]

    grads = jax.grad(loss_fn)(params)
    g_proj = np.asarray(grads["mm_projector"]["kernel"])
    assert np.abs(g_proj).sum() > 0
    g_embed = np.asarray(grads["embed"])
    # original-vocab rows frozen via stop_gradient; new rows may update
    assert np.abs(g_embed[:trainable_start]).sum() == 0


def test_overfit_tiny_batch():
    """Sanity: a few SGD steps reduce loss on one fixed batch."""
    import optax

    cfg = tiny_cfg()
    params = init_llark_params(cfg, jax.random.PRNGKey(0))
    B, S, T = 2, 16, 2
    ids = np.full((B, S), 3, np.int32)
    ids[:, 1 : 1 + T] = PATCH_ID
    ids[:, 8:] = np.arange(8)[None, :] + 10
    labels = np.where(np.arange(S)[None, :] >= 8, ids, IGNORE_INDEX).astype(np.int32)
    audio = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.mm_hidden_size))
    )

    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p_):
            logits, _ = llark_forward(
                cfg,
                p_,
                jnp.asarray(ids),
                audio_encodings=jnp.asarray(audio),
                audio_patch_id=PATCH_ID,
            )
            return causal_lm_loss(logits, jnp.asarray(labels))[0]

        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, loss

    losses = []
    for _ in range(20):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses


def test_kv_cache_decode_matches_full_forward():
    """Prefill + single-token decode must reproduce full-sequence logits."""
    cfg = tiny_cfg(dtype="float32", param_dtype="float32")
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    B, S = 2, 10
    ids = jax.random.randint(jax.random.PRNGKey(2), (B, S), 0, cfg.vocab_size)

    full_logits, _ = decoder_forward(cfg, params, input_ids=ids)

    cache = init_kv_cache(cfg, B, 16, dtype=jnp.float32)
    prefill_len = 6
    logits_p, cache = decoder_forward(
        cfg, params, input_ids=ids[:, :prefill_len], kv_cache=cache
    )
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(full_logits[:, :prefill_len]), rtol=2e-4, atol=2e-4
    )
    for t in range(prefill_len, S):
        logits_t, cache = decoder_forward(
            cfg, params, input_ids=ids[:, t : t + 1], kv_cache=cache
        )
        np.testing.assert_allclose(
            np.asarray(logits_t[:, 0]), np.asarray(full_logits[:, t]), rtol=2e-4, atol=2e-4
        )


def test_init_scheme_registry():
    import jax
    import numpy as np
    from llark_tpu.config import ModelConfig
    from llark_tpu.models.decoder import init_decoder_params

    stds = {}
    for scheme in ("kaiming", "xavier", "small"):
        cfg = ModelConfig.tiny(init_scheme=scheme)
        p = init_decoder_params(cfg, jax.random.PRNGKey(0))
        stds[scheme] = float(np.asarray(p["layers"]["w_up"]).std())
    h, i = 64, 128
    assert abs(stds["kaiming"] - (1 / np.sqrt(h))) < 0.01
    assert abs(stds["xavier"] - np.sqrt(2 / (h + i))) < 0.01
    assert abs(stds["small"] - np.sqrt(2 / (5 * h))) < 0.01


def test_chunked_loss_matches_full():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from llark_tpu.config import ModelConfig
    from llark_tpu.models.decoder import compute_logits
    from llark_tpu.models.fusion import (
        causal_lm_loss,
        chunked_causal_lm_loss,
        init_llark_params,
    )
    from llark_tpu.special_tokens import IGNORE_INDEX

    cfg = ModelConfig.tiny(dtype="float32", use_pallas_attention=False)
    params = init_llark_params(cfg, jax.random.PRNGKey(0))
    b, s = 2, 32
    hidden = jax.random.normal(jax.random.PRNGKey(1), (b, s, cfg.hidden_size))
    labels = np.array(jax.random.randint(jax.random.PRNGKey(2), (b, s), 0, 50))
    labels[:, :6] = IGNORE_INDEX
    labels = jnp.asarray(labels)

    full_loss, full_n = causal_lm_loss(compute_logits(cfg, params, hidden), labels)
    for chunk in (8, 16, 32):
        c_loss, c_n = chunked_causal_lm_loss(cfg, params, hidden, labels, chunk)
        assert int(c_n) == int(full_n)
        np.testing.assert_allclose(float(c_loss), float(full_loss), rtol=1e-5)

    # gradients agree too (the remat'd scan path)
    def f_full(p):
        return causal_lm_loss(compute_logits(cfg, p, hidden), labels)[0]

    def f_chunk(p):
        return chunked_causal_lm_loss(cfg, p, hidden, labels, 8)[0]

    g1 = jax.grad(f_full)(params)["lm_head"]
    g2 = jax.grad(f_chunk)(params)["lm_head"]
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_remat_policies_do_not_change_math():
    """remat trades memory for recompute, never values: loss and grads are
    identical across full / dots / dots_narrow policies and remat off."""
    from llark_tpu.config import TrainingArguments
    from llark_tpu.train.state import TrainState
    from llark_tpu.train.step import make_optimizer, make_train_step

    rng = np.random.RandomState(0)
    B, S, T = 2, 16, 2
    ids = np.full((B, S), 3, np.int32)
    ids[:, 1:1 + T] = 7
    labels = np.where(np.arange(S)[None, :] >= S // 2, ids, IGNORE_INDEX)
    batch = {
        "input_ids": ids,
        "labels": labels.astype(np.int32),
        "seq_lengths": np.full((B,), S, np.int32),
        "audio_encodings": rng.randn(B, T, 8).astype(np.float32),
        "audio_frame_counts": np.full((B,), T, np.int32),
    }
    got = {}
    for remat, policy in ((False, "full"), (True, "full"), (True, "dots"),
                          (True, "dots_narrow")):
        cfg = ModelConfig.tiny(dtype="float32", param_dtype="float32",
                               mm_hidden_size=8)
        cfg.remat, cfg.remat_policy = remat, policy
        params = init_llark_params(cfg, jax.random.PRNGKey(0))
        opt = make_optimizer(TrainingArguments(max_steps=10), params)
        step = make_train_step(cfg, opt, audio_patch_id=7)
        _, m = jax.jit(step)(TrainState.create(params, opt),
                             jax.tree.map(jnp.asarray, batch))
        got[(remat, policy)] = (float(m["loss"]), float(m["grad_norm"]))
    base = got[(False, "full")]
    for k, v in got.items():
        np.testing.assert_allclose(v, base, rtol=1e-6, err_msg=str(k))
