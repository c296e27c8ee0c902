"""Parity tests for the Pallas flash-decode kernel (interpret mode on CPU).

Reference semantics: ops/attention.py xla_attention at Sq=1 over a padded
KV cache with ragged per-row lengths, int8 dequant scales folded into the
dots, and optional ALiBi bias from absolute query positions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llark_tpu.ops.attention import alibi_slopes, xla_attention
from llark_tpu.ops.decode_attention import flash_decode_attention as _fda


@pytest.fixture(params=[True, False], ids=["allheads", "perhead"])
def flash_decode_attention(request):
    import functools
    return functools.partial(_fda, all_heads=request.param)


def _mk(b, h, hkv, s, d, key, dtype=jnp.bfloat16):
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (b, h, 1, d), dtype)
    k = jax.random.normal(ks[1], (b, hkv, s, d), dtype)
    v = jax.random.normal(ks[2], (b, hkv, s, d), dtype)
    return q, k, v


def _quant(x):
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    sc = amax / 127.0
    q = jnp.round(xf / jnp.maximum(sc, 1e-8)[..., None]).astype(jnp.int8)
    return q, sc


def _ref(q, k, v, kv_lengths, q_positions, slopes=None, k_scale=None, v_scale=None):
    return xla_attention(
        q, k, v, causal=True, kv_lengths=kv_lengths, slopes=slopes,
        q_offset=q_positions, k_scale=k_scale, v_scale=v_scale,
    )


def _assert_close(got, want, tol=2e-2):
    g = np.asarray(got, np.float32)
    w = np.asarray(want, np.float32)
    denom = max(np.abs(w).max(), 1e-6)
    assert np.abs(g - w).max() / denom < tol, (
        f"max rel-to-max err {np.abs(g - w).max() / denom:.4g}"
    )


@pytest.mark.parametrize("hkv", [4, 2, 1])  # MHA, GQA, MQA
def test_flash_decode_matches_xla_bf16(hkv, flash_decode_attention):
    b, h, s, d = 3, 4, 256, 128
    q, k, v = _mk(b, h, hkv, s, d, jax.random.PRNGKey(0))
    kv_lengths = jnp.array([256, 130, 1], jnp.int32)
    q_positions = kv_lengths - 1
    got = flash_decode_attention(
        q, k, v, kv_lengths=kv_lengths, q_positions=q_positions,
        block_k=128, interpret=True,
    )
    want = _ref(q, k, v, kv_lengths, q_positions)
    _assert_close(got, want)


def test_flash_decode_int8_scales(flash_decode_attention):
    b, h, s, d = 2, 4, 256, 128
    q, k, v = _mk(b, h, 4, s, d, jax.random.PRNGKey(1))
    k8, ksc = _quant(k)
    v8, vsc = _quant(v)
    kv_lengths = jnp.array([200, 64], jnp.int32)
    q_positions = kv_lengths - 1
    got = flash_decode_attention(
        q, k8, v8, kv_lengths=kv_lengths, q_positions=q_positions,
        k_scale=ksc, v_scale=vsc, block_k=128, interpret=True,
    )
    want = _ref(q, k8, v8, kv_lengths, q_positions, k_scale=ksc, v_scale=vsc)
    _assert_close(got, want)


def test_flash_decode_alibi(flash_decode_attention):
    b, h, s, d = 2, 8, 256, 128
    q, k, v = _mk(b, h, 8, s, d, jax.random.PRNGKey(2))
    slopes = alibi_slopes(h)
    kv_lengths = jnp.array([256, 37], jnp.int32)
    q_positions = kv_lengths - 1
    got = flash_decode_attention(
        q, k, v, kv_lengths=kv_lengths, q_positions=q_positions,
        slopes=slopes, block_k=128, interpret=True,
    )
    want = _ref(q, k, v, kv_lengths, q_positions, slopes=slopes)
    _assert_close(got, want)


def test_flash_decode_alibi_gqa_int8(flash_decode_attention):
    # all features at once: GQA group 2 + alibi + int8 cache + ragged rows
    b, h, hkv, s, d = 2, 8, 4, 384, 128
    q, k, v = _mk(b, h, hkv, s, d, jax.random.PRNGKey(3))
    k8, ksc = _quant(k)
    v8, vsc = _quant(v)
    slopes = alibi_slopes(h)
    kv_lengths = jnp.array([311, 128], jnp.int32)
    q_positions = kv_lengths - 1
    got = flash_decode_attention(
        q, k8, v8, kv_lengths=kv_lengths, q_positions=q_positions,
        k_scale=ksc, v_scale=vsc, slopes=slopes, block_k=128, interpret=True,
    )
    want = _ref(q, k8, v8, kv_lengths, q_positions, slopes=slopes,
                k_scale=ksc, v_scale=vsc)
    _assert_close(got, want)


def test_flash_decode_len_below_one_block(flash_decode_attention):
    b, h, s, d = 2, 2, 512, 128
    q, k, v = _mk(b, h, 2, s, d, jax.random.PRNGKey(4))
    kv_lengths = jnp.array([3, 17], jnp.int32)
    got = flash_decode_attention(
        q, k, v, kv_lengths=kv_lengths, block_k=256, interpret=True,
    )
    want = _ref(q, k, v, kv_lengths, kv_lengths - 1)
    _assert_close(got, want)


def test_flash_decode_clamped_qpos(flash_decode_attention):
    # kv_lengths clamped below the query's absolute position (external
    # kv_lengths cap in _layer_forward): alibi still uses the abs position
    b, h, s, d = 1, 4, 256, 128
    q, k, v = _mk(b, h, 4, s, d, jax.random.PRNGKey(5))
    slopes = alibi_slopes(h)
    kv_lengths = jnp.array([100], jnp.int32)
    q_positions = jnp.array([140], jnp.int32)
    got = flash_decode_attention(
        q, k, v, kv_lengths=kv_lengths, q_positions=q_positions,
        slopes=slopes, block_k=128, interpret=True,
    )
    want = _ref(q, k, v, kv_lengths, q_positions, slopes=slopes)
    _assert_close(got, want)


def test_flash_decode_non_divisible_cache(flash_decode_attention):
    # serving caches are rarely block-aligned (e.g. prompt+headroom=1104);
    # the tail block is masked, not silently fallen back to XLA
    b, h, s, d = 2, 4, 368, 128  # 368 = 2*128 + 112 tail
    q, k, v = _mk(b, h, 4, s, d, jax.random.PRNGKey(6))
    k8, ksc = _quant(k)
    v8, vsc = _quant(v)
    kv_lengths = jnp.array([368, 300], jnp.int32)
    got = flash_decode_attention(
        q, k8, v8, kv_lengths=kv_lengths, q_positions=kv_lengths - 1,
        k_scale=ksc, v_scale=vsc, block_k=128, interpret=True,
    )
    want = _ref(q, k8, v8, kv_lengths, kv_lengths - 1, k_scale=ksc, v_scale=vsc)
    _assert_close(got, want)


def test_flash_decode_multi_query_verify_shape(flash_decode_attention):
    # speculative verify: gamma+1 queries per row attend the cache with
    # in-window causality (row j sees keys <= q_pos + j)
    b, h, hkv, s, d, sq = 2, 4, 2, 384, 128, 5
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (b, h, sq, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, hkv, s, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, hkv, s, d), jnp.bfloat16)
    k8, ksc = _quant(k)
    v8, vsc = _quant(v)
    slopes = alibi_slopes(h)
    first_qpos = jnp.array([200, 37], jnp.int32)
    kv_lengths = first_qpos + sq  # all sq tokens already written
    got = flash_decode_attention(
        q, k8, v8, kv_lengths=kv_lengths, q_positions=first_qpos,
        k_scale=ksc, v_scale=vsc, slopes=slopes, block_k=128, interpret=True,
    )
    want = _ref(q, k8, v8, kv_lengths, first_qpos, slopes=slopes,
                k_scale=ksc, v_scale=vsc)
    _assert_close(got, want)


def test_flash_decode_multi_query_bf16(flash_decode_attention):
    b, h, s, d, sq = 1, 2, 256, 128, 9  # gamma=8 verify window
    key = jax.random.PRNGKey(8)
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (b, h, sq, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.bfloat16)
    first_qpos = jnp.array([100], jnp.int32)
    kv_lengths = first_qpos + sq
    got = flash_decode_attention(
        q, k, v, kv_lengths=kv_lengths, q_positions=first_qpos,
        block_k=128, interpret=True,
    )
    want = _ref(q, k, v, kv_lengths, first_qpos)
    _assert_close(got, want)


def test_unrolled_decode_matches_scan_decode():
    # decode_unroll_layers trades the layer scan's xs->ys cache threading
    # for in-place .at[l].set updates; token streams must be identical
    from llark_tpu.config import ModelConfig
    from llark_tpu.generate import GenerationConfig, Generator
    from llark_tpu.models.fusion import init_llark_params

    base = dict(arch="llama", vocab_size=128, hidden_size=64,
                intermediate_size=128, num_layers=3, num_heads=2,
                num_kv_heads=2, head_dim=32, max_seq_len=256,
                mm_hidden_size=8, dtype="float32", param_dtype="float32",
                remat=False)
    gen = GenerationConfig(max_new_tokens=10, temperature=0.0,
                           stop_text="", eos_token_id=None)
    rng = np.random.RandomState(0)
    ids = rng.randint(5, 120, size=(2, 21)).astype(np.int32)
    lens = np.array([21, 9], np.int32)
    for quant in (False, True):
        outs = {}
        for unroll in (False, True):
            cfg = ModelConfig(**base, kv_cache_quant=quant,
                              decode_unroll_layers=unroll)
            params = init_llark_params(cfg, jax.random.PRNGKey(0))
            g = Generator(cfg, params, audio_patch_id=3, gen_cfg=gen,
                          max_cache_len=64)
            toks = g.generate(jnp.asarray(ids), jnp.asarray(lens))
            outs[unroll] = [list(t) for t in toks]
        assert outs[True] == outs[False]


# ---------------------------------------------------------------------------
# Paged (block-table) mode: caches are physical block pools shared by all
# rows; the table indirection happens in the BlockSpec index_map.
# ---------------------------------------------------------------------------


def _page(dense, block_k, seed=0, n_spare=3):
    """Scatter a dense [B, Hkv, S, D] (or [B, Hkv, S] scale) cache into a
    randomly-permuted block pool + block tables. Physical block 0 is left
    as a never-referenced decoy so an off-by-one in the indirection shows
    up as a parity failure, not luck."""
    arr = np.asarray(dense)
    b, hkv, s = arr.shape[:3]
    assert s % block_k == 0
    mb = s // block_k
    n = 1 + b * mb + n_spare
    perm = np.random.RandomState(seed).permutation(n - 1) + 1
    tables = perm[: b * mb].reshape(b, mb)
    pool = np.random.RandomState(seed + 1).normal(
        size=(n, hkv, block_k) + arr.shape[3:]
    ).astype(np.float32)  # junk everywhere a table entry doesn't point
    pool = pool.astype(arr.dtype) if arr.dtype != np.int8 else (
        (pool * 10).astype(np.int8)
    )
    for bi in range(b):
        for i in range(mb):
            pool[tables[bi, i]] = arr[bi, :, i * block_k:(i + 1) * block_k]
    return jnp.asarray(pool), jnp.asarray(tables, jnp.int32)


def test_paged_decode_matches_dense_bf16():
    b, h, hkv, s, d, bk = 3, 4, 2, 512, 128, 128
    q, k, v = _mk(b, h, hkv, s, d, jax.random.PRNGKey(10))
    kp, tables = _page(k, bk, seed=0)
    vp, tables2 = _page(v, bk, seed=0)
    np.testing.assert_array_equal(np.asarray(tables), np.asarray(tables2))
    kv_lengths = jnp.array([512, 130, 1], jnp.int32)
    got = _fda(
        q, kp, vp, kv_lengths=kv_lengths, q_positions=kv_lengths - 1,
        block_tables=tables, interpret=True,
    )
    want = _ref(q, k, v, kv_lengths, kv_lengths - 1)
    _assert_close(got, want)


def test_paged_decode_int8_gqa_alibi_multiquery():
    # the full serving feature set through the paged path: int8 pool +
    # scale pool, GQA, alibi, gamma+1 verify window
    b, h, hkv, s, d, bk, sq = 2, 8, 4, 384, 128, 128, 5
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    q = jax.random.normal(ks[0], (b, h, sq, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, hkv, s, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, hkv, s, d), jnp.bfloat16)
    k8, ksc = _quant(k)
    v8, vsc = _quant(v)
    slopes = alibi_slopes(h)
    kp, tables = _page(k8, bk, seed=2)
    vp, _ = _page(v8, bk, seed=2)
    kscp, _ = _page(ksc, bk, seed=2)
    vscp, _ = _page(vsc, bk, seed=2)
    first_qpos = jnp.array([200, 37], jnp.int32)
    kv_lengths = first_qpos + sq
    got = _fda(
        q, kp, vp, kv_lengths=kv_lengths, q_positions=first_qpos,
        k_scale=kscp, v_scale=vscp, slopes=slopes, block_tables=tables,
        interpret=True,
    )
    want = _ref(q, k8, v8, kv_lengths, first_qpos, slopes=slopes,
                k_scale=ksc, v_scale=vsc)
    _assert_close(got, want)


def test_paged_xla_fallback_matches_dense():
    from llark_tpu.ops.decode_attention import decode_attention

    b, h, hkv, s, d, bk = 2, 4, 2, 256, 64, 128  # d=64: Pallas gate says no
    q, k, v = _mk(b, h, hkv, s, d, jax.random.PRNGKey(12))
    kp, tables = _page(k, bk, seed=3)
    vp, _ = _page(v, bk, seed=3)
    kv_lengths = jnp.array([201, 64], jnp.int32)
    got = decode_attention(
        q, kp, vp, kv_lengths=kv_lengths, q_positions=kv_lengths - 1,
        block_tables=tables, use_pallas=False,
    )
    want = _ref(q, k, v, kv_lengths, kv_lengths - 1)
    _assert_close(got, want)
