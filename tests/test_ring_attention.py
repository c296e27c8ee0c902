"""Ring attention == full attention, sequence sharded over the mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llark_tpu.ops.attention import alibi_slopes, xla_attention
from llark_tpu.parallel.mesh import make_mesh
from llark_tpu.parallel.ring_attention import ring_attention


def make_qkv(b=2, h=4, s=64, d=16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("axis_size", [2, 4, 8])
def test_ring_matches_full_causal(axis_size):
    mesh = make_mesh((1, 8 // axis_size, axis_size))
    q, k, v = make_qkv()
    ref = xla_attention(q, k, v, causal=True)
    got = ring_attention(q, k, v, mesh, axis="tensor", causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_ring_with_ragged_lengths_and_alibi():
    mesh = make_mesh((1, 2, 4))
    q, k, v = make_qkv(b=3, h=4, s=32, d=8, seed=1)
    kv_len = jnp.array([32, 17, 5], jnp.int32)
    slopes = alibi_slopes(4)
    ref = xla_attention(q, k, v, causal=True, kv_lengths=kv_len, slopes=slopes)
    got = ring_attention(
        q, k, v, mesh, axis="tensor", causal=True, kv_lengths=kv_len, slopes=slopes
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_ring_non_causal():
    mesh = make_mesh((1, 1, 8))
    q, k, v = make_qkv(s=40, seed=2)
    ref = xla_attention(q, k, v, causal=False)
    got = ring_attention(q, k, v, mesh, axis="tensor", causal=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_ring_long_audio_scale():
    """The motivating case: un-pooled Jukebox frame counts (345 Hz)."""
    mesh = make_mesh((1, 1, 8))
    q, k, v = make_qkv(b=1, h=2, s=1024, d=8, seed=3)
    ref = xla_attention(q, k, v, causal=True)
    got = ring_attention(q, k, v, mesh, axis="tensor", causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)
