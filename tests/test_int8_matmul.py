"""Fused int8 dequant-dot kernel (ops/int8_matmul.py): parity against the
XLA path on CPU (interpret mode). The performance question it exists to
answer is measured on chip by scripts/bench/bench_int8_matmul.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llark_tpu.models.quant import quantize_weight, quantized_dense
from llark_tpu.ops.int8_matmul import int8_matmul, quantized_dense_kernel


@pytest.mark.parametrize("m,k,n", [(16, 256, 128), (32, 128, 384)])
def test_int8_matmul_matches_xla(m, k, n):
    rng = np.random.RandomState(0)
    x = rng.randn(m, k).astype(np.float32)
    w = (rng.randn(k, n) * 0.05).astype(np.float32)
    wq = quantize_weight(jnp.asarray(w))

    ref = quantized_dense(
        jnp.asarray(x)[None], wq, None, jnp.float32
    )[0]
    got = int8_matmul(
        jnp.asarray(x), wq["q"], wq["scale"], interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_quantized_dense_kernel_wrapper_pads_rows():
    """The drop-in wrapper flattens [B, S, H] and sublane-pads M; results
    match the XLA path including the bias."""
    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 128).astype(np.float32)  # M = 6, padded to 8
    w = (rng.randn(128, 256) * 0.05).astype(np.float32)
    b = rng.randn(256).astype(np.float32)
    wq = quantize_weight(jnp.asarray(w))

    ref = quantized_dense(jnp.asarray(x), wq, jnp.asarray(b), jnp.float32)
    got = quantized_dense_kernel(
        jnp.asarray(x), wq, jnp.asarray(b), jnp.float32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_int8_matmul_rejects_bad_shapes():
    x = jnp.zeros((8, 128), jnp.float32)
    q = jnp.zeros((256, 128), jnp.int8)
    with pytest.raises(ValueError, match="weight rows"):
        int8_matmul(x, q, jnp.ones((128,)), interpret=True)
    q = jnp.zeros((128, 128), jnp.int8)
    with pytest.raises(ValueError, match="scale size"):
        int8_matmul(x, q, jnp.ones((64,)), interpret=True)
