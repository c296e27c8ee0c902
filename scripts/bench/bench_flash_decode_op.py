"""On-chip probe for the Pallas flash-decode kernel (ops/decode_attention.py).

1) parity vs xla_attention at GQA + int8 + alibi + ragged shapes
2) op-level timing at 7B decode shapes: N chained attention calls inside
   one jitted scan (q feeds back) so the dispatch floor amortizes away;
   reports ms/call and effective KV-read GB/s for flash vs XLA.

Run on the TPU host: python scripts/bench/bench_flash_decode_op.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from llark_tpu.ops.attention import alibi_slopes, xla_attention
from llark_tpu.ops.decode_attention import flash_decode_attention

N_CALLS = 64


def sync(x):
    return jax.device_get(jnp.sum(x).astype(jnp.float32))


def quant(x):
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    sc = amax / 127.0
    q = jnp.round(xf / jnp.maximum(sc, 1e-8)[..., None]).astype(jnp.int8)
    return q, sc


def parity():
    key = jax.random.PRNGKey(0)
    b, h, hkv, s, d = 4, 8, 4, 2048, 128
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (b, h, 1, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, hkv, s, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, hkv, s, d), jnp.bfloat16)
    k8, ksc = quant(k)
    v8, vsc = quant(v)
    slopes = alibi_slopes(h)
    lens = jnp.array([2048, 1024, 513, 1], jnp.int32)
    qpos = lens - 1
    for name, kk, vv, kscale, vscale, sl in [
        ("bf16", k, v, None, None, None),
        ("int8", k8, v8, ksc, vsc, None),
        ("int8+alibi", k8, v8, ksc, vsc, slopes),
    ]:
        got = jax.jit(
            lambda q, kk, vv: flash_decode_attention(
                q, kk, vv, kv_lengths=lens, q_positions=qpos,
                k_scale=kscale, v_scale=vscale, slopes=sl, block_k=512,
            )
        )(q, kk, vv)
        want = jax.jit(
            lambda q, kk, vv: xla_attention(
                q, kk, vv, causal=True, kv_lengths=lens, slopes=sl,
                q_offset=qpos, k_scale=kscale, v_scale=vscale,
            )
        )(q, kk, vv)
        g = np.asarray(got, np.float32)
        w = np.asarray(want, np.float32)
        err = np.abs(g - w).max() / max(np.abs(w).max(), 1e-6)
        print(f"parity[{name}]: max rel-to-max err {err:.3e}", flush=True)
        assert err < 2e-2, f"{name} mismatch"


def timing(b, live, quant_kv, block_k, s_max=2048, h=32, d=128):
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 3)
    q0 = jax.random.normal(ks[0], (b, h, 1, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, s_max, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, s_max, d), jnp.bfloat16)
    if quant_kv:
        k, ksc = quant(k)
        v, vsc = quant(v)
    else:
        ksc = vsc = None
    lens = jnp.full((b,), live, jnp.int32)
    qpos = lens - 1

    def loop(fn):
        def run(q, k, v):
            def body(qc, _):
                o = fn(qc, k, v)
                return o.astype(qc.dtype), ()
            q, _ = jax.lax.scan(body, q, None, length=N_CALLS)
            return q
        return jax.jit(run)

    flash = loop(lambda q, k, v: flash_decode_attention(
        q, k, v, kv_lengths=lens, q_positions=qpos,
        k_scale=ksc, v_scale=vsc, block_k=block_k))
    xla = loop(lambda q, k, v: xla_attention(
        q, k, v, causal=True, kv_lengths=lens, q_offset=qpos,
        k_scale=ksc, v_scale=vsc))

    out = {}
    itemsize = 1 if quant_kv else 2
    CHAIN = 8  # chained program calls per sync: amortizes the ~50 ms
    # tunnel round-trip latency that otherwise swamps op-level timing
    for name, fn in [("flash", flash), ("xla", xla)]:
        qq = fn(q0, k, v)  # compile + warm
        sync(qq)
        best = np.inf
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(CHAIN):
                qq = fn(qq, k, v)
            sync(qq)
            best = min(best, time.perf_counter() - t0)
        per_call = best / (N_CALLS * CHAIN)
        # flash reads only the live blocks; XLA reads the padded cache
        live_read = live if name == "flash" else s_max
        kv_bytes = 2 * b * h * d * live_read * itemsize
        out[name] = {
            "us_per_call": round(per_call * 1e6, 1),
            "kv_gbps": round(kv_bytes / per_call / 1e9, 0),
        }
    cfgname = f"B{b} live{live} {'int8' if quant_kv else 'bf16'} bk{block_k}"
    print(f"{cfgname}: {out}", flush=True)
    return {"cfg": cfgname, **out}


def main():
    print(f"devices: {jax.devices()}", flush=True)
    parity()
    rows = []
    for b in (1, 8):
        rows.append(timing(b, live=1024, quant_kv=True, block_k=512))
    # block size sweep at the batch-8 int8 shape
    rows.append(timing(8, live=1024, quant_kv=True, block_k=2048))
    print(json.dumps(rows))
    with open("scripts/bench/results_flash_decode_op.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
