"""Capture a device trace of the Jukebox encode graph and print the
op-level time breakdown.

Purpose (round-3): the round-2 roofline work measured ~36% of encode time
as non-matmul overhead (elementwise/LN/attention-permute) but never
attributed it op-by-op. This script runs K profiled encode dispatches on
the real chip, converts the xplane capture with tensorboard_plugin_profile
(offline), and prints the per-op and per-category self-time tables that
decide what to fuse next.

Usage: python scripts/bench/profile_jukebox.py [batch] [outdir]
"""

import glob
import json
import sys

import numpy as np

import jax
import jax.numpy as jnp


def capture(b: int, outdir: str) -> None:
    from llark_tpu.encoders.jukebox import (
        JukeboxEncoder,
        JukeboxPriorConfig,
        JukeboxVQVAEConfig,
    )

    enc = JukeboxEncoder.random_init(
        JukeboxVQVAEConfig(dtype="bfloat16"),
        JukeboxPriorConfig(dtype="bfloat16"),
        pool_frames_per_second=10.0,
        transfer_dtype="int16",
        output_dtype="bfloat16",
    )
    audio = np.random.RandomState(0).randn(b, enc.samples_per_ctx)
    xfer = enc._prepare_transfer(audio.astype(np.float32))
    out = enc._encode(enc.vq_params, enc.prior_params, xfer)  # compile
    jax.device_get(jnp.sum(out).astype(jnp.float32))

    with jax.profiler.trace(outdir):
        outs = [
            enc._encode(enc.vq_params, enc.prior_params, xfer)
            for _ in range(4)
        ]
        jax.device_get(
            jnp.sum(sum(jnp.sum(o) for o in outs)).astype(jnp.float32)
        )


def report(outdir: str) -> None:
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    xplanes = sorted(glob.glob(outdir + "/**/*.xplane.pb", recursive=True))
    assert xplanes, f"no xplane capture under {outdir}"
    xplane = xplanes[-1]
    print(f"# capture: {xplane}")

    for tool in ("op_profile", "tensorflow_stats^", "framework_op_stats^",
                 "overview_page^"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data([xplane], tool, {})
        except Exception as e:  # tool set varies by plugin version
            print(f"## {tool}: unavailable ({type(e).__name__}: {e})")
            continue
        path = f"{outdir}/{tool.rstrip('^')}.out"
        mode = "wb" if isinstance(data, bytes) else "w"
        with open(path, mode) as f:
            f.write(data)
        print(f"## {tool} -> {path} ({len(data)} bytes)")
        if tool == "op_profile":
            try:
                tree = json.loads(data)

                def walk(node, depth=0):
                    m = node.get("metrics", {})
                    t = m.get("time", 0.0)
                    if depth <= 2 and t:
                        print(
                            f"{'  ' * depth}{node.get('name', '?')[:70]}"
                            f"  time={t:.4f} flops={m.get('flops', 0):.4f}"
                        )
                    for c in node.get("children", [])[:12]:
                        walk(c, depth + 1)

                root = tree.get("byCategory") or tree
                walk(root)
            except Exception as e:
                print(f"(op_profile parse failed: {e})")


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/jb_trace"
    capture(b, outdir)
    report(outdir)
