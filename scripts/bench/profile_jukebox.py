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


def _category(name: str) -> str:
    n = name.lower()
    for marker, cat in (
        ("fusion", "fusion"), ("dot", "matmul"), ("conv", "conv"),
        ("copy", "copy/transpose"), ("transpose", "copy/transpose"),
        ("dynamic-update-slice", "dus"), ("dynamic_update", "dus"),
        ("scatter", "scatter"), ("gather", "gather"),
        ("all-reduce", "collective"), ("reduce", "reduce"),
        ("custom-call", "custom-call"), ("select", "elementwise"),
        ("add", "elementwise"), ("multiply", "elementwise"),
        ("exp", "elementwise"), ("broadcast", "elementwise"),
        ("iota", "elementwise"), ("compare", "elementwise"),
        ("convert", "convert"), ("bitcast", "copy/transpose"),
        ("infeed", "infeed/outfeed"), ("outfeed", "infeed/outfeed"),
    ):
        if marker in n:
            return cat
    return "other"


def report(outdir: str, top: int = 30) -> None:
    """Parse the raw xplane capture (TF's own proto — the
    tensorboard_plugin_profile converters mismatch this protobuf) and
    print per-op and per-category device self-time tables."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xplanes = sorted(glob.glob(outdir + "/**/*.xplane.pb", recursive=True))
    assert xplanes, f"no xplane capture under {outdir}"
    xplane = xplanes[-1]
    print(f"# capture: {xplane}")
    space = xplane_pb2.XSpace()
    with open(xplane, "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = {m.id: (m.display_name or m.name) for m in
                plane.event_metadata.values()}
        # choose the op-level line: the one with the most events
        lines = [(ln, sum(1 for _ in ln.events)) for ln in plane.lines]
        if not lines:
            continue
        print(f"\n## plane: {plane.name}")
        for ln in plane.lines:
            # SELF time: events on one line nest (while bodies, calls);
            # subtract each event's children via an interval stack so
            # scopes don't double-count their contents
            evs = sorted(
                ((ev.offset_ps, ev.duration_ps, ev.metadata_id)
                 for ev in ln.events),
                key=lambda t: (t[0], -t[1]),
            )
            durs: dict = {}
            stack: list = []  # (end_ps, child_total accumulator index)
            selfs = []
            for off, dur, mid in evs:
                while stack and off >= stack[-1][0]:
                    stack.pop()
                if stack:
                    stack[-1][1][0] -= dur  # parent loses child time
                acc = [dur]
                selfs.append((mid, acc))
                stack.append((off + dur, acc))
            for mid, acc in selfs:
                name = meta.get(mid, str(mid))
                durs[name] = durs.get(name, 0.0) + max(acc[0], 0) / 1e12
            if not durs:
                continue
            total = sum(durs.values())
            print(f"### line: {ln.name}  events={len(list(ln.events))} "
                  f"busy={total * 1e3:.3f} ms")
            if "op" not in ln.name.lower() and len(durs) < 8:
                for name, t in sorted(durs.items(), key=lambda kv: -kv[1])[:6]:
                    print(f"  {t/total:6.1%} {t*1e3:9.3f} ms  {name[:80]}")
                continue
            cats: dict = {}
            for name, t in durs.items():
                cats[_category(name)] = cats.get(_category(name), 0.0) + t
            print("  -- by category --")
            for cat, t in sorted(cats.items(), key=lambda kv: -kv[1]):
                print(f"  {t/total:6.1%} {t*1e3:9.3f} ms  {cat}")
            print(f"  -- top {top} ops --")
            for name, t in sorted(durs.items(), key=lambda kv: -kv[1])[:top]:
                print(f"  {t/total:6.1%} {t*1e3:9.3f} ms  {name[:90]}")


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/jb_trace"
    capture(b, outdir)
    report(outdir)
