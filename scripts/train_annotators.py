"""Train the neural annotators (BeatNet TCN + KeyNet chroma CNN) on the
seeded synthetic corpus and save committed weights.

madmom-architecture parity step (reference m2t/annotation.py:29-111 uses
madmom's TRAINED RNN/CNN models): small networks trained on synthesis,
decoded by the same dynamic programs the DSP annotators use. Training
seeds (>= 1e6) are disjoint from the synthbench evaluation seeds
(family_seed * 10_000 + i with small seeds).

Runs on CPU in a few minutes:
    python scripts/train_annotators.py [--steps-beat 3000] [--steps-key 2000]
Writes llark_tpu/audio/weights/neural_annotators.npz and prints held-out
validation scores per family.
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax

from llark_tpu.audio import neural
from llark_tpu.audio.synthbench import FAMILIES, SR, make_clip

TRAIN_SEED_BASE = 1_000_000  # synthbench eval seeds are seed*10_000 + i


# ---------------------------------------------------------------------------
# jax forwards (mirror neural.py's numpy forwards; parity is under test)
# ---------------------------------------------------------------------------


def conv1d(x, w, b, dilation):
    """x [B, T, Cin], w [k, Cin, Cout] -> [B, T, Cout], 'same' padding."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding="SAME",
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + b


def beat_forward(params, feats):
    h = feats
    for i, (_k, d, _ci, _co) in enumerate(neural.BEAT_LAYERS):
        h = jax.nn.relu(conv1d(h, params[f"beat/conv{i}_w"],
                               params[f"beat/conv{i}_b"], d))
    return h @ params["beat/head_w"] + params["beat/head_b"]  # logits [B,T,2]


def key_forward(params, chroma):
    h = chroma
    for i, (_k, d, _ci, _co) in enumerate(neural.KEY_LAYERS):
        h = jax.nn.relu(conv1d(h, params[f"key/conv{i}_w"],
                               params[f"key/conv{i}_b"], d))
    pooled = jnp.concatenate([h.mean(axis=1), h.max(axis=1)], axis=-1)
    h2 = jax.nn.relu(pooled @ params["key/fc0_w"] + params["key/fc0_b"])
    return h2 @ params["key/fc1_w"] + params["key/fc1_b"]  # [B, 24]


def init_params(shapes, key):
    params = {}
    for name, shape in shapes.items():
        key, sub = jax.random.split(key)
        if name.endswith("_b"):
            params[name] = jnp.zeros(shape, jnp.float32)
        else:
            fan_in = int(np.prod(shape[:-1]))
            params[name] = jax.random.normal(sub, shape, jnp.float32) * (
                2.0 / fan_in
            ) ** 0.5
    return params


# ---------------------------------------------------------------------------
# Data
# ---------------------------------------------------------------------------


def smear_targets(times, n_frames, fps):
    """Frame targets: 1 at event frames, 0.5 at +-1 frame."""
    t = np.zeros(n_frames, np.float32)
    for s in times:
        f = int(round(s * fps))
        if 0 <= f < n_frames:
            t[f] = 1.0
            for df in (-1, 1):
                g = f + df
                if 0 <= g < n_frames:
                    t[g] = max(t[g], 0.5)
    return t


def build_beat_dataset(n_per_family, seed_base, seconds=12.0, families=None):
    feats, targs = [], []
    for fi, fam in enumerate(FAMILIES):
        if families is not None and fam not in families:
            continue
        for i in range(n_per_family):
            audio, truth = make_clip(seed_base + fi * 1000 + i, seconds,
                                     family=fam)
            f = neural.beat_features(audio, SR)
            t = np.stack([
                smear_targets(truth["beats"], len(f), neural.BEAT_FPS),
                smear_targets(truth["downbeats"], len(f), neural.BEAT_FPS),
            ], axis=1)
            feats.append(f)
            targs.append(t)
    return feats, targs


def build_key_dataset(n_per_family, seed_base, seconds=12.0, n_frames=120,
                      families=None):
    xs, ys = [], []
    for fi, fam in enumerate(FAMILIES):
        if fam == "perc":
            continue  # no tonal content
        if families is not None and fam not in families:
            continue
        for i in range(n_per_family):
            audio, truth = make_clip(seed_base + fi * 1000 + i, seconds,
                                     family=fam)
            c = neural.key_features(audio, SR)
            if len(c) < n_frames:
                c = np.pad(c, ((0, n_frames - len(c)), (0, 0)))
            xs.append(c[:n_frames])
            ys.append(neural.key_index(truth["key"]))
    return np.stack(xs), np.array(ys, np.int32)


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------


def train_beat(feats, targs, steps, batch, crop, lr, rng):
    params = init_params(neural.beat_param_shapes(), jax.random.PRNGKey(0))
    opt = optax.adam(lr)
    state = opt.init(params)

    def loss_fn(p, x, t):
        logits = beat_forward(p, x)
        # weighted BCE: positives are ~3% (beat) / ~1% (downbeat) of frames
        w = jnp.where(t > 0, jnp.array([8.0, 16.0]), 1.0)
        bce = optax.sigmoid_binary_cross_entropy(logits, t)
        return (w * bce).mean()

    @jax.jit
    def step(p, s, x, t):
        loss, g = jax.value_and_grad(loss_fn)(p, x, t)
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s, loss

    n = len(feats)
    losses = []
    for it in range(steps):
        xb = np.zeros((batch, crop, neural.BEAT_N_MELS), np.float32)
        tb = np.zeros((batch, crop, 2), np.float32)
        for b in range(batch):
            ci = rng.randint(n)
            f, t = feats[ci], targs[ci]
            if len(f) > crop:
                o = rng.randint(len(f) - crop)
                xb[b], tb[b] = f[o:o + crop], t[o:o + crop]
            else:
                xb[b, :len(f)], tb[b, :len(f)] = f, t
        params, state, loss = step(params, state, xb, tb)
        losses.append(float(loss))
        if (it + 1) % 200 == 0:
            print(f"  beat step {it + 1}/{steps} loss "
                  f"{np.mean(losses[-200:]):.4f}", flush=True)
    return params


def train_key(xs, ys, steps, batch, lr, rng):
    params = init_params(neural.key_param_shapes(), jax.random.PRNGKey(1))
    opt = optax.adam(lr)
    state = opt.init(params)

    def loss_fn(p, x, y):
        logits = key_forward(p, x)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y
        ).mean()

    @jax.jit
    def step(p, s, x, y):
        loss, g = jax.value_and_grad(loss_fn)(p, x, y)
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s, loss

    n = len(xs)
    losses = []
    for it in range(steps):
        idx = rng.randint(n, size=batch)
        rolls = rng.randint(12, size=batch)
        xb = np.stack([np.roll(xs[i], r, axis=1) for i, r in zip(idx, rolls)])
        # chroma rolled UP by r semitones transposes the tonic up by r
        yb = ((ys[idx] // 2 + rolls) % 12) * 2 + ys[idx] % 2
        params, state, loss = step(params, state, xb, yb.astype(np.int32))
        losses.append(float(loss))
        if (it + 1) % 200 == 0:
            print(f"  key step {it + 1}/{steps} loss "
                  f"{np.mean(losses[-200:]):.4f}", flush=True)
    return params


def run_lofo(ns):
    """Leave-one-family-out: for each family F, train on FAMILIES - {F}
    and score on F (disjoint eval seeds). Compares against the committed
    all-family model and the DSP baseline on the same clips."""
    import json
    import tempfile

    from llark_tpu.audio.synthbench import run_benchmark

    score_keys = ("beat_f", "downbeat_f", "tempo_acc2", "key_mirex")
    results = []
    for excl in FAMILIES:
        rng = np.random.RandomState(0)
        train_fams = [f for f in FAMILIES if f != excl]
        print(f"\n=== LOFO: excluding '{excl}' (train on {train_fams}) ===",
              flush=True)
        feats, targs = build_beat_dataset(ns.clips_per_family, TRAIN_SEED_BASE,
                                          families=train_fams)
        beat_params = train_beat(feats, targs, ns.steps_beat, ns.batch,
                                 ns.crop, ns.lr, rng)
        key_fams = [f for f in train_fams if f != "perc"]
        xs, ys = build_key_dataset(ns.clips_per_family, TRAIN_SEED_BASE,
                                   families=key_fams)
        key_params = train_key(xs, ys, ns.steps_key, 64, ns.lr, rng)
        params = {k: np.asarray(v, np.float32)
                  for k, v in {**beat_params, **key_params}.items()}
        with tempfile.NamedTemporaryFile(suffix=".npz", delete=False) as tf:
            np.savez_compressed(tf.name, **params)
            lofo_path = tf.name
        neural._PARAMS_CACHE.clear()
        lofo_scores = run_benchmark(
            ns.eval_n, 12.0, seed=777, family=excl,
            annotators=neural.neural_annotators(weights=lofo_path),
        )
        all_scores = (
            run_benchmark(ns.eval_n, 12.0, seed=777, family=excl,
                          annotators=neural.neural_annotators())
            if os.path.exists(neural.WEIGHTS_PATH) else {}
        )
        dsp_scores = run_benchmark(ns.eval_n, 12.0, seed=777, family=excl)
        os.unlink(lofo_path)
        row = {"excluded_family": excl}
        for k in score_keys:
            for tag, scores in (("lofo", lofo_scores), ("allfam", all_scores),
                                ("dsp", dsp_scores)):
                if k in scores:  # perc has no tonal truth -> no key_mirex
                    row[f"{tag}_{k}"] = round(float(scores[k]), 3)
        print("  " + json.dumps(row), flush=True)
        results.append(row)

    out_path = os.path.join(os.path.dirname(__file__), "bench",
                            "results_lofo_annotators.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump({"clips_per_family": ns.clips_per_family,
                   "eval_n": ns.eval_n, "rows": results}, f, indent=2)
    print(f"\nwrote {out_path}")
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--clips-per-family", type=int, default=40)
    ap.add_argument("--steps-beat", type=int, default=3000)
    ap.add_argument("--steps-key", type=int, default=2500)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--crop", type=int, default=1000)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default=neural.WEIGHTS_PATH)
    ap.add_argument("--eval-n", type=int, default=10,
                    help="held-out clips per family for the post-train score")
    ap.add_argument("--lofo", action="store_true",
                    help="leave-one-family-out generalization study: train "
                         "len(FAMILIES) models, each with one family fully "
                         "EXCLUDED from training, and score each on its "
                         "excluded family (VERDICT r3 item 6 — whether the "
                         "neural annotators transfer across synthesis "
                         "families or are in-distribution only). Writes "
                         "scripts/bench/results_lofo_annotators.json; does "
                         "NOT touch the committed weights")
    ns = ap.parse_args(argv)
    rng = np.random.RandomState(0)

    if ns.lofo:
        return run_lofo(ns)

    t0 = time.time()
    print("building beat dataset...", flush=True)
    feats, targs = build_beat_dataset(ns.clips_per_family, TRAIN_SEED_BASE)
    print(f"  {len(feats)} clips in {time.time() - t0:.0f}s", flush=True)
    beat_params = train_beat(feats, targs, ns.steps_beat, ns.batch, ns.crop,
                             ns.lr, rng)

    t0 = time.time()
    print("building key dataset...", flush=True)
    xs, ys = build_key_dataset(ns.clips_per_family, TRAIN_SEED_BASE)
    print(f"  {len(xs)} clips in {time.time() - t0:.0f}s", flush=True)
    key_params = train_key(xs, ys, ns.steps_key, 64, ns.lr, rng)

    params = {k: np.asarray(v, np.float32)
              for k, v in {**beat_params, **key_params}.items()}
    os.makedirs(os.path.dirname(ns.out), exist_ok=True)
    np.savez_compressed(ns.out, **params)
    size_kb = os.path.getsize(ns.out) / 1024
    print(f"saved {ns.out} ({size_kb:.0f} KB, "
          f"{sum(v.size for v in params.values())} params)")

    if ns.eval_n:
        from llark_tpu.audio.synthbench import run_benchmark

        neural._PARAMS_CACHE.clear()  # pick up the fresh weights
        chain = neural.neural_annotators(weights=ns.out)
        print("\nheld-out validation (seeds disjoint from train AND from "
              "the synthbench eval):")
        for fam in FAMILIES:
            scores = run_benchmark(ns.eval_n, 12.0, seed=777, family=fam,
                                   annotators=chain)
            line = " ".join(
                f"{k}={v:.3f}" for k, v in scores.items()
                if isinstance(v, float)
            )
            print(f"  {fam}: {line}", flush=True)


if __name__ == "__main__":
    main()
