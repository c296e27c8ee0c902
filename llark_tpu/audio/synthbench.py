"""Annotator accuracy benchmark on synthesized music with known ground truth.

The reference's pseudo-labels come from madmom's *trained* models (CNN key,
RNN+DBN downbeats, CNN+CRF chords — reference: m2t/annotation.py:29-111)
whose accuracy is published on MIREX-style datasets. This environment has
no network egress (no GiantSteps/Beatles audio), so annotator quality is
scored on seeded synthetic clips instead: diatonic chord progressions
rendered with harmonic-rich tones, bass, and a kick/hat drum pattern, with
key / tempo / beats / downbeats / chord segments known by construction.

This measures algorithmic correctness under controlled polyphony — NOT
real-recording accuracy; that gap is documented in PERFORMANCE.md. Scored
with the standard MIR definitions (MIREX weighted key score, tempo acc
with octave tolerance, beat/downbeat F-measure at ±70 ms, frame-level
majmin chord recall).

CLI:  python -m llark_tpu.audio.synthbench --n 40 --seconds 12 --seed 0
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, List, Sequence, Tuple

import numpy as np

from llark_tpu.audio.annotate import annotate_elem
from llark_tpu.audio.dsp import NOTE_NAMES

SR = 22050

# diatonic triads by scale degree: (semitone offset from tonic, quality)
MAJOR_TRIADS = [(0, "maj"), (5, "maj"), (7, "maj"), (9, "min"), (2, "min"), (4, "min")]
MINOR_TRIADS = [(0, "min"), (5, "min"), (7, "min"), (8, "maj"), (3, "maj"), (10, "maj")]


def _tone(freq: float, n: int, sr: int, rng: np.random.RandomState,
          n_harm: int = 6, decay: float = 3.0) -> np.ndarray:
    """Harmonic-rich decaying tone (sawtooth-ish additive synthesis)."""
    t = np.arange(n) / sr
    out = np.zeros(n, np.float64)
    phase = rng.uniform(0, 2 * np.pi, n_harm)
    for h in range(1, n_harm + 1):
        f = freq * h
        if f >= sr / 2:
            break
        out += np.sin(2 * np.pi * f * t + phase[h - 1]) / h
    return (out * np.exp(-decay * t)).astype(np.float32)


def _kick(n: int, sr: int) -> np.ndarray:
    t = np.arange(n) / sr
    f = 120.0 * np.exp(-20.0 * t) + 45.0
    return (np.sin(2 * np.pi * np.cumsum(f) / sr) * np.exp(-25.0 * t)).astype(np.float32)


def _hat(n: int, sr: int, rng: np.random.RandomState) -> np.ndarray:
    t = np.arange(n) / sr
    return (rng.randn(n) * np.exp(-60.0 * t)).astype(np.float32)


def make_clip(seed: int, seconds: float = 12.0, sr: int = SR) -> Tuple[np.ndarray, Dict]:
    """Render one clip; returns (samples, ground_truth)."""
    rng = np.random.RandomState(seed)
    tonic = int(rng.randint(12))
    mode = "major" if rng.uniform() < 0.5 else "minor"
    bpm = float(rng.uniform(70, 180))
    bpb = int(rng.choice([3, 4]))
    beat = 60.0 / bpm
    n_total = int(seconds * sr)
    audio = np.zeros(n_total + sr, np.float32)

    triads = MAJOR_TRIADS if mode == "major" else MINOR_TRIADS
    # progression: start on the tonic, then random diatonic bars
    n_bars = int(np.ceil(seconds / (beat * bpb))) + 1
    degrees = [0] + [int(rng.randint(len(triads))) for _ in range(n_bars - 1)]

    beat_times: List[float] = []
    downbeat_times: List[float] = []
    chords: List[Dict] = []
    for bar in range(n_bars):
        off, quality = triads[degrees[bar]]
        root_pc = (tonic + off) % 12
        bar_t = bar * bpb * beat
        if bar_t >= seconds:
            break
        chords.append({
            "start_time": bar_t,
            "end_time": min((bar + 1) * bpb * beat, seconds),
            "chord": f"{NOTE_NAMES[root_pc]} {'major' if quality == 'maj' else 'minor'}",
        })
        third = 4 if quality == "maj" else 3
        pcs = [root_pc, (root_pc + third) % 12, (root_pc + 7) % 12]
        for b in range(bpb):
            t0 = bar_t + b * beat
            if t0 >= seconds:
                break
            i0 = int(t0 * sr)
            beat_times.append(t0)
            if b == 0:
                downbeat_times.append(t0)
            n_note = int(min(beat * 1.2, 1.5) * sr)
            # chord tones around octave 4 + bass root (octave 2)
            amp = 0.5 if b == 0 else 0.35
            for pc in pcs:
                f = 440.0 * 2 ** ((pc - 9) / 12)  # pc in octave 4
                seg = _tone(f, n_note, sr, rng) * amp * 0.25
                audio[i0:i0 + n_note] += seg
            fb = 440.0 * 2 ** ((root_pc - 9) / 12) / 4  # bass, 2 octaves down
            audio[i0:i0 + n_note] += _tone(fb, n_note, sr, rng, n_harm=3) * amp * 0.5
            nk = int(0.08 * sr)
            audio[i0:i0 + nk] += _kick(nk, sr) * (0.9 if b == 0 else 0.5)
            nh = int(0.05 * sr)
            ih = int((t0 + beat / 2) * sr)
            audio[ih:ih + nh] += _hat(nh, sr, rng) * 0.08
    audio = audio[:n_total]
    audio = audio / max(np.abs(audio).max(), 1e-9) * 0.8
    audio += rng.randn(n_total).astype(np.float32) * 0.003  # light noise floor
    truth = {
        "key": f"{NOTE_NAMES[tonic]} {mode}",
        "tempo": bpm,
        "beats": np.array(beat_times),
        "downbeats": np.array(downbeat_times),
        "beats_per_bar": bpb,
        "chords": chords,
    }
    return audio.astype(np.float32), truth


# ---------------------------------------------------------------------------
# Scoring (standard MIR definitions)
# ---------------------------------------------------------------------------


def f_measure_events(pred: Sequence[float], truth: Sequence[float],
                     tol: float = 0.07) -> float:
    """Event F-measure with ±tol matching (greedy one-to-one, the
    mir_eval.beat.f_measure definition)."""
    pred = sorted(pred)
    truth = sorted(truth)
    if not pred and not truth:
        return 1.0
    if not pred or not truth:
        return 0.0
    used = np.zeros(len(truth), bool)
    hits = 0
    for p in pred:
        diffs = np.abs(np.asarray(truth) - p)
        diffs[used] = np.inf
        j = int(np.argmin(diffs))
        if diffs[j] <= tol:
            used[j] = True
            hits += 1
    prec = hits / len(pred)
    rec = hits / len(truth)
    return 0.0 if hits == 0 else 2 * prec * rec / (prec + rec)


def tempo_accuracy(pred: float, truth: float, tol: float = 0.04,
                   octaves: Sequence[float] = (1.0,)) -> bool:
    return any(abs(pred - truth * m) <= tol * truth * m for m in octaves)


def chord_frame_recall(pred: List[Dict], truth: List[Dict], seconds: float,
                       fps: int = 10) -> float:
    """Frame-level majmin chord symbol recall on an fps grid."""
    def grid(segs):
        g = ["no chord"] * int(seconds * fps)
        for s in segs:
            a = int(round(s["start_time"] * fps))
            b = min(int(round(s["end_time"] * fps)), len(g))
            for i in range(a, b):
                g[i] = s["chord"]
        return g

    gp, gt = grid(pred), grid(truth)
    return float(np.mean([a == b for a, b in zip(gp, gt)]))


def run_benchmark(n: int = 40, seconds: float = 12.0, seed: int = 0,
                  verbose: bool = False) -> Dict[str, float]:
    from llark_tpu.evaluation.utils import mirex_key_score

    key_exact = key_mirex = 0.0
    acc1 = acc2 = 0.0
    beat_f = dbn_f = chord_rec = bpb_acc = 0.0
    for i in range(n):
        audio, truth = make_clip(seed * 10_000 + i, seconds)
        elem = annotate_elem({"audio": audio, "audio_sample_rate": SR})
        key_exact += float(elem["key"] == truth["key"])
        key_mirex += mirex_key_score(elem["key"], truth["key"])
        tm = elem["tempo_in_beats_per_minute_madmom"]
        acc1 += float(tempo_accuracy(tm, truth["tempo"]))
        acc2 += float(tempo_accuracy(tm, truth["tempo"],
                                     octaves=(1.0, 2.0, 0.5, 3.0, 1 / 3)))
        beats_pred = [d["time"] for d in elem["downbeats_librosa"]]
        beat_f += f_measure_events(beats_pred, truth["beats"])
        db_pred = [d["time"] for d in elem["downbeats_madmom"] if d["beat_number"] == 1]
        dbn_f += f_measure_events(db_pred, truth["downbeats"])
        bpbs = [d["beat_number"] for d in elem["downbeats_madmom"]]
        bpb_acc += float(max(bpbs, default=0) == truth["beats_per_bar"])
        chord_rec += chord_frame_recall(elem["chords"], truth["chords"], seconds)
        if verbose:
            print(f"  clip {i}: key {elem['key']} vs {truth['key']}; "
                  f"tempo {tm:.1f} vs {truth['tempo']:.1f}; bpb "
                  f"{max(bpbs, default=0)} vs {truth['beats_per_bar']}")
    return {
        "n": n,
        "key_exact": key_exact / n,
        "key_mirex": key_mirex / n,
        "tempo_acc1": acc1 / n,
        "tempo_acc2": acc2 / n,
        "beat_f": beat_f / n,
        "downbeat_f": dbn_f / n,
        "bpb_acc": bpb_acc / n,
        "chord_frame_recall": chord_rec / n,
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--n", type=int, default=40)
    ap.add_argument("--seconds", type=float, default=12.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--verbose", action="store_true")
    ns = ap.parse_args(argv)
    scores = run_benchmark(ns.n, ns.seconds, ns.seed, ns.verbose)
    for k, v in scores.items():
        print(f"{k:>22}: {v:.3f}" if isinstance(v, float) else f"{k:>22}: {v}")
    print(json.dumps(scores))
    return scores


if __name__ == "__main__":
    main()
