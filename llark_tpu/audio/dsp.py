"""Host-side music DSP primitives: onset envelope, chroma, beat tracking.

These back the annotation stage (llark_tpu/audio/annotate.py), replacing
madmom's Cython/C processors (reference: m2t/annotation.py) with
numpy implementations of the classic algorithms:
  * onset envelope: log-mel spectral flux (Böck et al.)
  * tempo: autocorrelation of the onset envelope with a log-normal prior
    (Ellis 2007)
  * beats: dynamic-programming beat tracker (Ellis 2007)
  * chroma: FFT-bin -> pitch-class projection
The numerical *values* differ from madmom's neural models; the output
interfaces and units are identical (see annotate.py).
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

from llark_tpu.audio.mel import hann_window, mel_filterbank


def _stft_mag(x: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """Magnitude STFT [frames, n_fft//2+1] (center-padded)."""
    pad = n_fft // 2
    x = np.pad(x, (pad, pad), mode="reflect" if len(x) > pad else "constant")
    n_frames = 1 + (len(x) - n_fft) // hop
    win = hann_window(n_fft).astype(np.float32)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = x[idx] * win
    return np.abs(np.fft.rfft(frames, axis=-1)).astype(np.float32)


def onset_envelope(
    x: np.ndarray, sr: int, fps: int = 100, n_fft: int = 2048, n_mels: int = 80
) -> np.ndarray:
    """Log-mel spectral-flux onset strength at `fps` frames/second."""
    hop = int(round(sr / fps))
    mag = _stft_mag(x, n_fft, hop)
    fb = mel_filterbank(sr, n_fft, n_mels, 30.0, min(17000.0, sr / 2), htk=True)
    mel = mag @ fb.T
    logmel = np.log1p(1000.0 * mel)
    flux = np.diff(logmel, axis=0, prepend=logmel[:1])
    env = np.maximum(flux, 0.0).mean(axis=1)
    # local mean removal for sharper peaks
    k = max(1, fps // 10)
    kernel = np.ones(2 * k + 1) / (2 * k + 1)
    local = np.convolve(env, kernel, mode="same")
    return np.maximum(env - 0.7 * local, 0.0)


def estimate_tempo(
    env: np.ndarray, fps: int = 100, min_bpm: float = 40.0, max_bpm: float = 250.0
) -> List[Tuple[float, float]]:
    """Tempo candidates [(bpm, strength)] sorted by strength desc."""
    if len(env) < fps:
        return [(120.0, 1.0)]
    e = env - env.mean()
    ac = np.correlate(e, e, mode="full")[len(e) - 1 :]
    ac = ac / (ac[0] + 1e-9)
    lag_min = int(fps * 60.0 / max_bpm)
    lag_max = min(int(fps * 60.0 / min_bpm), len(ac) - 1)
    lags = np.arange(lag_min, lag_max + 1)
    bpms = 60.0 * fps / lags
    # log-normal preference centered ~120 BPM
    prior = np.exp(-0.5 * ((np.log2(bpms / 120.0)) / 0.9) ** 2)
    score = ac[lags] * prior
    order = np.argsort(score)[::-1]
    out = []
    used = np.zeros(len(lags), bool)
    for i in order[:20]:
        if used[i]:
            continue
        lo, hi = max(0, i - 2), min(len(lags), i + 3)
        used[lo:hi] = True
        out.append((float(bpms[i]), float(max(score[i], 0.0))))
        if len(out) >= 5:
            break
    return out


def track_beats(
    env: np.ndarray, fps: int = 100, bpm: Optional[float] = None, tightness: float = 100.0
) -> np.ndarray:
    """DP beat tracker (Ellis 2007). Returns beat times in seconds."""
    if bpm is None:
        bpm = estimate_tempo(env, fps)[0][0]
    period = max(1, int(round(fps * 60.0 / bpm)))
    n = len(env)
    if n == 0:
        return np.zeros(0)
    score = env.copy()
    backlink = np.full(n, -1, np.int64)
    for t in range(period // 2, n):
        lo = max(0, t - 2 * period)
        prev = np.arange(lo, max(lo, t - period // 2))
        if len(prev) == 0:
            continue
        rel = prev - t
        tc = -tightness * (np.log(np.maximum(-rel, 1) / period) ** 2)
        cand = score[prev] + tc
        j = int(np.argmax(cand))
        score[t] = env[t] + cand[j]
        backlink[t] = prev[j]
    # backtrace from the best late score
    tail = score[-period:] if n > period else score
    t = int(np.argmax(tail)) + (n - len(tail))
    beats = [t]
    while backlink[t] >= 0:
        t = int(backlink[t])
        beats.append(t)
    beats = np.array(beats[::-1], np.float64)
    return beats / fps


def chroma_from_audio(
    x: np.ndarray, sr: int, fps: float = 10.0, n_fft: int = 8192,
    return_energy: bool = False,
):
    """Pitch-class energy [frames, 12] at `fps`, max-normalized per frame.
    With return_energy, also returns the PRE-normalization per-frame energy
    [frames] (the normalized rows carry no loudness information)."""
    hop = int(round(sr / fps))
    mag = _stft_mag(x, n_fft, hop) ** 2
    freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    out = np.zeros((mag.shape[0], 12), np.float32)
    valid = (freqs > 55.0) & (freqs < 5000.0)
    midis = 69.0 + 12.0 * np.log2(np.maximum(freqs, 1e-6) / 440.0)
    pcs = np.round(midis).astype(int) % 12
    # harmonic whitening: weight high freqs down
    weight = 1.0 / np.maximum(freqs / 440.0, 1.0)
    for pc in range(12):
        sel = valid & (pcs == pc)
        out[:, pc] = (mag[:, sel] * weight[sel]).sum(axis=1)
    energy = out.sum(axis=1)
    norm = out.max(axis=1, keepdims=True)
    chroma = out / np.maximum(norm, 1e-9)
    if return_energy:
        return chroma, energy
    return chroma


KRUMHANSL_MAJOR = np.array(
    [6.35, 2.23, 3.48, 2.33, 4.38, 4.09, 2.52, 5.19, 2.39, 3.66, 2.29, 2.88]
)
KRUMHANSL_MINOR = np.array(
    [6.33, 2.68, 3.52, 5.38, 2.60, 3.53, 2.54, 4.75, 3.98, 2.69, 3.34, 3.17]
)

NOTE_NAMES = ("C", "C#", "D", "D#", "E", "F", "F#", "G", "G#", "A", "A#", "B")


def estimate_key(chroma: np.ndarray) -> str:
    """Krumhansl-Schmuckler correlation -> '<tonic> major|minor' (madmom
    key_prediction_to_label format)."""
    mean = chroma.mean(axis=0)
    if mean.sum() <= 0:
        return "C major"
    best_score, best = -np.inf, "C major"
    for tonic in range(12):
        rolled = np.roll(mean, -tonic)
        for profile, mode in ((KRUMHANSL_MAJOR, "major"), (KRUMHANSL_MINOR, "minor")):
            r = np.corrcoef(rolled, profile)[0, 1]
            if r > best_score:
                best_score, best = r, f"{NOTE_NAMES[tonic]} {mode}"
    return best


def chord_templates() -> Tuple[np.ndarray, List[str]]:
    """25 templates: 12 maj, 12 min, no-chord; rows L2-normalized."""
    templates, labels = [], []
    maj = np.array([1, 0, 0, 0, 1, 0, 0, 1, 0, 0, 0, 0], np.float32)
    mnr = np.array([1, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 0], np.float32)
    for root in range(12):
        templates.append(np.roll(maj, root))
        labels.append(f"{NOTE_NAMES[root]}:maj")
    for root in range(12):
        templates.append(np.roll(mnr, root))
        labels.append(f"{NOTE_NAMES[root]}:min")
    templates.append(np.full(12, 1 / 12, np.float32))
    labels.append("N")
    t = np.stack(templates)
    t = t / np.linalg.norm(t, axis=1, keepdims=True)
    return t, labels


def viterbi_decode(emissions: np.ndarray, self_bias: float = 0.9) -> np.ndarray:
    """Max-product smoothing over states with sticky self-transitions.
    emissions [T, S] (higher better, log-domain)."""
    t_len, s = emissions.shape
    n_other = s - 1
    log_self = math.log(self_bias)
    log_other = math.log((1 - self_bias) / n_other)
    delta = emissions[0].copy()
    back = np.zeros((t_len, s), np.int32)
    for t in range(1, t_len):
        stay = delta + log_self
        move = delta.max() + log_other
        best_prev = int(np.argmax(delta))
        choose_stay = stay >= move
        delta = np.where(choose_stay, stay, move) + emissions[t]
        back[t] = np.where(choose_stay, np.arange(s), best_prev)
    path = np.zeros(t_len, np.int32)
    path[-1] = int(np.argmax(delta))
    for t in range(t_len - 2, -1, -1):
        path[t] = back[t + 1][path[t + 1]]
    return path
