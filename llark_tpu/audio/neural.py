"""Trained neural annotators: madmom-ARCHITECTURE parity for beats/key.

The reference's pseudo-labels come from madmom's *trained* models — an
RNN beat/downbeat activation network decoded by a DBN
(`RNNDownBeatProcessor` + `DBNDownBeatTrackingProcessor`) and a CNN key
classifier (`CNNKeyRecognitionProcessor`); reference:
m2t/annotation.py:29-111. The DSP annotators in `annotate.py` match the
*output contract*; this module matches the *architecture*: small trained
networks producing per-frame activations, decoded by the same dynamic
programs. Training data is the seeded synthetic corpus
(`synthbench.make_clip`, all six families) because the environment has no
network egress — real-recording accuracy remains undemonstrable offline,
exactly as documented for the DSP annotators in PERFORMANCE.md.

Two models, both deliberately tiny (tens of KB, committed as an npz):

  * BeatNet — a dilated temporal-conv net (TCN, the architecture of
    madmom's current beat models) over a standardized log-mel
    spectrogram at 100 fps, emitting per-frame (beat, downbeat) logits.
    Decoding reuses the DSP stack: `estimate_tempo` + `track_beats` on
    the beat activation (the Ellis-DP stands in for madmom's DBN), and
    bar (bpb, phase) selection scores the DOWNBEAT activation at
    hypothesized downbeats.
  * KeyNet — a temporal conv net over the HPSS chroma (12 pitch
    classes, 10 fps) with global mean+max pooling into 24 key logits
    (12 tonics x major/minor). Trained with all 12 chroma
    transpositions per clip (roll r == transpose the label by r), which
    bakes in transposition equivariance.

Inference is pure numpy (annotation runs in host-side data jobs; no
device or jax dependency); training (`scripts/train_annotators.py`) uses
an equivalent jax forward — `tests/test_neural_annotators.py` asserts the
two forwards agree to fp32 tolerance.

Weights: `llark_tpu/audio/weights/neural_annotators.npz` (committed).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from llark_tpu.audio.dsp import (
    NOTE_NAMES,
    _stft_mag,
    chroma_from_audio,
    estimate_tempo,
    track_beats,
)
from llark_tpu.audio.mel import mel_filterbank

WEIGHTS_PATH = os.path.join(os.path.dirname(__file__), "weights",
                            "neural_annotators.npz")

# ---------------------------------------------------------------------------
# Architecture spec (shared by the numpy inference forward and the jax
# training forward in scripts/train_annotators.py)
# ---------------------------------------------------------------------------

# (kernel, dilation, c_in, c_out) per conv layer; a 1x1 head follows.
BEAT_LAYERS: Tuple[Tuple[int, int, int, int], ...] = (
    (5, 1, 64, 32),
    (5, 2, 32, 32),
    (5, 4, 32, 32),
    (5, 8, 32, 32),
    (5, 16, 32, 32),
    (5, 32, 32, 32),
)
BEAT_HEAD = (32, 2)  # -> (beat, downbeat) logits
BEAT_FPS = 100
BEAT_N_MELS = 64

KEY_LAYERS: Tuple[Tuple[int, int, int, int], ...] = (
    (9, 1, 12, 32),
    (9, 2, 32, 32),
)
KEY_HIDDEN = (64, 48)  # pooled mean+max (2*32) -> 48
KEY_CLASSES = 24  # tonic * 2 + (0 major, 1 minor)
KEY_FPS = 10


def beat_param_shapes() -> Dict[str, Tuple[int, ...]]:
    shapes: Dict[str, Tuple[int, ...]] = {}
    for i, (k, _d, cin, cout) in enumerate(BEAT_LAYERS):
        shapes[f"beat/conv{i}_w"] = (k, cin, cout)
        shapes[f"beat/conv{i}_b"] = (cout,)
    shapes["beat/head_w"] = BEAT_HEAD
    shapes["beat/head_b"] = (BEAT_HEAD[1],)
    return shapes


def key_param_shapes() -> Dict[str, Tuple[int, ...]]:
    shapes: Dict[str, Tuple[int, ...]] = {}
    for i, (k, _d, cin, cout) in enumerate(KEY_LAYERS):
        shapes[f"key/conv{i}_w"] = (k, cin, cout)
        shapes[f"key/conv{i}_b"] = (cout,)
    shapes["key/fc0_w"] = KEY_HIDDEN
    shapes["key/fc0_b"] = (KEY_HIDDEN[1],)
    shapes["key/fc1_w"] = (KEY_HIDDEN[1], KEY_CLASSES)
    shapes["key/fc1_b"] = (KEY_CLASSES,)
    return shapes


# ---------------------------------------------------------------------------
# Features
# ---------------------------------------------------------------------------


def beat_features(audio: np.ndarray, sr: int, fps: int = BEAT_FPS,
                  n_fft: int = 2048, n_mels: int = BEAT_N_MELS) -> np.ndarray:
    """Standardized log-mel spectrogram [T, n_mels] at `fps`."""
    hop = int(round(sr / fps))
    mag = _stft_mag(np.asarray(audio, np.float32), n_fft, hop)
    fb = mel_filterbank(sr, n_fft, n_mels, 30.0, min(11000.0, sr / 2),
                        htk=True)
    logmel = np.log1p(1000.0 * (mag @ fb.T))
    mu = logmel.mean()
    sd = logmel.std()
    return ((logmel - mu) / max(sd, 1e-6)).astype(np.float32)


def key_features(audio: np.ndarray, sr: int, fps: float = KEY_FPS) -> np.ndarray:
    """HPSS chroma [T, 12] (max-normalized rows, as chord analysis uses)."""
    return chroma_from_audio(np.asarray(audio, np.float32), sr,
                             fps=fps).astype(np.float32)


# ---------------------------------------------------------------------------
# Numpy forward (inference)
# ---------------------------------------------------------------------------


def _conv1d_np(x: np.ndarray, w: np.ndarray, b: np.ndarray,
               dilation: int) -> np.ndarray:
    """'same' dilated conv over time: x [T, Cin], w [k, Cin, Cout]."""
    k = w.shape[0]
    half = (k - 1) // 2 * dilation
    xp = np.pad(x, ((half, half), (0, 0)))
    windows = np.lib.stride_tricks.sliding_window_view(
        xp, (k - 1) * dilation + 1, axis=0
    )[:, :, ::dilation]  # [T, Cin, k]
    return np.einsum("tck,kco->to", windows, w) + b


def beat_activations_np(params: Dict[str, np.ndarray],
                        feats: np.ndarray) -> np.ndarray:
    """[T, n_mels] -> sigmoid activations [T, 2] (beat, downbeat)."""
    h = feats
    for i, (_k, d, _cin, _cout) in enumerate(BEAT_LAYERS):
        h = _conv1d_np(h, params[f"beat/conv{i}_w"],
                       params[f"beat/conv{i}_b"], d)
        h = np.maximum(h, 0.0)
    logits = h @ params["beat/head_w"] + params["beat/head_b"]
    return 1.0 / (1.0 + np.exp(-logits))


def key_logits_np(params: Dict[str, np.ndarray],
                  chroma: np.ndarray) -> np.ndarray:
    """[T, 12] -> [24] key logits."""
    h = chroma
    for i, (_k, d, _cin, _cout) in enumerate(KEY_LAYERS):
        h = _conv1d_np(h, params[f"key/conv{i}_w"],
                       params[f"key/conv{i}_b"], d)
        h = np.maximum(h, 0.0)
    pooled = np.concatenate([h.mean(axis=0), h.max(axis=0)])
    h2 = np.maximum(pooled @ params["key/fc0_w"] + params["key/fc0_b"], 0.0)
    return h2 @ params["key/fc1_w"] + params["key/fc1_b"]


def key_label(idx: int) -> str:
    return f"{NOTE_NAMES[idx // 2]} {'major' if idx % 2 == 0 else 'minor'}"


def key_index(label: str) -> int:
    tonic, mode = label.split()
    return NOTE_NAMES.index(tonic) * 2 + (0 if mode == "major" else 1)


# keyed by os.path.realpath so equal-but-not-identical spellings of the
# same file (relative form, normpath variant) hit the same entry instead
# of re-reading the npz on every annotator call
_PARAMS_CACHE: Dict[str, Dict[str, np.ndarray]] = {}


def load_params(path: str = WEIGHTS_PATH) -> Dict[str, np.ndarray]:
    key = os.path.realpath(path)
    cached = _PARAMS_CACHE.get(key)
    if cached is not None:
        return cached
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"neural annotator weights missing at {path}; train them "
            "with scripts/train_annotators.py"
        )
    with np.load(path) as z:
        params = {k: z[k].astype(np.float32) for k in z.files}
    _PARAMS_CACHE[key] = params
    return params


# ---------------------------------------------------------------------------
# Annotators (same elem contract as annotate.py)
# ---------------------------------------------------------------------------

# one-slot activation memo: the chain runs beat/downbeat/tempo annotators
# back-to-back on the SAME elem, and the stft dominates their cost. The
# memo pins the audio object so its id cannot be recycled; never stored in
# the elem (elems are serialized downstream).
_ACT_MEMO: List[Any] = [None, None, None]  # [audio_ref, (fps, weights), act]


def _activations(elem: Dict[str, Any], fps: int, weights: str) -> np.ndarray:
    audio = elem["audio"]
    if _ACT_MEMO[0] is audio and _ACT_MEMO[1] == (fps, weights):
        return _ACT_MEMO[2]
    params = load_params(weights)
    feats = beat_features(audio, elem["audio_sample_rate"], fps)
    act = beat_activations_np(params, feats)
    _ACT_MEMO[0], _ACT_MEMO[1], _ACT_MEMO[2] = audio, (fps, weights), act
    return act


class NeuralBeatFeatures:
    """Beat-tracked tempo + beats from the TCN beat activation
    (librosa-field contract, mirroring ExtractLibrosaTempoAndDownbeatFeatures)."""

    def __init__(self, fps: int = BEAT_FPS, weights: str = WEIGHTS_PATH):
        self.fps = fps
        self.weights = weights

    def __call__(self, elem: Dict[str, Any]) -> Dict[str, Any]:
        act = _activations(elem, self.fps, self.weights)
        env = act[:, 0]
        tempo = estimate_tempo(env, self.fps)[0][0]
        beats = track_beats(env, self.fps, tempo)
        elem["tempo_in_beats_per_minute_librosa"] = float(tempo)
        elem["downbeats_librosa"] = [{"time": float(t)} for t in beats]
        return elem


class NeuralTempoFeatures:
    """Dominant tempo from the beat activation (madmom contract)."""

    def __init__(self, fps: int = BEAT_FPS, weights: str = WEIGHTS_PATH):
        self.fps = fps
        self.weights = weights

    def __call__(self, elem: Dict[str, Any]) -> Dict[str, Any]:
        act = _activations(elem, self.fps, self.weights)
        tempo = estimate_tempo(act[:, 0], self.fps)[0][0]
        elem["tempo_in_beats_per_minute_madmom"] = round(float(tempo), 1)
        return elem


class NeuralDownbeatFeatures:
    """Beats with bar positions; (bpb, phase) scores the DOWNBEAT
    activation at hypothesized downbeats (madmom
    DBNDownBeatTrackingProcessor contract)."""

    def __init__(self, fps: int = BEAT_FPS,
                 beats_per_bar: Sequence[int] = (3, 4),
                 weights: str = WEIGHTS_PATH):
        self.fps = fps
        self.beats_per_bar = tuple(beats_per_bar)
        self.weights = weights

    def __call__(self, elem: Dict[str, Any]) -> Dict[str, Any]:
        act = _activations(elem, self.fps, self.weights)
        env, db = act[:, 0], act[:, 1]
        beats = track_beats(env, self.fps)
        if len(beats) == 0:
            elem["downbeats_madmom"] = []
            return elem
        frames = np.clip((beats * self.fps).astype(int), 0, len(db) - 1)
        # +-2-frame max absorbs tracker/activation misalignment (the DSP
        # downbeat selector does the same on its onset envelope)
        at_beats = np.array(
            [db[max(0, f - 2):f + 3].max() for f in frames]
        )
        best = None
        for bpb in self.beats_per_bar:
            for phase in range(bpb):
                idx = np.arange(phase, len(at_beats), bpb)
                rest = np.ones(len(at_beats), bool)
                rest[idx] = False
                score = at_beats[idx].mean() - (
                    at_beats[rest].mean() if rest.any() else 0.0
                )
                if best is None or score > best[0]:
                    best = (score, bpb, phase)
        _, bpb, phase = best
        elem["downbeats_madmom"] = [
            {"time": float(t), "beat_number": int(((i - phase) % bpb) + 1)}
            for i, t in enumerate(beats)
        ]
        return elem


class NeuralKeyEstimates:
    """Key via the trained chroma CNN (madmom CNNKeyRecognitionProcessor
    contract)."""

    def __init__(self, weights: str = WEIGHTS_PATH):
        self.weights = weights

    def __call__(self, elem: Dict[str, Any]) -> Dict[str, Any]:
        params = load_params(self.weights)
        chroma = key_features(elem["audio"], elem["audio_sample_rate"])
        logits = key_logits_np(params, chroma)
        elem["key"] = key_label(int(np.argmax(logits)))
        return elem


def neural_annotators(weights: str = WEIGHTS_PATH) -> Tuple[Any, ...]:
    """Full neural annotation chain (chords stay on the DSP template+
    Viterbi route — the reference's chord model is a separate CNN+CRF and
    the DSP chords already score 0.98+ on synthbench)."""
    from llark_tpu.audio.annotate import ExtractChordEstimates

    return (
        ExtractChordEstimates,
        NeuralKeyEstimates(weights=weights),
        NeuralBeatFeatures(weights=weights),
        NeuralDownbeatFeatures(weights=weights),
        NeuralTempoFeatures(weights=weights),
    )
