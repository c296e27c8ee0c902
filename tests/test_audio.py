"""Audio I/O + DSP annotator tests (synthetic signals with known answers)."""

import os

import numpy as np
import pytest

from llark_tpu.audio.annotate import (
    ExtractChordEstimates,
    ExtractDownbeatFeatures,
    ExtractKeyEstimates,
    ExtractLibrosaTempoAndDownbeatFeatures,
    ExtractTempoFeatures,
    annotate_elem,
)
from llark_tpu.audio.dsp import estimate_key, estimate_tempo, onset_envelope, track_beats
from llark_tpu.audio.io import (
    crop_multi,
    crop_single,
    make_start_end_str,
    parse_wav_bytes,
    peak_normalize,
    read_wav,
    resample,
    write_wav,
)
from llark_tpu.native.build import load_library

SR = 22050


def click_track(bpm=120.0, seconds=12.0, sr=SR, accent_every=4):
    """Clicks at `bpm`, accented downbeats."""
    n = int(seconds * sr)
    x = np.zeros(n, np.float32)
    period = 60.0 / bpm
    i = 0
    t = 0.0
    while t < seconds - 0.05:
        s = int(t * sr)
        amp = 1.0 if i % accent_every == 0 else 0.45
        dur = int(0.02 * sr)
        x[s : s + dur] += amp * np.sin(2 * np.pi * 1000 * np.arange(dur) / sr) * np.exp(
            -np.arange(dur) / (0.004 * sr)
        )
        t += period
        i += 1
    return x


def tone_chord(freqs, seconds=3.0, sr=SR):
    t = np.arange(int(seconds * sr)) / sr
    return sum(0.3 * np.sin(2 * np.pi * f * t) for f in freqs).astype(np.float32)


def test_native_library_builds():
    lib = load_library()
    assert lib is not None, "native audioproc must compile in this image"


def test_wav_roundtrip(tmp_path):
    x = np.sin(2 * np.pi * 440 * np.arange(SR) / SR).astype(np.float32) * 0.5
    p = str(tmp_path / "t.wav")
    write_wav(p, x, SR)
    y, sr = read_wav(p, target_sr=SR)
    assert sr == SR
    assert len(y) == len(x)
    np.testing.assert_allclose(y, x, atol=1e-3)


def test_wav_parse_stereo_mixdown(tmp_path):
    left = np.ones(1000, np.float32) * 0.5
    right = -np.ones(1000, np.float32) * 0.5
    p = str(tmp_path / "s.wav")
    write_wav(p, np.stack([left, right], 1), SR)
    with open(p, "rb") as f:
        y, sr = parse_wav_bytes(f.read())
    np.testing.assert_allclose(y, 0.0, atol=1e-3)


def test_resample_preserves_tone():
    """A 440 Hz tone resampled 22050->44100 keeps its frequency."""
    x = np.sin(2 * np.pi * 440 * np.arange(SR) / SR).astype(np.float32)
    y = resample(x, SR, 44100)
    assert abs(len(y) - 2 * len(x)) <= 2
    spec = np.abs(np.fft.rfft(y[4410:-4410] * np.hanning(len(y) - 8820)))
    freqs = np.fft.rfftfreq(len(y) - 8820, 1 / 44100)
    assert abs(freqs[np.argmax(spec)] - 440.0) < 2.0


def test_resample_native_matches_numpy():
    from llark_tpu.audio.io import _resample_numpy

    rng = np.random.RandomState(0)
    x = rng.randn(4000).astype(np.float32)
    a = resample(x, 16000, 44100)
    b = _resample_numpy(x, 16000, 44100)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=5e-4)


def test_peak_normalize():
    x = np.array([0.1, -0.5, 0.25], np.float32)
    y = peak_normalize(x.copy())
    assert abs(np.abs(y).max() - 1.0) < 1e-6
    z = peak_normalize(np.zeros(10, np.float32))
    np.testing.assert_array_equal(z, 0)


def test_crop_policies():
    sr = 1000
    x = np.arange(100 * sr, dtype=np.float32)
    rng = np.random.RandomState(0)
    out, s, e = crop_single(x, sr, rng, p_first=0.0)
    assert (s, e) == (30.0, 60.0)
    short = np.arange(45 * sr, dtype=np.float32)
    out, s, e = crop_single(short, sr, rng, p_first=0.0)
    assert s == 0.0
    crops = crop_multi(x, sr)
    assert len(crops) == 3  # 100s -> 3 full 30s chunks
    assert crops[1][1:] == (30.0, 60.0)
    assert make_start_end_str(0.0, 30.0) == "-start0.000-end30.000"


def test_tempo_estimation_click_track():
    x = click_track(bpm=120)
    env = onset_envelope(x, SR)
    tempo = estimate_tempo(env)[0][0]
    # accept metrical-level (octave) equivalents
    assert any(abs(tempo - 120.0 * m) < 6.0 for m in (0.5, 1.0, 2.0)), tempo


def test_beat_tracking_click_track():
    x = click_track(bpm=100, accent_every=1)
    env = onset_envelope(x, SR)
    beats = track_beats(env, 100, bpm=100.0)
    assert len(beats) >= 15
    iois = np.diff(beats)
    assert abs(np.median(iois) - 0.6) < 0.05  # 100 BPM -> 0.6 s


def test_key_estimation_c_major():
    # C major scale-ish chord pad: C E G
    x = tone_chord([261.63, 329.63, 392.0, 523.25])
    from llark_tpu.audio.dsp import chroma_from_audio

    key = estimate_key(chroma_from_audio(x, SR))
    assert key in ("C major", "A minor", "E minor"), key


def test_chord_annotator_segments():
    c = tone_chord([261.63, 329.63, 392.0], 2.0)  # C major
    a = tone_chord([220.0, 261.63, 329.63], 2.0)  # A minor
    elem = {"audio": np.concatenate([c, a]), "audio_sample_rate": SR}
    out = ExtractChordEstimates()(elem)
    chords = out["chords"]
    assert len(chords) >= 1
    labels = {c["chord"] for c in chords}
    assert any("major" in l or "minor" in l for l in labels)
    assert chords[0]["start_time"] == 0.0
    # grid times have 1 decimal
    for ch in chords:
        assert round(ch["start_time"], 1) == ch["start_time"]


def test_downbeat_annotator_fields():
    x = click_track(bpm=120, accent_every=4)
    elem = {"audio": x, "audio_sample_rate": SR}
    out = ExtractDownbeatFeatures()(elem)
    dbs = out["downbeats_madmom"]
    assert len(dbs) > 8
    assert set(dbs[0]) == {"time", "beat_number"}
    numbers = [d["beat_number"] for d in dbs]
    assert min(numbers) == 1 and max(numbers) in (3, 4)


def test_full_annotation_chain():
    x = click_track(bpm=120)
    elem = annotate_elem({"audio": x, "audio_sample_rate": SR})
    for field in (
        "key",
        "tempo_in_beats_per_minute_madmom",
        "tempo_in_beats_per_minute_librosa",
        "downbeats_librosa",
        "downbeats_madmom",
        "chords",
    ):
        assert field in elem, field
