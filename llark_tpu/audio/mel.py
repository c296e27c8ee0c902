"""Mel-spectrogram frontend in pure JAX (STFT -> mel filterbank -> log).

Replaces the torchaudio/torchlibrosa mel stack the reference's CLAP path
depends on (reference: scripts/clap/clap_embeddings.py:110-124
CLAP_MODEL_CFG: sr 48k, n_fft=win 1024, hop 480, 64 mels, fmin 50,
fmax 14000). Conventions chosen to match torchaudio defaults used by
laion_clap: center=True with reflect padding, Hann window, power
spectrogram, HTK mel scale, no filterbank norm, AmplitudeToDB(top_db=None).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(n: int) -> np.ndarray:
    return 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)


def hz_to_mel(f, htk: bool = True):
    f = np.asarray(f, np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # slaney
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz, min_log_mel = 1000.0, (1000.0 - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(f / min_log_hz) / logstep, mels)


def mel_to_hz(m, htk: bool = True):
    m = np.asarray(m, np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz, min_log_mel = 1000.0, (1000.0 - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float,
    fmax: Optional[float] = None,
    htk: bool = True,
    norm: Optional[str] = None,
) -> np.ndarray:
    """[n_mels, n_fft//2 + 1] triangular filterbank."""
    fmax = fmax or sr / 2
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sr / 2, n_freqs)
    mel_pts = np.linspace(hz_to_mel(fmin, htk), hz_to_mel(fmax, htk), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts, htk)
    fb = np.zeros((n_mels, n_freqs))
    for m in range(n_mels):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-10)
        fb[m] = np.maximum(0.0, np.minimum(up, down))
    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
        fb *= enorm[:, None]
    return fb.astype(np.float32)


def stft_power(
    audio: jnp.ndarray,  # [..., T]
    n_fft: int,
    hop: int,
    window: Optional[np.ndarray] = None,
    center: bool = True,
) -> jnp.ndarray:
    """Power spectrogram [..., frames, n_fft//2+1]."""
    if window is None:
        window = hann_window(n_fft)
    win = jnp.asarray(window, jnp.float32)
    if center:
        pad = [(0, 0)] * (audio.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        audio = jnp.pad(audio, pad, mode="reflect")
    t = audio.shape[-1]
    n_frames = 1 + (t - n_fft) // hop
    idx = (jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :])
    frames = audio[..., idx] * win  # [..., frames, n_fft]
    spec = jnp.fft.rfft(frames, axis=-1)
    return (spec.real**2 + spec.imag**2).astype(jnp.float32)


def log_mel_spectrogram(
    audio: jnp.ndarray,
    sr: int = 48000,
    n_fft: int = 1024,
    hop: int = 480,
    n_mels: int = 64,
    fmin: float = 50.0,
    fmax: float = 14000.0,
    htk: bool = True,
    norm: Optional[str] = None,
    amin: float = 1e-10,
) -> jnp.ndarray:
    """[..., T] -> [..., frames, n_mels] in dB (AmplitudeToDB, top_db=None)."""
    power = stft_power(audio, n_fft, hop)
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk, norm))
    mel = jnp.einsum("...tf,mf->...tm", power, fb)
    return 10.0 * jnp.log10(jnp.maximum(mel, amin))
