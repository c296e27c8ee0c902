"""CLAP audio-embedding pipeline: waveform -> 512-d vector.

Behavior parity with the reference's laion_clap invocation (reference:
scripts/clap/clap_embeddings.py:110-153):
  * 48 kHz mono input
  * int16 quantize round-trip (int16_to_float32(float32_to_int16(x)))
  * data_truncating='rand_trunc': clips longer than clip_samples (480000,
    10 s) take a random 10 s window
  * data_filling='repeatpad': shorter clips are tiled then zero-padded
  * log-mel (1024 fft / 480 hop / 64 mel / 50..14000 Hz) -> HTSAT ->
    audio projection -> 512-d embedding
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llark_tpu.audio.mel import log_mel_spectrogram
from llark_tpu.encoders.clap.htsat import HTSATConfig, htsat_embed, init_htsat_params

CLAP_SAMPLE_RATE = 48000
CLIP_SAMPLES = 480000  # 10 s
N_FFT = 1024
HOP = 480
N_MELS = 64
FMIN, FMAX = 50.0, 14000.0


def float32_to_int16(x: np.ndarray) -> np.ndarray:
    x = np.clip(x, -1.0, 1.0)
    return (x * 32767.0).astype(np.int16)


def int16_to_float32(x: np.ndarray) -> np.ndarray:
    return (x / 32767.0).astype(np.float32)


def quantize_roundtrip(x: np.ndarray) -> np.ndarray:
    """int16 quantization round trip (reference :137-138)."""
    return int16_to_float32(float32_to_int16(x))


def prepare_clip(
    audio: np.ndarray,
    rng: Optional[np.random.RandomState] = None,
    clip_samples: int = CLIP_SAMPLES,
) -> np.ndarray:
    """rand_trunc + repeatpad to a fixed clip_samples window."""
    rng = rng or np.random.RandomState(0)
    audio = np.asarray(audio, np.float32).flatten()
    n = len(audio)
    if n > clip_samples:
        start = rng.randint(0, n - clip_samples + 1)
        return audio[start : start + clip_samples]
    if n < clip_samples:
        if n == 0:
            return np.zeros(clip_samples, np.float32)
        n_repeat = clip_samples // n
        audio = np.tile(audio, n_repeat)
        audio = np.pad(audio, (0, clip_samples - len(audio)))
    return audio


@dataclasses.dataclass
class ClapEncoder:
    """Batched, jitted CLAP audio-embedding extractor (512-d)."""

    cfg: HTSATConfig
    params: Dict[str, Any]
    mesh: Any = None  # data-parallel: shard the clip batch over the mesh

    def __post_init__(self):
        n_frames = self.cfg.n_frames

        def _embed(params, audio):  # audio [B, clip_samples]
            mel = log_mel_spectrogram(
                audio, CLAP_SAMPLE_RATE, N_FFT, HOP, self.cfg.n_mels, FMIN, FMAX
            )
            mel = mel[:, :n_frames]
            emb = htsat_embed(self.cfg, params, mel)
            # laion_clap get_audio_embedding L2-normalizes after the
            # projection (the reference stores unit-norm vectors,
            # clap_embeddings.py:104); htsat_embed itself stays raw to
            # match HF's audio_embeds for the import parity test.
            norm = jnp.linalg.norm(emb.astype(jnp.float32), axis=-1, keepdims=True)
            return (emb.astype(jnp.float32) / jnp.maximum(norm, 1e-12)).astype(emb.dtype)

        if self.mesh is not None:
            # replicate weights, shard clips over every mesh axis (same
            # fan-out as JukeboxEncoder; the reference used Beam workers)
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch_sh = NamedSharding(self.mesh, P(self.mesh.axis_names))
            rep = NamedSharding(self.mesh, P())
            self.params = jax.device_put(self.params, rep)
            self._embed = jax.jit(
                _embed,
                in_shardings=(jax.tree.map(lambda _: rep, self.params), batch_sh),
                out_shardings=batch_sh,
            )
            self._batch_multiple = self.mesh.devices.size
        else:
            self._embed = jax.jit(_embed)
            self._batch_multiple = 1

    @classmethod
    def random_init(cls, cfg: Optional[HTSATConfig] = None, seed: int = 0, mesh=None):
        cfg = cfg or HTSATConfig.base()
        params = jax.jit(lambda k: init_htsat_params(cfg, k))(jax.random.PRNGKey(seed))
        return cls(cfg, params, mesh=mesh)

    def embed_batch(self, audio: np.ndarray) -> np.ndarray:
        """audio [B, clip_samples] prepared waveforms -> [B, 512]."""
        b = audio.shape[0]
        m = self._batch_multiple
        if b % m:
            pad = m - b % m
            audio = np.concatenate([audio, np.zeros((pad,) + audio.shape[1:],
                                                    audio.dtype)])
        return np.asarray(self._embed(self.params, jnp.asarray(audio)))[:b]

    def embed_clip(self, audio: np.ndarray, rng=None) -> np.ndarray:
        """Full single-clip path incl. quantize + trunc/pad. Returns [1, 512]
        (the reference stores [1, 512] npy files)."""
        x = quantize_roundtrip(np.asarray(audio, np.float32).flatten())
        x = prepare_clip(x, rng)
        return self.embed_batch(x[None])
