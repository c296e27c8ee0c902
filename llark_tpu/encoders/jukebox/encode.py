"""Jukebox embedding-extraction pipeline (audio -> [T_pooled, 4800]).

Behavior parity with reference jukebox/main.py:
  SR=44100, window=2^20 samples, T=8192 activation frames ...... :10-22
  load: mono mean, peak-normalize ............................. :29-45
  pad to 2^20 ................................................. :48-51
  VQ-VAE top-level codes ...................................... :54-68
  prior only-encode activations [8192, 4800] .................. :101-110
  truncate to floor(T * input_len / 2^20) ..................... :154
  mean-pool windows of frame_len = floor(345.654/fps) ......... :113-131

TPU-first: one jitted graph runs codes+activations+pooling for a whole
batch of clips; ragged true lengths ride along as frame counts (static
shapes, per-row masks) instead of per-file Python trimming. The reference
achieves ~0.22 clips/s/GPU on V100 workers (BASELINE.md); batching across
clips on one chip is the main throughput lever.
"""

from __future__ import annotations

import dataclasses
from math import floor
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llark_tpu.encoders.jukebox.config import JukeboxPriorConfig, JukeboxVQVAEConfig
from llark_tpu.encoders.jukebox.prior import prior_encode
from llark_tpu.encoders.jukebox.vqvae import encode_top

JUKEBOX_SAMPLE_RATE = 44100
JUKEBOX_EXPECTED_SAMPLES_LEN = 1048576  # 2^20
JUKEBOX_SAMPLE_SECONDS = JUKEBOX_EXPECTED_SAMPLES_LEN / JUKEBOX_SAMPLE_RATE
T_ACTS = 8192
ACTS_SAMPLE_RATE = T_ACTS / JUKEBOX_SAMPLE_SECONDS  # ~345.654 Hz


class EmptyFileError(ValueError):
    pass


def prepare_audio(audio: np.ndarray) -> np.ndarray:
    """Mono-mean, peak-normalize, flatten (reference :29-45)."""
    audio = np.asarray(audio, np.float32)
    if audio.ndim == 2:
        audio = audio.mean(axis=0)
    norm = np.abs(audio).max()
    if norm > 0:
        audio = audio / norm
    return audio.flatten()


def pad_or_crop(
    audio: np.ndarray, target_len: int = JUKEBOX_EXPECTED_SAMPLES_LEN
) -> np.ndarray:
    if len(audio) < target_len:
        audio = np.pad(audio, (0, target_len - len(audio)))
    return audio[:target_len]


def pooled_frame_len(pool_frames_per_second: float) -> int:
    return floor(ACTS_SAMPLE_RATE / pool_frames_per_second)  # fps=10 -> 34


def windowed_average(acts: jnp.ndarray, frame_len: int) -> jnp.ndarray:
    """[..., T, D] -> [..., T//frame_len, D]; floor mode (drop remainder),
    matching AvgPool1d(kernel=stride=frame_len) (reference :113-131)."""
    t = acts.shape[-2]
    n_out = t // frame_len
    trimmed = acts[..., : n_out * frame_len, :]
    shape = trimmed.shape[:-2] + (n_out, frame_len, trimmed.shape[-1])
    return trimmed.reshape(shape).mean(axis=-2)


@dataclasses.dataclass
class JukeboxEncoder:
    """Batched, jitted Jukebox embedding extractor.

    Host<->device traffic is a first-order cost in this environment
    (~100 MB/s tunnel): `transfer_dtype="int16"` halves the audio upload
    (peak-normalized audio quantized to int16 is ~90 dB SNR, far above
    bf16 compute noise) and `output_dtype="bfloat16"` halves the
    activation download (activations are computed in bf16 anyway when
    prior dtype is bf16). `encode_stream` double-buffers so batch k+1's
    upload+compute overlap batch k's result readback.
    """

    vq_cfg: JukeboxVQVAEConfig
    prior_cfg: JukeboxPriorConfig
    vq_params: Dict[str, Any]
    prior_params: Dict[str, Any]
    x_cond: Optional[np.ndarray] = None  # [1, n_ctx, width] timing conditioning
    y_cond: Optional[np.ndarray] = None  # [1, 1, width] artist/genre start emb
    pool_frames_per_second: Optional[float] = 10.0
    transfer_dtype: str = "float32"  # audio upload: "float32" | "int16"
    output_dtype: str = "float32"  # activation download: "float32" | "bfloat16"
    mesh: Optional[Any] = None  # jax Mesh: shard the clip batch over chips

    def __post_init__(self):
        frame_len = (
            pooled_frame_len(self.pool_frames_per_second)
            if self.pool_frames_per_second
            else None
        )
        out_dt = jnp.dtype(self.output_dtype)

        # conds ride as ARGUMENTS, not jit closure constants: the real-5b
        # x_cond is [1, 8192, 4800] fp32 (~160 MB), far over the remote-
        # compile constant limit on tunneled TPUs
        has_conds = self.x_cond is not None or self.y_cond is not None
        self._conds = None
        if has_conds:
            self._conds = (
                jnp.zeros((1, self.prior_cfg.n_ctx, self.prior_cfg.width),
                          jnp.dtype(self.prior_cfg.dtype))
                if self.x_cond is None
                else jnp.asarray(np.asarray(self.x_cond),
                                 jnp.dtype(self.prior_cfg.dtype)),
                jnp.zeros((1, 1, self.prior_cfg.width),
                          jnp.dtype(self.prior_cfg.dtype))
                if self.y_cond is None
                else jnp.asarray(np.asarray(self.y_cond),
                                 jnp.dtype(self.prior_cfg.dtype)),
            )

        def _encode(vq_params, prior_params, audio, *conds):
            if audio.dtype == jnp.int16:
                audio = audio.astype(jnp.float32) / 32767.0
            codes = encode_top(self.vq_cfg, vq_params, audio)  # [N, T]
            codes = codes[:, : self.prior_cfg.n_ctx]
            acts = prior_encode(
                self.prior_cfg,
                prior_params,
                codes,
                conds[0] if conds else None,
                conds[1] if conds else None,
            )  # [N, n_ctx, width] fp32
            if frame_len is not None:
                acts = windowed_average(acts, frame_len)
            return acts.astype(out_dt)

        if self.mesh is not None:
            # data-parallel fleet on one host: replicate weights, shard the
            # clip batch over every mesh axis (the reference used 128
            # single-GPU Beam workers for the same fan-out)
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch_sh = NamedSharding(self.mesh, P(self.mesh.axis_names))
            rep = NamedSharding(self.mesh, P())
            rep_tree = jax.tree.map(lambda _: rep, self.vq_params)
            rep_tree_p = jax.tree.map(lambda _: rep, self.prior_params)
            self.vq_params = jax.device_put(self.vq_params, rep)
            self.prior_params = jax.device_put(self.prior_params, rep)
            cond_sh = tuple(rep for _ in (self._conds or ()))
            if self._conds is not None:
                self._conds = tuple(jax.device_put(c, rep) for c in self._conds)
            self._encode = jax.jit(
                _encode,
                in_shardings=(rep_tree, rep_tree_p, batch_sh) + cond_sh,
                out_shardings=batch_sh,
            )
        else:
            self._encode = jax.jit(_encode)
        self._frame_len = frame_len

    def _prepare_transfer(self, audio: np.ndarray) -> jnp.ndarray:
        """Quantize the upload when transfer_dtype is int16."""
        if self.transfer_dtype == "int16":
            q = np.clip(np.asarray(audio, np.float32), -1.0, 1.0)
            return jnp.asarray((q * 32767.0).astype(np.int16))
        return jnp.asarray(np.asarray(audio, np.float32))

    @classmethod
    def from_npz(cls, path: str, metadata=None, artist_id: int = 0,
                 genre_id: int = 0, **kw):
        """Build an encoder from an import_torch npz. When the npz carries
        label-conditioner tables, x_cond/y_cond are computed for the
        reference's dummy metadata (jukebox/main.py:71-98) — or for the
        given `metadata` rows — instead of defaulting to zeros."""
        from llark_tpu.encoders.jukebox.import_torch import load_npz

        vq_cfg, pr_cfg, vq_params, pr_params, cond_params, conds = load_npz(path)
        if conds:
            kw.setdefault("x_cond", conds["x_cond"])
            kw.setdefault("y_cond", conds["y_cond"])
        elif cond_params is not None:
            from llark_tpu.encoders.jukebox.conditioner import (
                dummy_metadata,
                get_cond,
                infer_conditioner_config,
            )

            ccfg = infer_conditioner_config(cond_params, pr_cfg.n_ctx, pr_cfg.width)
            raw_to_tokens = 1
            for d, s in zip(vq_cfg.downs_t, vq_cfg.strides_t):
                raw_to_tokens *= s**d
            if metadata is None:
                metadata = dummy_metadata(ccfg, raw_to_tokens,
                                          artist_id=artist_id, genre_id=genre_id)
            x_cond, y_cond = get_cond(ccfg, cond_params, metadata)
            kw.setdefault("x_cond", x_cond[:1])
            kw.setdefault("y_cond", y_cond[:1])
        return cls(vq_cfg, pr_cfg, vq_params, pr_params, **kw)

    @classmethod
    def random_init(cls, vq_cfg=None, prior_cfg=None, seed=0, **kw):
        """Random-weight encoder (tests / throughput benchmarking)."""
        from llark_tpu.encoders.jukebox.vqvae import init_vqvae_params
        from llark_tpu.encoders.jukebox.prior import init_prior_params

        vq_cfg = vq_cfg or JukeboxVQVAEConfig()
        prior_cfg = prior_cfg or JukeboxPriorConfig()
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        # jit the whole init: one compiled program instead of hundreds of
        # eagerly-dispatched RNG ops (very slow through the axon tunnel)
        vq_params = jax.jit(lambda k: init_vqvae_params(vq_cfg, k))(k1)
        prior_params = jax.jit(lambda k: init_prior_params(prior_cfg, k))(k2)
        return cls(vq_cfg, prior_cfg, vq_params, prior_params, **kw)

    @property
    def samples_per_ctx(self) -> int:
        """Raw samples covered by one prior context window."""
        return self.prior_cfg.n_ctx * self.vq_cfg.hop_lengths[-1]

    def encode_batch(
        self, audio: np.ndarray, input_lengths: Optional[np.ndarray] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """audio [N, samples_per_ctx] (already prepared+padded);
        input_lengths [N] true sample counts. Returns
        (acts [N, T_out, width] fp32, frame_counts [N])."""
        n = audio.shape[0]
        if input_lengths is None:
            input_lengths = np.full((n,), audio.shape[1], np.int64)
        if self.mesh is not None:
            # the batch dim is sharded over every mesh axis: pad to a
            # device multiple (extra rows discarded after readback)
            mult = self.mesh.devices.size
            pad = (-n) % mult
            if pad:
                audio = np.concatenate([audio, np.zeros((pad,) + audio.shape[1:],
                                                        audio.dtype)])
        acts = self._encode(
            self.vq_params, self.prior_params, self._prepare_transfer(audio),
            *(self._conds or ()),
        )
        acts = np.asarray(acts).astype(np.float32)[:n]
        return acts, self._frame_counts(input_lengths)

    def _frame_counts(self, input_lengths: np.ndarray) -> np.ndarray:
        t_ctx = self.prior_cfg.n_ctx
        window = self.samples_per_ctx
        latent_lens = np.floor(t_ctx * np.asarray(input_lengths) / window).astype(np.int64)
        if self._frame_len is not None:
            return latent_lens // self._frame_len
        return latent_lens

    def encode_stream(self, batches):
        """Pipelined encode over an iterable of (audio, input_lengths) batches.

        Dispatches batch k+1 before reading back batch k's result so the
        host<->device transfers overlap device compute (double buffering).
        Yields (acts fp32, frame_counts) per batch, in order.
        """
        pending = None  # (device_acts, n_real, input_lengths)
        for audio, input_lengths in batches:
            n = audio.shape[0]
            if input_lengths is None:
                input_lengths = np.full((n,), audio.shape[1], np.int64)
            if self.mesh is not None:
                pad = (-n) % self.mesh.devices.size
                if pad:
                    audio = np.concatenate(
                        [audio, np.zeros((pad,) + audio.shape[1:], audio.dtype)]
                    )
            dev = self._encode(
                self.vq_params, self.prior_params, self._prepare_transfer(audio),
                *(self._conds or ()),
            )  # async dispatch
            if pending is not None:
                acts, n_real, lens = pending
                yield np.asarray(acts).astype(np.float32)[:n_real], self._frame_counts(lens)
            pending = (dev, n, input_lengths)
        if pending is not None:
            acts, n_real, lens = pending
            yield np.asarray(acts).astype(np.float32)[:n_real], self._frame_counts(lens)

    def get_acts_from_audio(
        self, audio: np.ndarray, meanpool: bool = True
    ) -> np.ndarray:
        """Single-clip API mirroring get_acts_from_file (reference :133-173):
        returns trimmed numpy activations."""
        prepared = prepare_audio(audio)
        input_len = min(len(prepared), self.samples_per_ctx)
        padded = pad_or_crop(prepared, self.samples_per_ctx)
        acts, counts = self.encode_batch(padded[None], np.array([input_len]))
        out = acts[0, : counts[0]]
        if meanpool and self.pool_frames_per_second is None:
            out = out.mean(axis=0)
        return out
