"""CLAP encoder tests: mel frontend golden vs torch, HTSAT shapes, pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llark_tpu.audio.mel import (
    hann_window,
    log_mel_spectrogram,
    mel_filterbank,
    stft_power,
)
from llark_tpu.encoders.clap.encode import (
    CLIP_SAMPLES,
    ClapEncoder,
    float32_to_int16,
    int16_to_float32,
    prepare_clip,
    quantize_roundtrip,
)
from llark_tpu.encoders.clap.htsat import (
    HTSATConfig,
    htsat_embed,
    init_htsat_params,
    relative_position_index,
    shifted_window_mask,
    wav2img,
    window_partition,
    window_reverse,
)


def test_stft_matches_torch():
    import torch

    rng = np.random.RandomState(0)
    audio = rng.randn(4800).astype(np.float32)
    ours = np.asarray(stft_power(jnp.asarray(audio), n_fft=1024, hop=480))
    t = torch.stft(
        torch.from_numpy(audio),
        n_fft=1024,
        hop_length=480,
        window=torch.from_numpy(hann_window(1024).astype(np.float32)),
        center=True,
        pad_mode="reflect",
        return_complex=True,
    )
    theirs = (t.abs() ** 2).numpy().T  # [frames, freq]
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)


def test_mel_spectrogram_matches_torchaudio():
    torchaudio = pytest.importorskip("torchaudio")
    import torch

    rng = np.random.RandomState(0)
    audio = rng.randn(48000).astype(np.float32)
    ours = np.asarray(
        log_mel_spectrogram(jnp.asarray(audio), 48000, 1024, 480, 64, 50.0, 14000.0)
    )
    mel_t = torchaudio.transforms.MelSpectrogram(
        sample_rate=48000,
        n_fft=1024,
        win_length=1024,
        hop_length=480,
        center=True,
        pad_mode="reflect",
        power=2.0,
        norm=None,
        n_mels=64,
        f_min=50,
        f_max=14000,
        mel_scale="htk",
    )(torch.from_numpy(audio))
    theirs = torchaudio.transforms.AmplitudeToDB(stype="power", top_db=None)(mel_t)
    theirs = theirs.numpy().T  # [frames, mels]
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-2, atol=1e-2)


def test_quantize_roundtrip():
    x = np.array([0.0, 0.5, -0.5, 1.0, -1.0, 2.0], np.float32)
    q = quantize_roundtrip(x)
    assert np.abs(q[:5] - np.clip(x[:5], -1, 1)).max() < 1e-4
    assert q[5] <= 1.0  # clipped


def test_prepare_clip_rand_trunc_and_repeatpad():
    rng = np.random.RandomState(0)
    long = np.arange(CLIP_SAMPLES + 1000, dtype=np.float32)
    out = prepare_clip(long, rng)
    assert out.shape == (CLIP_SAMPLES,)
    assert out[1] - out[0] == 1.0  # contiguous window

    short = np.ones(100, np.float32)
    out = prepare_clip(short, rng, clip_samples=350)
    assert out.shape == (350,)
    np.testing.assert_allclose(out[:300], 1.0)
    np.testing.assert_allclose(out[300:], 0.0)


def test_window_partition_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
    wins = window_partition(x, 4)
    assert wins.shape == (2 * 4, 16, 3)
    back = window_reverse(wins, 4, 8, 8)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_relative_position_index_properties():
    idx = relative_position_index(4)
    assert idx.shape == (16, 16)
    assert idx.min() >= 0 and idx.max() < 49  # (2*4-1)^2
    assert (np.diag(idx) == idx[0, 0]).all()  # self-offset constant


def test_shifted_window_mask_blocks_cross_regions():
    mask = shifted_window_mask(8, 8, 4, 2)
    assert mask.shape == (4, 16, 16)
    assert mask[0].all()  # first window: uniform region
    assert not mask[-1].all()  # boundary windows mask cross-region pairs


def test_wav2img_geometry():
    cfg = HTSATConfig.tiny()  # spec 64, ratio 4, mels 16, frames 256
    mel = jnp.asarray(np.random.RandomState(0).randn(2, 256, 16).astype(np.float32))
    img = wav2img(mel, cfg)
    assert img.shape == (2, 1, 64, 64)
    # chunk c of time axis lands at frequency rows [c*16:(c+1)*16]
    np.testing.assert_allclose(
        np.asarray(img[0, 0, 16:32, 0]), np.asarray(mel[0, 64, :])
    )


def test_htsat_embed_shapes():
    cfg = HTSATConfig.tiny()
    params = init_htsat_params(cfg, jax.random.PRNGKey(0))
    mel = jnp.asarray(np.random.RandomState(0).randn(2, 256, 16).astype(np.float32))
    out = htsat_embed(cfg, params, mel)
    assert out.shape == (2, cfg.out_dim)
    assert np.isfinite(np.asarray(out)).all()


def test_clap_encoder_pipeline_tiny():
    cfg = HTSATConfig.tiny()
    enc = ClapEncoder.random_init(cfg)
    # tiny geometry: n_frames 256 -> needs 256*480 samples at least
    audio = np.random.RandomState(0).randn(1, 256 * 480 + 512).astype(np.float32)
    emb = enc._embed(enc.params, jnp.asarray(audio))
    assert emb.shape == (1, cfg.out_dim)
