"""Embedding-extraction CLI: WAV dir -> per-file .npy (tiny configs)."""

import os

import numpy as np

from llark_tpu.audio.io import write_wav
from llark_tpu.encoders.extract_cli import list_shard, main


def write_wavs(d, n=5, sr=44100, seconds=0.5):
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    names = []
    for i in range(n):
        name = f"clip{i:02d}.wav"
        write_wav(os.path.join(d, name), rng.randn(int(sr * seconds)) * 0.2, sr)
        names.append(name)
    return names


def test_jukebox_extract_writes_npy(tmp_path):
    wavs = str(tmp_path / "wavs")
    out = str(tmp_path / "emb")
    names = write_wavs(wavs, n=3)
    rc = main([
        "jukebox", "--input-dir", wavs, "--output-dir", out,
        "--batch-size", "2", "--tiny", "--fps", "10",
        "--transfer-dtype", "int16", "--output-dtype", "bfloat16",
    ])
    assert rc == 0
    for name in names:
        path = os.path.join(out, name.replace(".wav", ".npy"))
        arr = np.load(path)
        assert arr.dtype == np.float32
        assert arr.ndim == 2 and arr.shape[0] >= 1


def test_clap_extract_writes_npy(tmp_path):
    wavs = str(tmp_path / "wavs")
    out = str(tmp_path / "emb")
    names = write_wavs(wavs, n=2, sr=48000)
    rc = main([
        "clap", "--input-dir", wavs, "--output-dir", out,
        "--batch-size", "2", "--tiny",
    ])
    assert rc == 0
    for name in names:
        arr = np.load(os.path.join(out, name.replace(".wav", ".npy")))
        assert arr.shape == (1, 512)


def test_sharding_and_skip_existing(tmp_path):
    wavs = str(tmp_path / "wavs")
    out = str(tmp_path / "emb")
    names = write_wavs(wavs, n=5)
    s0 = list_shard(wavs, 2, 0, False, out)
    s1 = list_shard(wavs, 2, 1, False, out)
    assert sorted(s0 + s1) == names and not set(s0) & set(s1)
    os.makedirs(out, exist_ok=True)
    np.save(os.path.join(out, names[0].replace(".wav", ".npy")), np.zeros(1))
    remaining = list_shard(wavs, 1, 0, True, out)
    assert names[0] not in remaining and len(remaining) == 4


def test_jukebox_extract_data_parallel(tmp_path):
    """--data-parallel shards the batch over the 8-device CPU mesh."""
    wavs = str(tmp_path / "wavs")
    out = str(tmp_path / "emb")
    names = write_wavs(wavs, n=4)
    rc = main([
        "jukebox", "--input-dir", wavs, "--output-dir", out,
        "--batch-size", "8", "--tiny", "--data-parallel",
        "--transfer-dtype", "float32", "--output-dtype", "float32",
    ])
    assert rc == 0
    for name in names:
        arr = np.load(os.path.join(out, name.replace(".wav", ".npy")))
        assert arr.ndim == 2 and arr.shape[0] >= 1


def test_clap_data_parallel_matches_single(tmp_path):
    """--data-parallel CLAP embeddings equal the single-device path (8-way
    CPU mesh), including a batch that does not divide the device count."""
    import numpy as np

    from llark_tpu.encoders.clap.encode import CLIP_SAMPLES, ClapEncoder
    from llark_tpu.encoders.clap.htsat import HTSATConfig
    from llark_tpu.parallel.mesh import make_mesh

    rng = np.random.RandomState(0)
    cfg = HTSATConfig.tiny()
    single = ClapEncoder.random_init(cfg)
    dp = ClapEncoder(cfg, single.params, mesh=make_mesh((8, 1, 1)))
    audio = rng.randn(5, CLIP_SAMPLES).astype(np.float32)  # 5 % 8 != 0
    a = single.embed_batch(audio)
    b = dp.embed_batch(audio)
    assert b.shape == a.shape
    np.testing.assert_allclose(a, b, atol=2e-5)
