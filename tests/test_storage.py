"""Remote-storage seam (llark_tpu/storage.py) over fsspec memory://.

Mirrors the reference's GCS contract (m2t/gcs_utils.py:96-198 read/write
blobs; m2t/data_modules.py:430-433 `pipe:gsutil cat` shard streaming)
without needing a bucket: the memory:// filesystem exercises the exact
fsspec code path gs:// takes.
"""

import json

import numpy as np
import pytest

from llark_tpu import storage

fsspec = pytest.importorskip("fsspec")


@pytest.fixture(autouse=True)
def _clean_memfs():
    fs = fsspec.filesystem("memory")
    for p in list(fs.store):
        fs.rm(p)
    yield


def test_is_remote():
    assert storage.is_remote("gs://bucket/x")
    assert storage.is_remote("memory://x")
    assert not storage.is_remote("/local/path")
    assert not storage.is_remote("relative/path.tar")
    assert not storage.is_remote("file:///local/path")


def test_roundtrip_bytes_exists_glob():
    storage.write_bytes("memory://bkt/a/one.npy", b"111")
    storage.write_bytes("memory://bkt/a/two.npy", b"222")
    assert storage.exists("memory://bkt/a/one.npy")
    assert not storage.exists("memory://bkt/a/three.npy")
    assert storage.read_bytes("memory://bkt/a/two.npy") == b"222"
    got = storage.fs_glob("memory://bkt/a/*.npy")
    assert [g.rsplit("/", 1)[1] for g in got] == ["one.npy", "two.npy"]
    assert all(g.startswith("memory://") for g in got)


def test_join_and_local_paths(tmp_path):
    assert storage.join("memory://b/", "x", "y.wav") == "memory://b/x/y.wav"
    p = storage.join(str(tmp_path), "sub", "f.txt")
    storage.write_bytes(p, b"hi")
    assert storage.read_bytes(p) == b"hi"
    assert storage.fs_glob(str(tmp_path / "sub" / "*.txt")) == [p]


def test_local_input_output_staging():
    storage.write_bytes("memory://bkt/in.wav", b"RIFFdata")
    with storage.local_input("memory://bkt/in.wav") as lp:
        assert open(lp, "rb").read() == b"RIFFdata"
    with storage.local_output("memory://bkt/out.bin") as lp:
        open(lp, "wb").write(b"payload")
    assert storage.read_bytes("memory://bkt/out.bin") == b"payload"


def test_wav_roundtrip_remote():
    from llark_tpu.audio.io import read_wav, write_wav

    x = np.sin(np.arange(4410) / 20).astype(np.float32)
    write_wav("memory://bkt/clip.wav", x, 44100)
    y, sr = read_wav("memory://bkt/clip.wav", target_sr=44100)
    assert sr == 44100
    np.testing.assert_allclose(y, x, atol=1e-3)


def test_tar_shards_remote_write_read():
    from llark_tpu.data.webdataset import TarShardReader, TarShardWriter

    with TarShardWriter("memory://bkt/shard-%05d.tar", max_count=2) as w:
        for i in range(5):
            w.write({
                "__key__": f"k{i}",
                "json": {"id": i},
                "audio_encoding.pyd": np.full((3, 4), i, np.float32),
            })
    paths = storage.fs_glob("memory://bkt/shard-*.tar")
    assert len(paths) == 3  # 2 + 2 + 1
    # remote shards take the Python streaming reader (pipe:gsutil cat
    # equivalent), never the native local-file loader
    samples = list(TarShardReader(paths))
    assert [s["json"]["id"] for s in samples] == list(range(5))
    np.testing.assert_array_equal(
        samples[3]["audio_encoding.pyd"], np.full((3, 4), 3, np.float32)
    )


def test_jsonl_records_remote():
    from llark_tpu.data.records import iter_jsonl_records

    rows = [{"id": i, "text": f"t{i}"} for i in range(3)]
    storage.write_bytes(
        "memory://bkt/r.jsonl", "".join(json.dumps(r) + "\n" for r in rows).encode()
    )
    assert list(iter_jsonl_records("memory://bkt/r.jsonl")) == rows


def test_record_reader_skips_missing_remote():
    from llark_tpu.data.records import RecordShardReader

    rec = {"id": 1, "json": {"response": []}, "audio_encoding": [0.0, 1.0]}
    storage.write_bytes("memory://bkt/ok.jsonl", (json.dumps(rec) + "\n").encode())
    got = list(RecordShardReader(["memory://bkt/missing.jsonl", "memory://bkt/ok.jsonl"]))
    assert len(got) == 1


def test_checkpoint_dir_normalization(tmp_path):
    local = storage.normalize_checkpoint_dir(str(tmp_path / "ck"))
    assert local.startswith("/") and (tmp_path / "ck").is_dir()
    # remote URLs must pass through UNMANGLED (orbax/tensorstore handles
    # gs:// itself); abspath-ing one would corrupt it into /cwd/gs:/...
    assert storage.normalize_checkpoint_dir("gs://bkt/ck/") == "gs://bkt/ck"


def test_projector_sidesave_remote(tmp_path):
    from llark_tpu.train.checkpoint import load_projector_weights

    with storage.fopen("memory://bkt/proj.npz", "wb") as f:
        np.savez(f, **{"mm_projector.kernel": np.ones((2, 3), np.float32)})
    w = load_projector_weights("memory://bkt/proj.npz")
    np.testing.assert_array_equal(w["mm_projector.kernel"], np.ones((2, 3)))


def test_npy_save_load_remote():
    from llark_tpu.encoders.extract_cli import _save_npy
    from llark_tpu.inference.from_encodings import _load_npy

    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    _save_npy("memory://bkt/e/x.npy", arr)
    np.testing.assert_array_equal(_load_npy("memory://bkt/e/x.npy"), arr)
    got = storage.fs_glob("memory://bkt/e/*.npy")
    # fsspec's canonical memory:// form is memory:///rooted/path; globbed
    # URLs must stay loadable whatever the canonical spelling
    assert len(got) == 1 and got[0].startswith("memory://")
    np.testing.assert_array_equal(_load_npy(got[0]), arr)


def test_pipeline_annotate_remote(tmp_path):
    """pipeline_cli annotate: remote jsonl in/out + remote audio dir."""
    from llark_tpu.audio.io import write_wav
    from llark_tpu.preprocessing import pipeline_cli

    t = np.arange(44100) / 44100.0
    wav = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    write_wav("memory://bkt/audio/42.wav", wav, 44100)
    storage.write_bytes("memory://bkt/rows.jsonl", b'{"id": "42"}\n')
    pipeline_cli.main([
        "annotate",
        "--input-jsonl", "memory://bkt/rows.jsonl",
        "--audio-dir", "memory://bkt/audio",
        "--output", "memory://bkt/annotated.jsonl",
        "--workers", "1",
    ])
    out = [json.loads(l) for l in storage.read_bytes("memory://bkt/annotated.jsonl").splitlines()]
    assert len(out) == 1 and out[0]["id"] == "42"
    assert "tempo_in_beats_per_minute_madmom" in out[0]
