"""Data pipeline tests: shards, tar reader/writer, end-to-end batching."""

import json
import os
import random
import tarfile

import numpy as np
import pytest

from llark_tpu.config import DataArguments
from llark_tpu.data.pipeline import (
    PrefetchIterator,
    collate,
    example_to_arrays,
    make_dataset_iterator,
    sample_to_conversations,
    shuffled,
)
from llark_tpu.data.shards import (
    braceexpand,
    expand_url_to_file_list,
    repeat_shards,
    shard_sample_probs,
    split_by_host,
)
from llark_tpu.data.webdataset import TarShardReader, TarShardWriter
from llark_tpu.special_tokens import IGNORE_INDEX
from llark_tpu.tokenization import TokenizerBundle, WordTokenizer


def test_braceexpand():
    assert braceexpand("shard-{000..003}.tar") == [
        "shard-000.tar",
        "shard-001.tar",
        "shard-002.tar",
        "shard-003.tar",
    ]
    assert braceexpand("x-{a,b}.tar") == ["x-a.tar", "x-b.tar"]
    assert braceexpand("plain.tar") == ["plain.tar"]
    assert expand_url_to_file_list("a-{0..1}.tar,b.tar") == [
        "a-0.tar",
        "a-1.tar",
        "b.tar",
    ]


def test_task_probs():
    urls = ["captioning-0.tar", "reasoning-0.tar", "mir-0.tar"]
    probs = shard_sample_probs(
        urls, {"captioning": 0.15, "reasoning": 0.55, "mir": 0.30}
    )
    np.testing.assert_allclose(probs, [0.15, 0.55, 0.30])
    # no shard matches any task -> uniform sampling (None), not an error;
    # mixed matched/unmatched naming is the error case
    assert shard_sample_probs(["unknown.tar"], {"mir": 1.0}) is None
    with pytest.raises(ValueError):
        shard_sample_probs(["mir-0.tar", "unknown.tar"], {"mir": 1.0})

    reps = repeat_shards(urls, {"captioning": 0.15, "reasoning": 0.55, "mir": 0.30})
    assert len(reps) == 1024 * 3
    frac_reasoning = sum("reasoning" in r for r in reps) / len(reps)
    assert 0.5 < frac_reasoning < 0.6


def test_split_by_host():
    urls = [f"s{i}" for i in range(10)]
    a = split_by_host(urls, 0, 2)
    b = split_by_host(urls, 1, 2)
    assert sorted(a + b) == sorted(urls)
    assert not set(a) & set(b)


def make_shard(tmp_path, n=4, n_qa=2, t_frames=5, mm=8, name="mir-shard-%05d.tar"):
    writer = TarShardWriter(str(tmp_path / name), max_count=1000)
    rng = np.random.RandomState(0)
    for i in range(n):
        writer.write(
            {
                "__key__": f"track-{i:03d}",
                "json": {
                    "response": [
                        {"question": f"what is q{j} ?", "answer": f"answer {j} ."}
                        for j in range(n_qa)
                    ]
                },
                "audio_encoding.pyd": rng.randn(t_frames, mm).astype(np.float32),
            }
        )
    writer.close()
    return writer.written_paths[0]


def test_tar_roundtrip(tmp_path):
    path = make_shard(tmp_path)
    samples = list(TarShardReader([path]))
    assert len(samples) == 4
    s = samples[0]
    assert s["__key__"] == "track-000"
    assert len(s["json"]["response"]) == 2
    assert s["audio_encoding.pyd"].shape == (5, 8)


def test_corrupt_shard_skipped(tmp_path):
    good = make_shard(tmp_path)
    bad = str(tmp_path / "bad.tar")
    with open(bad, "wb") as f:
        f.write(b"this is not a tar file at all" * 10)
    samples = list(TarShardReader([bad, good]))
    assert len(samples) == 4  # bad shard skipped, good one read


def test_sample_to_conversations():
    rng = random.Random(0)
    sample = {
        "__key__": "k",
        "json": {"response": [{"question": "q?", "answer": "a."}]},
        "audio_encoding.pyd": np.zeros((3, 4), np.float32),
    }
    convs = list(sample_to_conversations(sample, rng))
    assert len(convs) == 1
    assert "<audio>" in convs[0]["conversations"][0]["value"]
    assert convs[0]["conversations"][1]["value"] == "a."

    # invalid: no response
    assert list(sample_to_conversations({"__key__": "x", "json": {}}, rng)) == []


def test_end_to_end_pipeline(tmp_path):
    mm = 8
    make_shard(tmp_path, n=6, n_qa=3, t_frames=5, mm=mm)
    bundle = TokenizerBundle.from_tokenizer(WordTokenizer(128))
    args = DataArguments(
        train_data_path=str(tmp_path / "mir-shard-{00000..00000}.tar"),
        max_audio_frames=6,
        task_sample_probs={"mir": 1.0},
    )
    it = make_dataset_iterator(
        args.train_data_path,
        bundle,
        args,
        batch_size=4,
        max_seq_len=96,
        mm_hidden_size=mm,
        is_train=True,
        seed=0,
        max_batches=3,
    )
    batches = list(it)
    assert len(batches) == 3
    b = batches[0]
    assert b["input_ids"].shape == (4, 96)
    assert b["labels"].shape == (4, 96)
    assert b["audio_encodings"].shape == (4, 6, mm)
    # each row has exactly num_frames patch tokens
    for i in range(4):
        n_patch = int((b["input_ids"][i] == bundle.audio_patch_id).sum())
        assert n_patch == b["audio_frame_counts"][i]
    # labels: header masked, some supervised tokens exist
    assert (b["labels"][0][:5] == IGNORE_INDEX).all()
    assert (b["labels"][0] != IGNORE_INDEX).any()


def test_audio_frame_truncation(tmp_path):
    """Encodings longer than max_audio_frames are truncated consistently."""
    bundle = TokenizerBundle.from_tokenizer(WordTokenizer(256))
    ex = {
        "id": "x",
        "audio_encoding": np.ones((50, 4), np.float32),
        "conversations": [
            {"from": "human", "value": "<audio>\nquestion ?"},
            {"from": "gpt", "value": "answer ."},
        ],
    }
    arrays = example_to_arrays(ex, bundle, max_audio_frames=8)
    assert arrays["num_frames"] == 8
    assert arrays["audio_encoding"].shape == (8, 4)
    assert int((arrays["input_ids"] == bundle.audio_patch_id).sum()) == 8


def test_prefetch_iterator_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("boom")

    it = PrefetchIterator(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_shuffled_is_permutation():
    rng = random.Random(0)
    out = list(shuffled(iter(range(100)), buffer_size=10, rng=rng))
    assert sorted(out) == list(range(100))
    assert out != list(range(100))


def test_native_tarloader_matches_python(tmp_path):
    """The C++ loader yields identical samples in identical order."""
    import pytest
    from llark_tpu.data.webdataset import TarShardReader, TarShardWriter
    from llark_tpu.native import tarloader

    if not tarloader.available():
        pytest.skip("no native toolchain")

    rng = np.random.RandomState(0)
    paths = []
    w = TarShardWriter(str(tmp_path / "shard-%05d.tar"), max_count=3)
    for i in range(8):  # spans 3 shards
        w.write({
            "__key__": f"s{i:04d}",
            "json": {"idx": i, "text": "x" * i},
            "audio_encoding.pyd": rng.randn(3, 4).astype(np.float32),
        })
    w.close()
    paths = w.written_paths

    native = list(TarShardReader(paths, use_native=True))
    python = list(TarShardReader(paths, use_native=False))
    assert len(native) == len(python) == 8
    for a, b in zip(native, python):
        assert a["__key__"] == b["__key__"]
        assert a["json"] == b["json"]
        np.testing.assert_array_equal(a["audio_encoding.pyd"], b["audio_encoding.pyd"])


def test_native_tarloader_skips_corrupt_shard(tmp_path):
    import pytest
    from llark_tpu.data.webdataset import TarShardReader, TarShardWriter
    from llark_tpu.native import tarloader

    if not tarloader.available():
        pytest.skip("no native toolchain")

    w = TarShardWriter(str(tmp_path / "ok-%05d.tar"), max_count=10)
    w.write({"__key__": "a", "json": {"v": 1}})
    w.close()
    bad = str(tmp_path / "bad.tar")
    with open(bad, "wb") as f:
        f.write(b"this is not a tar file" * 10)
    samples = list(TarShardReader([bad, w.written_paths[0]], use_native=True))
    assert [s["__key__"] for s in samples] == ["a"]


def test_skip_batches_fast_forward(tmp_path):
    """skip_batches=N yields exactly the batches a fresh iterator yields
    after N (deterministic stream replay for resume)."""
    from llark_tpu.config import DataArguments
    from llark_tpu.data.pipeline import make_dataset_iterator
    from llark_tpu.data.webdataset import TarShardWriter
    from llark_tpu.tokenization import TokenizerBundle, WordTokenizer

    w = TarShardWriter(str(tmp_path / "mir-train-%05d.tar"), max_count=100)
    rng = np.random.RandomState(0)
    for i in range(24):
        w.write({"__key__": f"t{i:03d}",
                 "json": {"response": [{"question": f"q {i} ?", "answer": f"a {i} ."}]},
                 "audio_encoding.pyd": rng.randn(4, 8).astype(np.float32)})
    w.close()

    bundle = TokenizerBundle.from_tokenizer(WordTokenizer(64))
    args = DataArguments(train_data_path=str(tmp_path / "mir-train-00000.tar"),
                         max_audio_frames=4, task_sample_probs={"mir": 1.0})
    kw = dict(bundle=bundle, data_args=args, batch_size=4, max_seq_len=64,
              mm_hidden_size=8, is_train=True, seed=7)
    full = [b for _, b in zip(range(5), make_dataset_iterator(
        str(tmp_path / "mir-train-00000.tar"), **kw))]
    skipped = [b for _, b in zip(range(3), make_dataset_iterator(
        str(tmp_path / "mir-train-00000.tar"), skip_batches=2, **kw))]
    for a, b in zip(full[2:], skipped):
        np.testing.assert_array_equal(a["input_ids"], b["input_ids"])
        np.testing.assert_array_equal(a["audio_encodings"], b["audio_encodings"])


def test_parallel_workers_same_example_set(tmp_path):
    """num_workers>1 yields the same multiset of examples (order may vary)."""
    from llark_tpu.config import DataArguments
    from llark_tpu.data.pipeline import make_dataset_iterator
    from llark_tpu.data.webdataset import TarShardWriter
    from llark_tpu.tokenization import TokenizerBundle, WordTokenizer

    w = TarShardWriter(str(tmp_path / "mir-train-%05d.tar"), max_count=6)
    rng = np.random.RandomState(0)
    for i in range(24):
        w.write({"__key__": f"t{i:03d}",
                 "json": {"response": [{"question": f"q {i} ?", "answer": f"a {i} ."}]},
                 "audio_encoding.pyd": rng.randn(4, 8).astype(np.float32)})
    w.close()
    bundle = TokenizerBundle.from_tokenizer(WordTokenizer(64))
    args = DataArguments(train_data_path=str(tmp_path / "mir-train-0000{0..3}.tar"),
                         max_audio_frames=4, task_sample_probs={"mir": 1.0})
    kw = dict(bundle=bundle, data_args=args, batch_size=4, max_seq_len=64,
              mm_hidden_size=8, is_train=True, seed=3, max_batches=5)

    def id_multiset(nw):
        ids = []
        for b in make_dataset_iterator(args.train_data_path, num_workers=nw, **kw):
            ids.extend(b["example_ids"])
        return sorted(ids)

    # same shard repetition schedule -> same example multiset either way
    a = id_multiset(1)
    b = id_multiset(3)
    assert len(a) == len(b) == 20
    assert set(a) <= {f"t{i:03d}" for i in range(24)}


def test_skip_batches_rejects_parallel_workers(tmp_path):
    import pytest
    from llark_tpu.config import DataArguments
    from llark_tpu.data.pipeline import make_dataset_iterator
    from llark_tpu.tokenization import TokenizerBundle, WordTokenizer

    bundle = TokenizerBundle.from_tokenizer(WordTokenizer(64))
    args = DataArguments(train_data_path=str(tmp_path / "mir-00000.tar"),
                         max_audio_frames=4, task_sample_probs={"mir": 1.0})
    with pytest.raises(ValueError, match="num_workers=1"):
        make_dataset_iterator(args.train_data_path, bundle=bundle, data_args=args,
                              batch_size=2, max_seq_len=64, mm_hidden_size=8,
                              skip_batches=2, num_workers=2)


def _record(i, n_qa=2, t=5, mm=8):
    rng = np.random.RandomState(i)
    enc = rng.randn(t, mm).astype(np.float32)
    return {
        "__key__": f"rec-{i:03d}",
        "json": {
            "response": [
                {"question": f"what is q{j} ?", "answer": f"answer {j} ."}
                for j in range(n_qa)
            ]
        },
        "audio_encoding": enc.ravel().tolist(),
        "audio_encoding_shape": [t, mm],
    }


def test_jsonl_record_reader(tmp_path):
    from llark_tpu.data.records import RecordShardReader, make_shard_reader

    path = tmp_path / "mir-records-00000.jsonl"
    with open(path, "w") as f:
        for i in range(3):
            f.write(json.dumps(_record(i)) + "\n")
        f.write("this is not json\n")  # skip-and-warn
    samples = list(RecordShardReader([str(path)]))
    assert [s["__key__"] for s in samples] == ["rec-000", "rec-001", "rec-002"]
    enc = samples[0]["audio_encoding.pyd"]
    assert enc.shape == (5, 8) and enc.dtype == np.float32
    # extension dispatch
    assert isinstance(make_shard_reader([str(path)]), RecordShardReader)
    assert isinstance(make_shard_reader(["x.tar"]), TarShardReader)


def test_msgpack_record_reader(tmp_path):
    msgpack = pytest.importorskip("msgpack")
    from llark_tpu.data.records import RecordShardReader

    path = tmp_path / "mir-records-00000.msgpack"
    with open(path, "wb") as f:
        f.write(msgpack.packb([_record(i) for i in range(4)]))
    # plus a nonexistent shard and a corrupt shard: both skipped
    bad = tmp_path / "mir-records-00001.msgpack"
    bad.write_bytes(b"\xc1\xc1garbage")
    reader = RecordShardReader(
        [str(path), str(tmp_path / "missing.msgpack"), str(bad)]
    )
    samples = list(reader)
    assert len(samples) == 4
    assert samples[2]["json"]["response"][0]["question"].startswith("what")


def test_jsonl_end_to_end_pipeline(tmp_path):
    """The full training pipeline runs off .jsonl record shards (reference
    read_hf_dataset path, m2t/data_modules.py:629-668)."""
    mm = 8
    path = tmp_path / "mir-records-00000.jsonl"
    with open(path, "w") as f:
        for i in range(6):
            f.write(json.dumps(_record(i, n_qa=2, t=5, mm=mm)) + "\n")
    bundle = TokenizerBundle.from_tokenizer(WordTokenizer(128))
    args = DataArguments(
        train_data_path=str(path),
        max_audio_frames=6,
        task_sample_probs={"mir": 1.0},
    )
    it = make_dataset_iterator(
        args.train_data_path,
        bundle,
        args,
        batch_size=4,
        max_seq_len=96,
        mm_hidden_size=mm,
        is_train=True,
        seed=0,
        max_batches=2,
    )
    batches = list(it)
    assert len(batches) == 2
    b = batches[0]
    assert b["input_ids"].shape == (4, 96)
    assert b["audio_encodings"].shape == (4, 6, mm)
    for i in range(4):
        n_patch = int((b["input_ids"][i] == bundle.audio_patch_id).sum())
        assert n_patch == b["audio_frame_counts"][i]
