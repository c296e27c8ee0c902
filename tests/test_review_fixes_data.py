"""Regression tests for data-factory review findings."""

import glob
import json
import os

import numpy as np
import pytest

from llark_tpu.data.shards import shard_sample_probs
from llark_tpu.dataset_utils import (
    example_id_to_wds_key,
    wds_key_to_example_id,
    wds_key_to_original_id,
)


def test_shard_probs_uniform_when_no_task_names(caplog):
    probs = {"mir": 0.3, "captioning": 0.7}
    # no shard carries a task substring -> uniform (None), not ValueError
    assert shard_sample_probs(["train-000.tar", "train-001.tar"], probs) is None


def test_shard_probs_mixed_naming_errors():
    probs = {"mir": 0.3, "captioning": 0.7}
    with pytest.raises(ValueError, match="match no task"):
        shard_sample_probs(["mir-000.tar", "train-001.tar"], probs)
    p = shard_sample_probs(["mir-000.tar", "captioning-001.tar"], probs)
    np.testing.assert_allclose(p, [0.3, 0.7])


def test_wds_key_roundtrip():
    cid = "trk1-start30.000-end60.000"
    key = example_id_to_wds_key(cid)
    assert "." not in key
    assert wds_key_to_original_id(key) == cid
    # example-id extraction works on raw AND encoded forms
    assert wds_key_to_example_id(cid) == "trk1"
    assert wds_key_to_example_id(key) == "trk1"
    # ids with legitimate underscores survive (no blanket _ -> . pass)
    assert wds_key_to_original_id("yt_abc_123-start5_000-end35_000") == \
        "yt_abc_123-start5.000-end35.000"


def test_fma_split_name_mapping(tmp_path):
    from llark_tpu.preprocessing.jsonify import FMAJsonifier

    with open(tmp_path / "tracks.csv", "w") as f:
        f.write(",set,track,artist,album,track\n")
        f.write("track_id,split,title,name,title,genres\n")
        f.write(",,,,,\n")  # units row
        f.write('1,training,Song A,Artist,Album,[21]\n')
        f.write('2,test,Song B,Artist,Album,[21]\n')
    j = FMAJsonifier(str(tmp_path), "train")
    j.load_raw_data()
    assert [r["track_id"] for r in j.data] == ["1"]
    j = FMAJsonifier(str(tmp_path), "test")
    j.load_raw_data()
    assert [r["track_id"] for r in j.data] == ["2"]


def test_wavcaps_top_level_list(tmp_path):
    from llark_tpu.preprocessing.jsonify import WavCapsJsonifier

    with open(tmp_path / "blob.json", "w") as f:
        json.dump([{"id": "a1", "caption": "a piano music melody playing softly in a song",
                    "duration": 10}], f)
    j = WavCapsJsonifier(str(tmp_path), "train")
    j.load_raw_data()
    assert [r["id"] for r in j.data] == ["a1"]


def _make_midi(notes, tempo_us=500000, division=480, program=40):
    """Minimal single-track SMF (same helper as test_preprocessing)."""
    import struct

    def varlen(x):
        out = [x & 0x7F]
        x >>= 7
        while x:
            out.append(0x80 | (x & 0x7F))
            x >>= 7
        return bytes(reversed(out))

    events = [(0, bytes([0xFF, 0x51, 0x03]) + tempo_us.to_bytes(3, "big"))]
    events.append((0, bytes([0xC0, program])))
    for pitch, s, e in notes:
        events.append((s, bytes([0x90, pitch, 100])))
        events.append((e, bytes([0x80, pitch, 0])))
    events.sort(key=lambda x: x[0])
    track, last = b"", 0
    for tick, payload in events:
        track += varlen(tick - last) + payload
        last = tick
    track += varlen(0) + bytes([0xFF, 0x2F, 0x00])
    return (b"MThd" + struct.pack(">IHHH", 6, 0, 1, division)
            + b"MTrk" + struct.pack(">I", len(track)) + track)


def test_musicnet_split_filter(tmp_path):
    from llark_tpu.preprocessing.jsonify import MusicNetJsonifier

    midi_dir = tmp_path / "musicnet_midis" / "Bach"
    os.makedirs(midi_dir)
    for tid in ("1727", "2303"):
        (midi_dir / f"{tid}_x.mid").write_bytes(_make_midi([(60, 0, 480)]))
    os.makedirs(tmp_path / "train_data")
    (tmp_path / "train_data" / "1727.wav").write_bytes(b"")
    j = MusicNetJsonifier(str(tmp_path), "train")
    j.load_raw_data()
    assert [r["id"] for r in j.data] == ["1727"]
    # without a split layout: all tracks (the reference's behavior)
    j = MusicNetJsonifier(str(tmp_path), "validation")
    j.load_raw_data()
    assert len(j.data) == 2


def test_crop_annotations_rekeys_to_crop_id(tmp_path):
    from llark_tpu.audio.io import write_wav
    from llark_tpu.preprocessing.pipeline_cli import main as pipeline

    sr = 44100
    crops = tmp_path / "crops"
    os.makedirs(crops)
    t = np.arange(sr) / sr
    for span in ((0.0, 30.0), (30.0, 60.0)):
        write_wav(str(crops / f"trk9-start{span[0]:.3f}-end{span[1]:.3f}.wav"),
                  np.sin(2 * np.pi * 220 * t).astype(np.float32), sr)
    ann = tmp_path / "ann.jsonl"
    with open(ann, "w") as f:
        f.write(json.dumps({"id": "trk9",
                            "tempo_in_beats_per_minute_madmom": 120.0}) + "\n")
    out = tmp_path / "cropped.jsonl"
    pipeline(["crop-annotations", "--annotations-file", str(ann),
              "--audio-dir", str(crops), "--output", str(out)])
    rows = [json.loads(l) for l in open(out)]
    assert {r["id"] for r in rows} == {
        "trk9-start0.000-end30.000", "trk9-start30.000-end60.000",
    }
    assert all(r["source_id"] == "trk9" for r in rows)


def test_pipeline_skips_non_dict_json(tmp_path):
    from llark_tpu.data.pipeline import sample_to_conversations
    import random

    convs = list(sample_to_conversations(
        {"__key__": "x", "json": ["not", "a", "dict"],
         "audio_encoding.pyd": np.zeros((2, 4), np.float32)},
        random.Random(0),
    ))
    assert convs == []


def test_train_eval_loop(tmp_path):
    from llark_tpu.config import DataArguments, ModelArguments, TrainingArguments
    from llark_tpu.data.webdataset import TarShardWriter
    from llark_tpu.train.train import train

    MM = 8
    rng = np.random.RandomState(0)
    for name in ("mir-train-%05d.tar", "mir-eval-%05d.tar"):
        w = TarShardWriter(str(tmp_path / name), max_count=100)
        for i in range(4):
            w.write({
                "__key__": f"{name[4]}{i:03d}",
                "json": {"response": [{"question": "what genre ?",
                                       "answer": "jazz ."}]},
                "audio_encoding.pyd": rng.randn(4, MM).astype(np.float32),
            })
        w.close()
    res = train(
        ModelArguments(model_name_or_path="tiny", mm_hidden_size=MM),
        DataArguments(train_data_path=str(tmp_path / "mir-train-00000.tar"),
                      eval_data_path=str(tmp_path / "mir-eval-00000.tar"),
                      max_audio_frames=4, task_sample_probs={"mir": 1.0}),
        TrainingArguments(output_dir=str(tmp_path / "ckpt"),
                          per_device_train_batch_size=2,
                          gradient_accumulation_steps=1,
                          model_max_length=64, max_steps=4, save_steps=4,
                          eval_steps=2, mesh_shape=(1, 1, 1), seed=0),
    )
    assert [s for s, _ in res["eval_losses"]] == [2, 4]
    assert all(np.isfinite(v) for _, v in res["eval_losses"])
