"""Jsonifiers, MIDI parser, preprocessing CLIs, WDS packer tests."""

import csv
import json
import os
import struct

import numpy as np
import pytest

from llark_tpu.dataset_utils import (
    DATASET_INFO,
    get_cropped_uri,
    parse_cropped_id,
    wds_key_to_example_id,
)
from llark_tpu.dataset_utils.midi import (
    GM_PROGRAMS,
    get_formatted_notes_list,
    parse_midi,
    pitch_to_note_label,
    program_to_instrument,
)
from llark_tpu.preprocessing.jsonify import get_jsonifier
from llark_tpu.preprocessing.pipeline_cli import (
    crop_annotation_row,
    crop_span_events,
    crop_time_events,
    parse_cropped_filenames,
)
from llark_tpu.preprocessing.wavcaps_filters import keyword_filter, length_filter


# ---------------------------------------------------------------------------
# MIDI
# ---------------------------------------------------------------------------


def _varlen(x):
    out = [x & 0x7F]
    x >>= 7
    while x:
        out.append(0x80 | (x & 0x7F))
        x >>= 7
    return bytes(reversed(out))


def make_midi(notes, tempo_us=500000, division=480, program=40):
    """notes: [(pitch, start_tick, end_tick)]"""
    events = [(0, bytes([0xFF, 0x51, 0x03]) + tempo_us.to_bytes(3, "big"))]
    events.append((0, bytes([0xC0, program])))
    for pitch, s, e in notes:
        events.append((s, bytes([0x90, pitch, 100])))
        events.append((e, bytes([0x80, pitch, 0])))
    events.sort(key=lambda x: x[0])
    track = b""
    last = 0
    for tick, payload in events:
        track += _varlen(tick - last) + payload
        last = tick
    track += _varlen(0) + bytes([0xFF, 0x2F, 0x00])
    header = b"MThd" + struct.pack(">IHHH", 6, 0, 1, division)
    return header + b"MTrk" + struct.pack(">I", len(track)) + track


def test_parse_midi_basic():
    data = make_midi([(60, 0, 480), (64, 480, 960)])  # two quarter notes @120bpm
    notes = parse_midi(data)
    assert len(notes) == 2
    assert notes[0]["pitch"] == 60
    assert abs(notes[0]["start"] - 0.0) < 1e-6
    assert abs(notes[0]["end"] - 0.5) < 1e-6
    assert abs(notes[1]["start"] - 0.5) < 1e-6
    assert notes[0]["program"] == 40  # violin


def test_parse_midi_tempo_change():
    # tempo doubles halfway: second note takes half the wall time
    ev_tempo = bytes([0xFF, 0x51, 0x03]) + (250000).to_bytes(3, "big")
    track = (
        _varlen(0) + bytes([0x90, 60, 100])
        + _varlen(480) + bytes([0x80, 60, 0])
        + _varlen(0) + ev_tempo
        + _varlen(0) + bytes([0x90, 62, 100])
        + _varlen(480) + bytes([0x80, 62, 0])
        + _varlen(0) + bytes([0xFF, 0x2F, 0x00])
    )
    data = b"MThd" + struct.pack(">IHHH", 6, 0, 1, 480)
    data += b"MTrk" + struct.pack(">I", len(track)) + track
    notes = parse_midi(data)
    assert abs(notes[0]["end"] - notes[0]["start"] - 0.5) < 1e-6
    assert abs(notes[1]["end"] - notes[1]["start"] - 0.25) < 1e-6


def test_note_and_program_labels():
    assert pitch_to_note_label(60) == "C4"
    assert pitch_to_note_label(69) == "A4"
    assert program_to_instrument(40) == "Violin"
    assert program_to_instrument(41, one_indexed=True) == "Violin"
    assert program_to_instrument(45, pizzicato_to_violin=True) == "Violin"
    assert len(GM_PROGRAMS) == 128


def test_formatted_notes_list():
    data = make_midi([(60, 0, 480)], program=0)
    notes = parse_midi(data)
    fmt = get_formatted_notes_list(notes)
    assert "Acoustic Grand Piano" in fmt
    assert fmt["Acoustic Grand Piano"][0]["pitch"] == "C4"


# ---------------------------------------------------------------------------
# dataset_utils helpers
# ---------------------------------------------------------------------------


def test_crop_id_helpers():
    uri = get_cropped_uri("abc/track1.wav", 30.0, 60.0)
    assert uri == "abc/track1-start30.000-end60.000.wav"
    parsed = parse_cropped_id("track1-start30.000-end60.000")
    assert parsed == {"id": "track1", "start": 30.0, "end": 60.0}
    assert wds_key_to_example_id("shard/track1-start30.000-end60.000") == "track1"
    assert len(DATASET_INFO) == 11


# ---------------------------------------------------------------------------
# jsonifiers
# ---------------------------------------------------------------------------


def test_musiccaps_jsonifier(tmp_path):
    with open(tmp_path / "musiccaps-public.csv", "w", newline="") as f:
        w = csv.DictWriter(
            f, fieldnames=["ytid", "start_s", "end_s", "caption", "aspect_list", "is_audioset_eval"]
        )
        w.writeheader()
        w.writerow(
            dict(ytid="abc", start_s=10, end_s=20, caption="piano jazz",
                 aspect_list="['piano']", is_audioset_eval="False")
        )
        w.writerow(
            dict(ytid="xyz", start_s=0, end_s=10, caption="rock", aspect_list="[]",
                 is_audioset_eval="True")
        )
    j = get_jsonifier("musiccaps", str(tmp_path), "train")
    j.load_raw_data()
    assert len(j.data) == 1 and j.data[0]["ytid"] == "abc"
    j2 = get_jsonifier("musiccaps", str(tmp_path), "eval")
    j2.load_raw_data()
    assert len(j2.data) == 1 and j2.data[0]["ytid"] == "xyz"
    out = j.export_to_json(str(tmp_path / "out.jsonl"))
    assert os.path.exists(out)


def test_giantsteps_jsonifiers(tmp_path):
    os.makedirs(tmp_path / "annotations" / "key")
    os.makedirs(tmp_path / "annotations" / "tempo")
    (tmp_path / "annotations" / "key" / "123.LOFI.key").write_text("d minor")
    (tmp_path / "annotations" / "tempo" / "123.LOFI.bpm").write_text("128")
    jk = get_jsonifier("giantsteps-key", str(tmp_path))
    jk.load_raw_data()
    assert jk.data == [{"id": "123.LOFI", "key": "d minor"}]
    jt = get_jsonifier("giantsteps-tempo", str(tmp_path))
    jt.load_raw_data()
    assert jt.data == [{"id": "123.LOFI", "tempo": 128.0}]


def test_jamendo_jsonifier(tmp_path):
    (tmp_path / "raw.tsv").write_text(
        "TRACK_ID\tARTIST_ID\tALBUM_ID\tPATH\tDURATION\tTAGS\n"
        "track_1\ta1\tal1\t00/1.mp3\t200.0\tgenre---rock\tmood---happy\n"
    )
    j = get_jsonifier("mtg-jamendo", str(tmp_path))
    j.load_raw_data()
    assert j.data[0]["TRACK_ID"] == "track_1"
    assert j.data[0]["TAGS"] == ["genre---rock", "mood---happy"]


def test_wavcaps_jsonifier(tmp_path):
    blob = {
        "data": [
            {"id": "1.wav", "caption": "a jazz band plays a lively tune", "duration": 30},
            {"id": "2.wav", "caption": "a dog barking near traffic", "duration": 5},
            {"id": "3.wav", "caption": "music", "duration": 5},  # too short
        ]
    }
    (tmp_path / "as.json").write_text(json.dumps(blob))
    j = get_jsonifier("wavcaps", str(tmp_path))
    j.load_raw_data()
    assert [r["id"] for r in j.data] == ["1.wav"]


def test_wavcaps_filters():
    assert keyword_filter("an orchestra performs a symphony")
    assert not keyword_filter("a man speaking about cars")
    assert not keyword_filter("random noise")
    assert length_filter("three word caption")
    assert not length_filter("two words")


def test_musicnet_jsonifier(tmp_path):
    os.makedirs(tmp_path / "musicnet_midis" / "Bach")
    data = make_midi([(60, 0, 480)], program=40)
    (tmp_path / "musicnet_midis" / "Bach" / "2186_vs6_1.mid").write_bytes(data)
    with open(tmp_path / "musicnet_metadata.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["id", "composer", "ensemble"])
        w.writeheader()
        w.writerow({"id": "2186", "composer": "Bach", "ensemble": "Solo Violin"})
    j = get_jsonifier("musicnet", str(tmp_path))
    j.load_raw_data()
    assert j.data[0]["id"] == "2186"
    assert j.data[0]["composer"] == "Bach"
    notes = json.loads(j.data[0]["notes"])
    # program 40, one-indexed -> GM 39 'Synth Bass 1'? No: one-indexed 40 -> index 39
    assert isinstance(notes, dict) and len(notes) == 1


def test_fma_jsonifier(tmp_path):
    with open(tmp_path / "genres.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["genre_id", "title"])
        w.writeheader()
        w.writerow({"genre_id": "21", "title": "Hip-Hop"})
    with open(tmp_path / "tracks.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["", "set", "set", "track", "track", "artist", "album"])
        w.writerow(["track_id", "split", "subset", "title", "genres", "name", "title"])
        w.writerow(["", "", "", "", "", "", ""])
        # real FMA vocabulary: training/validation/test (the CLI's 'train'
        # split maps onto 'training')
        w.writerow(["2", "training", "small", "Food <b>!</b>", "[21]", "AWOL", "AWOL - A Way Of Life"])
        w.writerow(["5", "test", "small", "Other", "[]", "X", "Y"])
    j = get_jsonifier("fma", str(tmp_path), split="train")
    j.load_raw_data()
    assert len(j.data) == 1
    assert j.data[0]["title"] == "Food !"
    assert j.data[0]["genres"] == ["Hip-Hop"]


# ---------------------------------------------------------------------------
# crop-annotations semantics
# ---------------------------------------------------------------------------


def test_crop_time_and_span_events():
    events = [{"time": 5.0}, {"time": 35.0}, {"time": 65.0}]
    out = crop_time_events(events, 30.0, 60.0)
    assert out == [{"time": 5.0}]

    spans = [
        {"start_time": 0.0, "end_time": 10.0, "chord": "C major"},
        {"start_time": 25.0, "end_time": 40.0, "chord": "F major"},
        {"start_time": 55.0, "end_time": 70.0, "chord": "G major"},
    ]
    out = crop_span_events(spans, 30.0, 60.0)
    assert len(out) == 2
    assert out[0]["start_time"] == 0.0 and out[0]["end_time"] == 10.0
    assert out[1]["start_time"] == 25.0 and out[1]["end_time"] == 30.0


def test_crop_annotation_row_max_duration():
    row = {
        "id": "x",
        "downbeats_madmom": [{"time": t, "beat_number": 1} for t in (31.0, 50.0, 58.0)],
        "chords": [{"start_time": 30.0, "end_time": 60.0, "chord": "C major"}],
        "notes": json.dumps({"Violin": [{"start": 30.0, "end": 59.0, "pitch": "C4"}]}),
    }
    out = crop_annotation_row(row, 30.0, 60.0, max_crop_duration=25.0)
    # window clipped to [30, 55]
    assert [d["time"] for d in out["downbeats_madmom"]] == [1.0, 20.0]
    assert out["chords"][0]["end_time"] == 25.0
    assert out["notes"]["Violin"][0]["end"] == 25.0


def test_parse_cropped_filenames():
    out = parse_cropped_filenames(["/a/track-1-start30.000-end60.000.wav"])
    assert out == [("track-1", 30.0, 60.0)]


def test_pack_webdataset_cli(tmp_path):
    from llark_tpu.data.webdataset import TarShardReader
    from llark_tpu.preprocessing.pack_webdataset import main

    enc_dir = tmp_path / "encs"
    os.makedirs(enc_dir)
    np.save(enc_dir / "a.npy", np.ones((4, 8), np.float32))
    qa = tmp_path / "qa.jsonl"
    qa.write_text(
        json.dumps({"id": "a", "response": [{"question": "q?", "answer": "a."}]})
        + "\n"
        + json.dumps({"id": "missing", "response": [{"question": "q", "answer": "a"}]})
        + "\n"
    )
    pattern = str(tmp_path / "shard-%05d.tar")
    main(
        [
            "--instruct-jsonl", str(qa),
            "--encodings-dir", str(enc_dir),
            "--output-pattern", pattern,
        ]
    )
    samples = list(TarShardReader([pattern % 0]))
    assert len(samples) == 1
    assert samples[0]["__key__"] == "a"
    assert samples[0]["audio_encoding.pyd"].shape == (4, 8)


def test_format_slakh_notes_list_drums_and_programs():
    from llark_tpu.dataset_utils.midi import format_slakh_notes_list

    notes = [
        {"start": 0.0, "end": 0.5, "pitch": 60, "program": 0, "channel": 0},
        {"start": 0.1, "end": 0.2, "pitch": 38, "program": 0, "channel": 9},
        {"start": 0.3, "end": 0.4, "pitch": 42, "program": 0, "channel": 9},
        {"start": 0.5, "end": 0.6, "pitch": 1, "program": 0, "channel": 9},  # unknown drum
        {"start": 1.0, "end": 1.5, "pitch": 64, "program": 40, "channel": 1},
    ]
    out = format_slakh_notes_list(notes)
    assert out["Drums"] == [
        {"start": 0.1, "end": 0.2, "pitch": "Acoustic Snare"},
        {"start": 0.3, "end": 0.4, "pitch": "Closed Hi-hat"},
    ]
    assert out["Violin"][0]["pitch"] == "E4"
    assert "Acoustic Grand Piano" in out


def test_notebook_audio_player():
    import numpy as np
    from llark_tpu.notebook_lib import audio_player_html

    html = audio_player_html(np.sin(np.linspace(0, 100, 4410)), 44100)
    assert html.startswith("<audio") and "base64," in html
