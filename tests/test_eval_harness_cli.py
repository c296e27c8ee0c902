"""End-to-end evaluation harness CLI over real CSV/JSONL files."""

import json

import pytest

from llark_tpu.evaluation.harness import main

RESULTS = """example_id,prompt,response,model_completion
1,What genre is this?,jazz,"This track is a smooth jazz piece with saxophone. ###"
2,What genre is this?,rock,"Assistant: A driving rock song with distorted electric guitars."
3,What genre is this?,classical,"This is a classical orchestral work featuring strings."
4,What key is this in?,C# minor,"The piece is in C-sharp minor."
5,What key is this in?,F major,"It is in F major. ###"
6,What tempo?,120,"The tempo is approximately 121 BPM."
7,What tempo?,90,"Roughly 180 beats per minute."
8,What instruments?,"violin,piano","I hear a violin and a piano playing together."
9,What instruments?,"cello","There are cellos and a flute in this recording."
"""

LABELS = [
    {"example_id": "1", "genre": "jazz"},
    {"example_id": "2", "genre": "rock"},
    {"example_id": "3", "genre": "classical"},
    {"example_id": "4", "key": "Db minor"},
    {"example_id": "5", "key": "F major"},
    {"example_id": "6", "tempo": 120},
    {"example_id": "7", "tempo": 90},
    {"example_id": "8", "instruments": "violin,piano"},
    {"example_id": "9", "instruments": "cello"},
]


@pytest.fixture()
def files(tmp_path):
    results = tmp_path / "results.csv"
    results.write_text(RESULTS)
    labels = tmp_path / "labels.jsonl"
    labels.write_text("\n".join(json.dumps(r) for r in LABELS))
    return str(results), str(labels)


def run(capsys, argv):
    main(argv)
    return json.loads(capsys.readouterr().out.strip())


def test_genre(files, capsys):
    results, labels = files
    out = run(capsys, ["genre", "--results", results, "--labels", labels,
                       "--label-set", "jazz,rock,classical,pop"])
    assert out["acc@1"] == 1.0 and out["n"] == 3


def test_key(files, capsys):
    results, labels = files
    out = run(capsys, ["key", "--results", results, "--labels", labels])
    # C-sharp minor == Db minor enharmonic -> exact under GiantSteps mapping
    assert out["mirex_weighted"] == 1.0 and out["exact"] == 1.0 and out["n"] == 2


def test_tempo(files, capsys):
    results, labels = files
    out = run(capsys, ["tempo", "--results", results, "--labels", labels])
    assert out["acc_8pct"] == 0.5  # 121 vs 120 hits; 180 vs 90 strict-misses
    assert out["acc_8pct_octave"] == 1.0  # 180 = 2x90 accepted


def test_instruments(files, capsys):
    results, labels = files
    out = run(capsys, ["instruments", "--results", results, "--labels", labels,
                       "--vocab", "violin,piano,cello,flute"])
    assert out["n"] == 2 and 0 < out["f1"] <= 1.0


def test_genre_openai_embedder_plumbing(files, capsys, monkeypatch):
    """--embedder openai routes through the API-backed embedder (stubbed)."""
    import sys
    import types

    import numpy as np

    calls = []

    class _FakeEmbeddings:
        def create(self, model, input):
            calls.append((model, list(input)))
            rng = np.random.RandomState(len(calls))
            data = [types.SimpleNamespace(embedding=rng.randn(8).tolist())
                    for _ in input]
            return types.SimpleNamespace(data=data)

    class _FakeClient:
        def __init__(self):
            self.embeddings = _FakeEmbeddings()

    fake_openai = types.SimpleNamespace(OpenAI=_FakeClient)
    monkeypatch.setitem(sys.modules, "openai", fake_openai)

    results, labels = files
    out = run(capsys, ["genre", "--results", results, "--labels", labels,
                       "--label-set", "jazz,rock,classical,pop",
                       "--embedder", "openai"])
    assert out["n"] == 3
    assert len(calls) == 2  # one batch for completions, one for labels
    assert calls[0][0] == "text-embedding-3-small"
