"""Inference layer tests: checkpoint load, infer_with_prompt, CSV CLIs."""

import csv
import os

import numpy as np
import pytest

from llark_tpu.config import DataArguments, ModelArguments, TrainingArguments
from llark_tpu.data.webdataset import TarShardWriter
from llark_tpu.generate import GenerationConfig, Generator
from llark_tpu.infer import batch_infer, build_prompt_ids, infer_with_prompt
from llark_tpu.models.utils import load_pretrained_model
from llark_tpu.train.train import train

MM = 16


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("infer")
    w = TarShardWriter(str(tmp / "mir-train-%05d.tar"), max_count=100)
    rng = np.random.RandomState(0)
    for i in range(8):
        w.write(
            {
                "__key__": f"t{i:03d}",
                "json": {
                    "response": [{"question": "what genre ?", "answer": "jazz ."}]
                },
                "audio_encoding.pyd": rng.randn(5, MM).astype(np.float32),
            }
        )
    w.close()
    model_args = ModelArguments(model_name_or_path="tiny", mm_hidden_size=MM)
    data_args = DataArguments(
        train_data_path=str(tmp / "mir-train-00000.tar"),
        max_audio_frames=6,
        task_sample_probs={"mir": 1.0},
    )
    training_args = TrainingArguments(
        output_dir=str(tmp / "ckpt"),
        per_device_train_batch_size=2,
        gradient_accumulation_steps=1,
        model_max_length=96,
        max_steps=2,
        save_steps=2,
        mesh_shape=(1, 1, 1),
        seed=0,
    )
    train(model_args, data_args, training_args)
    return tmp


def test_load_pretrained_model(trained_ckpt):
    cfg, params, bundle = load_pretrained_model(str(trained_ckpt / "ckpt"))
    assert cfg.mm_hidden_size == MM
    assert "mm_projector" in params
    assert params["embed"].shape[0] == cfg.vocab_size


def test_infer_with_prompt(trained_ckpt):
    cfg, params, bundle = load_pretrained_model(str(trained_ckpt / "ckpt"))
    gen = Generator(
        cfg,
        params,
        audio_patch_id=bundle.audio_patch_id,
        gen_cfg=GenerationConfig(max_new_tokens=8, stop_text="###"),
        max_cache_len=256,
    )
    enc = np.random.RandomState(1).randn(5, MM).astype(np.float32)
    text = infer_with_prompt("what genre ?", enc, gen, bundle)
    assert isinstance(text, str)


def test_build_prompt_ids_ends_at_assistant(trained_ckpt):
    cfg, params, bundle = load_pretrained_model(str(trained_ckpt / "ckpt"))
    ids = build_prompt_ids("what genre ?", 5, bundle)
    text = bundle.decode(ids)
    assert text.rstrip().endswith("Assistant:") or text.rstrip().endswith("Assistant :")
    n_patch = sum(1 for i in ids if i == bundle.audio_patch_id)
    assert n_patch == 5


def test_infer_from_webdataset_cli(trained_ckpt, tmp_path):
    from llark_tpu.inference.from_webdataset import main

    out_csv = str(tmp_path / "results.csv")
    main(
        [
            "--checkpoint-dir",
            str(trained_ckpt / "ckpt"),
            "--input",
            str(trained_ckpt / "mir-train-00000.tar"),
            "--output",
            out_csv,
            "--max-samples",
            "2",
            "--max-new-tokens",
            "4",
            "--max-cache-len",
            "256",
        ]
    )
    with open(out_csv) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    assert rows[0]["example_id"] == "t000"
    assert rows[0]["prompt"] == "what genre ?"
    assert set(rows[0]) == {"example_id", "prompt", "response", "model_completion"}


def test_infer_from_encodings_cli(trained_ckpt, tmp_path):
    from llark_tpu.inference.from_encodings import main

    enc_dir = tmp_path / "encs"
    os.makedirs(enc_dir)
    rng = np.random.RandomState(2)
    for i in range(2):
        np.save(enc_dir / f"clip{i}.npy", rng.randn(5, MM).astype(np.float32))
    out_csv = str(tmp_path / "enc_results.csv")
    main(
        [
            "--checkpoint-dir",
            str(trained_ckpt / "ckpt"),
            "--encodings-dir",
            str(enc_dir),
            "--output",
            out_csv,
            "--prompt",
            "describe this .",
            "--max-new-tokens",
            "4",
            "--max-cache-len",
            "256",
        ]
    )
    with open(out_csv) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    assert rows[0]["example_id"] == "clip0"


def test_infer_from_webdataset_cli_continuous_batching(trained_ckpt, tmp_path):
    """--continuous-batching produces the same greedy completions as the
    one-at-a-time path."""
    from llark_tpu.inference.from_webdataset import main

    common = [
        "--checkpoint-dir", str(trained_ckpt / "ckpt"),
        "--input", str(trained_ckpt / "mir-train-00000.tar"),
        "--max-samples", "3",
        "--max-new-tokens", "4",
        "--max-cache-len", "256",
    ]
    a_csv, b_csv = str(tmp_path / "a.csv"), str(tmp_path / "b.csv")
    main(common + ["--output", a_csv])
    main(common + ["--output", b_csv, "--continuous-batching", "2"])
    with open(a_csv) as f:
        a = list(csv.DictReader(f))
    with open(b_csv) as f:
        b = list(csv.DictReader(f))
    assert len(b) == 3
    assert [r["example_id"] for r in a] == [r["example_id"] for r in b]
    assert [r["model_completion"] for r in a] == [r["model_completion"] for r in b]


def test_infer_from_webdataset_cli_speculative(trained_ckpt, tmp_path):
    """--speculative ngram produces the same greedy completions as the
    plain Generator path (token-exact draft-and-verify)."""
    from llark_tpu.inference.from_webdataset import main

    common = [
        "--checkpoint-dir", str(trained_ckpt / "ckpt"),
        "--input", str(trained_ckpt / "mir-train-00000.tar"),
        "--max-samples", "3",
        "--max-new-tokens", "6",
        "--max-cache-len", "256",
    ]
    a_csv, b_csv = str(tmp_path / "sa.csv"), str(tmp_path / "sb.csv")
    main(common + ["--output", a_csv])
    # tiny ckpts are bf16: the dtype gate requires the explicit opt-in.
    # On the CPU test backend bf16 matmuls accumulate in fp32, so the
    # token-equality assertion below still holds (the divergence the gate
    # guards against is a TPU bf16-pass artifact).
    main(common + ["--output", b_csv, "--speculative", "ngram", "--gamma", "3",
                   "--allow-divergent-spec"])
    with open(a_csv) as f:
        a = list(csv.DictReader(f))
    with open(b_csv) as f:
        b = list(csv.DictReader(f))
    assert [r["model_completion"] for r in a] == [r["model_completion"] for r in b]


def test_infer_from_encodings_cli_beam(trained_ckpt, tmp_path):
    """--num-beams 1 equals the default path; --num-beams 3 runs end-to-end."""
    from llark_tpu.inference.from_encodings import main

    enc_dir = tmp_path / "encb"
    os.makedirs(enc_dir)
    rng = np.random.RandomState(5)
    np.save(enc_dir / "clip0.npy", rng.randn(5, MM).astype(np.float32))
    common = [
        "--checkpoint-dir", str(trained_ckpt / "ckpt"),
        "--encodings-dir", str(enc_dir),
        "--prompt", "describe this .",
        "--max-new-tokens", "5",
        "--max-cache-len", "256",
    ]
    outs = {}
    for k in ("1", "3"):
        csv_path = str(tmp_path / f"beam{k}.csv")
        main(common + ["--output", csv_path, "--num-beams", k])
        with open(csv_path) as f:
            outs[k] = [r["model_completion"] for r in csv.DictReader(f)]
    base_csv = str(tmp_path / "base.csv")
    main(common + ["--output", base_csv])
    with open(base_csv) as f:
        base = [r["model_completion"] for r in csv.DictReader(f)]
    assert outs["1"] == base
    assert len(outs["3"]) == 1 and isinstance(outs["3"][0], str)


def test_infer_from_encodings_cli_speculative_draft(trained_ckpt, tmp_path):
    """--speculative draft with the model as its own draft reproduces the
    plain path exactly (and exercises the draft-flag plumbing)."""
    from llark_tpu.inference.from_encodings import main

    enc_dir = tmp_path / "encd"
    os.makedirs(enc_dir)
    rng = np.random.RandomState(7)
    np.save(enc_dir / "clip0.npy", rng.randn(5, MM).astype(np.float32))
    common = [
        "--checkpoint-dir", str(trained_ckpt / "ckpt"),
        "--encodings-dir", str(enc_dir),
        "--prompt", "describe this .",
        "--max-new-tokens", "5",
        "--max-cache-len", "256",
    ]
    a_csv, b_csv = str(tmp_path / "da.csv"), str(tmp_path / "db.csv")
    main(common + ["--output", a_csv])
    main(common + ["--output", b_csv, "--speculative", "draft",
                   "--draft-checkpoint-dir", str(trained_ckpt / "ckpt"),
                   "--gamma", "2", "--allow-divergent-spec"])
    with open(a_csv) as f:
        a = [r["model_completion"] for r in csv.DictReader(f)]
    with open(b_csv) as f:
        b = [r["model_completion"] for r in csv.DictReader(f)]
    assert a == b


def test_infer_cli_continuous_ngram_and_paged(trained_ckpt, tmp_path):
    """Round-3 serving features through the REAL CLI surface:
    --continuous-batching with --speculative ngram (draft-free verify
    rounds) and with --kv-block-size (paged KV) both reproduce the
    plain continuous-batching completions exactly."""
    from llark_tpu.inference.from_webdataset import main

    common = [
        "--checkpoint-dir", str(trained_ckpt / "ckpt"),
        "--input", str(trained_ckpt / "mir-train-00000.tar"),
        "--max-samples", "3",
        "--max-new-tokens", "4",
        "--max-cache-len", "256",
        "--continuous-batching", "2",
    ]
    outs = {}
    for name, extra in (
        ("plain", []),
        # --allow-divergent-spec: the bf16 gate (inference/speculative.py
        # check_spec_dtype) requires explicit opt-in below fp32; this tiny
        # CPU model then demonstrates exactness anyway (asserted below)
        ("ngram", ["--speculative", "ngram", "--gamma", "3",
                   "--allow-divergent-spec"]),
        ("paged", ["--kv-block-size", "64", "--kv-pool-blocks", "8"]),
        ("paged_ngram", ["--kv-block-size", "64", "--kv-pool-blocks", "8",
                         "--speculative", "ngram", "--gamma", "3",
                         "--allow-divergent-spec"]),
    ):
        csv_path = str(tmp_path / f"cli_{name}.csv")
        main(common + ["--output", csv_path] + extra)
        with open(csv_path) as f:
            outs[name] = [r["model_completion"] for r in csv.DictReader(f)]
    assert outs["ngram"] == outs["plain"]
    assert outs["paged"] == outs["plain"]
    assert outs["paged_ngram"] == outs["plain"]


def test_paged_cli_flag_validation(trained_ckpt, tmp_path):
    """--kv-block-size without --continuous-batching, or combined with
    --speculative draft / --prefix-cache, exits with a clear error."""
    import pytest

    from llark_tpu.inference.from_webdataset import main

    base = [
        "--checkpoint-dir", str(trained_ckpt / "ckpt"),
        "--input", str(trained_ckpt / "mir-train-00000.tar"),
        "--output", str(tmp_path / "x.csv"),
    ]
    with pytest.raises(SystemExit, match="continuous-batching"):
        main(base + ["--kv-block-size", "64"])
    with pytest.raises(SystemExit, match="prefix-cache"):
        main(base + ["--continuous-batching", "2", "--kv-block-size", "64",
                     "--prefix-cache"])
