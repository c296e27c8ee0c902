"""Golden-path lifecycle test: the whole framework, CLI to CLI.

raw WAV -> convert -> crop -> annotate (DSP) -> crop-annotations ->
[instruction JSONL] -> jukebox-tiny embedding extraction -> WDS packing ->
training (2 steps, checkpoints) -> batch inference CSV -> eval harness.

Each stage consumes exactly what the previous stage wrote on disk, the
same contract a reference user follows in MIGRATION.md order.
"""

import csv
import glob
import json
import os

import numpy as np
import pytest

from llark_tpu.audio.io import write_wav


@pytest.mark.slow
def test_full_lifecycle(tmp_path):
    root = str(tmp_path)

    # -- 0. raw audio: two synthetic clips (sine + chirpy noise) ----------
    raw = os.path.join(root, "raw")
    os.makedirs(raw)
    sr = 44100
    rng = np.random.RandomState(0)
    t = np.arange(4 * sr) / sr
    write_wav(os.path.join(raw, "trk0.wav"),
              (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), sr)
    write_wav(os.path.join(raw, "trk1.wav"),
              (0.2 * np.sin(2 * np.pi * 330 * t)
               + 0.05 * rng.randn(len(t))).astype(np.float32), sr)

    from llark_tpu.preprocessing.pipeline_cli import main as pipeline

    # -- 1. convert + crop -------------------------------------------------
    wav_dir = os.path.join(root, "wav")
    pipeline(["convert", "--input-dir", raw, "--output-dir", wav_dir,
              "--workers", "2"])
    crop_dir = os.path.join(root, "crops")
    pipeline(["crop", "--input-dir", wav_dir, "--output-dir", crop_dir,
              "--workers", "2"])
    crops = sorted(glob.glob(os.path.join(crop_dir, "*.wav")))
    assert len(crops) == 2
    assert "-start0.000-end4.000" in crops[0]

    # -- 2. annotate (tempo/beats/chords/key) + merge with crop windows ---
    meta = os.path.join(root, "meta.jsonl")
    with open(meta, "w") as f:
        for i in range(2):
            f.write(json.dumps({"id": f"trk{i}"}) + "\n")
    ann = os.path.join(root, "annotated.jsonl")
    pipeline(["annotate", "--input-jsonl", meta, "--audio-dir", wav_dir,
              "--output", ann, "--workers", "1"])
    rows = [json.loads(l) for l in open(ann)]
    assert all("tempo_in_beats_per_minute_madmom" in r for r in rows)
    merged = os.path.join(root, "merged.jsonl")
    pipeline(["crop-annotations", "--annotations-file", ann,
              "--audio-dir", crop_dir, "--output", merged])
    assert os.path.exists(merged)

    # -- 3. instruction data (offline substitute for the OpenAI stage) ----
    crop_ids = [os.path.splitext(os.path.basename(c))[0] for c in crops]
    instruct = os.path.join(root, "instruct.jsonl")
    with open(instruct, "w") as f:
        for cid in crop_ids:
            f.write(json.dumps({
                "id": cid,
                "response": [{"question": "what genre is this ?",
                              "answer": "jazz ."}],
            }) + "\n")

    # -- 4. jukebox-tiny embedding extraction over the crops ---------------
    from llark_tpu.encoders.extract_cli import main as extract

    enc_dir = os.path.join(root, "enc")
    extract(["jukebox", "--input-dir", crop_dir, "--output-dir", enc_dir,
             "--tiny", "--batch-size", "2"])
    encs = sorted(glob.glob(os.path.join(enc_dir, "*.npy")))
    assert len(encs) == 2
    mm = int(np.load(encs[0]).shape[-1])

    # -- 5. pack WebDataset shards ----------------------------------------
    from llark_tpu.preprocessing.pack_webdataset import main as pack

    shard_pat = os.path.join(root, "shards", "mir-train-%05d.tar")
    pack(["--instruct-jsonl", instruct, "--encodings-dir", enc_dir,
          "--output-pattern", shard_pat])
    shards = sorted(glob.glob(os.path.join(root, "shards", "*.tar")))
    assert len(shards) == 1

    # -- 6. train (tiny model, 2 steps, checkpoint) ------------------------
    from llark_tpu.train.train import main as train_main

    ckpt = os.path.join(root, "ckpt")
    train_main([
        "--model_name_or_path", "tiny",
        "--mm_hidden_size", str(mm),
        "--train_data_path", shards[0],
        "--max_audio_frames", "8",
        "--output_dir", ckpt,
        "--per_device_train_batch_size", "2",
        "--gradient_accumulation_steps", "1",
        "--model_max_length", "96",
        "--max_steps", "2",
        "--save_steps", "2",
        "--mesh_shape", "1,1,1",
    ])
    assert os.path.exists(os.path.join(ckpt, "model_config.json"))

    # -- 7. batch inference back over the shard -> CSV ---------------------
    from llark_tpu.inference.from_webdataset import main as infer_main

    results_csv = os.path.join(root, "results.csv")
    infer_main([
        "--checkpoint-dir", ckpt,
        "--input", shards[0],
        "--output", results_csv,
        "--max-new-tokens", "4",
        "--max-cache-len", "256",
    ])
    with open(results_csv) as f:
        results = list(csv.DictReader(f))
    assert len(results) == 2
    assert {r["example_id"] for r in results} == set(crop_ids)

    # -- 8. eval harness over the CSV --------------------------------------
    from llark_tpu.evaluation.harness import main as harness

    labels = os.path.join(root, "labels.jsonl")
    with open(labels, "w") as f:
        for cid in crop_ids:
            f.write(json.dumps({"example_id": cid, "genre": "jazz"}) + "\n")
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        harness(["genre", "--results", results_csv, "--labels", labels,
                 "--label-set", "jazz,rock,classical"])
    metrics = json.loads(buf.getvalue().strip())
    assert metrics["n"] == 2 and 0.0 <= metrics["acc@1"] <= 1.0
