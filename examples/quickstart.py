"""Quickstart: train a tiny LLark on synthetic data and query it.

Runs anywhere JAX runs (CPU included; no downloads, no audio files):

    python examples/quickstart.py

It walks the same path a real run takes — pack WebDataset shards of
(QA + audio-encoding) samples, train with checkpoints, reload via the
self-describing output dir, and serve one request — swapping Jukebox
embeddings for random vectors and the Llama tokenizer for the built-in
WordTokenizer. For real data, see MIGRATION.md: every stage here has a
CLI counterpart (`pack_webdataset`, `train.train`, `from_encodings`,
`http_server`).
"""

import os
import sys
import tempfile

import numpy as np

# allow `python examples/quickstart.py` from a source checkout without install
_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_repo_root, "llark_tpu")):
    sys.path.insert(0, _repo_root)


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from llark_tpu.config import DataArguments, ModelArguments, TrainingArguments
    from llark_tpu.data.webdataset import TarShardWriter
    from llark_tpu.infer import infer_with_prompt
    from llark_tpu.generate import GenerationConfig, Generator
    from llark_tpu.models.utils import load_pretrained_model
    from llark_tpu.train.train import train

    workdir = tempfile.mkdtemp(prefix="llark_quickstart_")
    mm = 16  # stand-in for the 4800-d Jukebox embedding width
    rng = np.random.RandomState(0)

    # -- 1. pack a training shard: {QA json + audio encoding} per sample --
    shard_pattern = os.path.join(workdir, "mir-train-%05d.tar")
    writer = TarShardWriter(shard_pattern, max_count=100)
    for i in range(16):
        writer.write({
            "__key__": f"clip{i:03d}",
            "json": {"response": [
                {"question": "what genre is this ?", "answer": "jazz ."},
            ]},
            "audio_encoding.pyd": rng.randn(6, mm).astype(np.float32),
        })
    writer.close()
    print(f"[1/4] packed 16 samples -> {shard_pattern % 0}")

    # -- 2. train a tiny model (~1 min on CPU) ----------------------------
    ckpt_dir = os.path.join(workdir, "ckpt")
    result = train(
        ModelArguments(model_name_or_path="tiny", mm_hidden_size=mm),
        DataArguments(
            train_data_path=shard_pattern % 0,
            max_audio_frames=6,
            task_sample_probs={"mir": 1.0},
        ),
        TrainingArguments(
            output_dir=ckpt_dir,
            per_device_train_batch_size=4,
            gradient_accumulation_steps=1,
            model_max_length=64,
            max_steps=30,
            save_steps=30,
            learning_rate=3e-3,
            logging_steps=10,
            mesh_shape=(1, 1, 1),
            seed=0,
        ),
    )
    print(f"[2/4] trained {result['final_step']} steps, "
          f"loss {result['losses'][0]:.2f} -> {result['losses'][-1]:.2f}")

    # -- 3. reload from the self-describing output dir --------------------
    cfg, params, bundle = load_pretrained_model(ckpt_dir)
    print(f"[3/4] reloaded: {cfg.num_layers}L/{cfg.hidden_size}d, "
          f"vocab {cfg.vocab_size}")

    # -- 4. ask it something ----------------------------------------------
    gen = Generator(
        cfg, params, bundle.audio_patch_id,
        GenerationConfig(max_new_tokens=8, stop_text="###"),
        max_cache_len=256,
    )
    completion = infer_with_prompt(
        "what genre is this ?",
        rng.randn(6, mm).astype(np.float32),
        gen,
        bundle,
    )
    print(f"[4/4] completion: {completion!r}")
    print(f"\nartifacts in {workdir}; next steps: MIGRATION.md")


if __name__ == "__main__":
    main()
