"""CLAP text tower: import parity vs HF transformers + the harness
`--embedder clap` path (VERDICT r3 next-round item 5 — the offline genre
metric must use real embeddings, not hashed bag-of-words).

Real laion/clap-htsat-unfused weights are unavailable offline; these
tests prove the import + forward on structurally-exact tiny configs (the
same strategy as tests/test_clap_import.py for the audio tower) and that
rankings agree with the torch oracle end to end through
rank_labels_by_similarity.
"""

import contextlib
import csv
import io
import json
import os

import numpy as np
import pytest

from llark_tpu.encoders.clap.text import (
    ClapTextConfig,
    clap_text_embed,
    text_config_from_hf,
    text_params_from_hf,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def capsys_run(fn, argv):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fn(argv)
    return buf.getvalue()


@pytest.fixture(scope="module")
def tiny_clap_text():
    from transformers import ClapTextConfig as HFTextConfig
    from transformers import ClapTextModelWithProjection

    torch.manual_seed(1)
    hf_cfg = HFTextConfig(
        vocab_size=512,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=64,
        type_vocab_size=1,
        pad_token_id=1,
        layer_norm_eps=1e-12,
        projection_dim=32,
        projection_hidden_act="relu",
        hidden_act="gelu",
        attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0,
    )
    model = ClapTextModelWithProjection(hf_cfg).eval().float()
    return hf_cfg, model


def _import(hf_cfg, model):
    cfg = text_config_from_hf(hf_cfg)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return cfg, text_params_from_hf(sd, cfg)


def _batch_with_padding(vocab, pad_id, seed=3):
    rng = np.random.RandomState(seed)
    ids = np.full((3, 12), pad_id, np.int32)
    for r, n in enumerate((12, 7, 4)):
        row = rng.randint(2, vocab, size=(n,))
        ids[r, :n] = row
    mask = (ids != pad_id).astype(np.int64)
    return ids, mask


def test_clap_text_embedding_parity(tiny_clap_text):
    """Audio-tower-grade tolerance (2e-4) on a ragged padded batch —
    covers RoBERTa position indexing and the key-padding mask."""
    hf_cfg, model = tiny_clap_text
    cfg, params = _import(hf_cfg, model)
    ids, mask = _batch_with_padding(hf_cfg.vocab_size, hf_cfg.pad_token_id)

    with torch.no_grad():
        ref = model(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask),
        ).text_embeds.numpy()
    ours = np.asarray(clap_text_embed(cfg, params, ids))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_clap_text_rankings_agree_with_torch_oracle(tiny_clap_text, tmp_path):
    """End-to-end through the harness's ranking method: our embedder and
    the torch model (fed the same token ids) must produce identical label
    rankings — the offline analogue of the notebooks' OpenAI-vs-CLAP
    ranking check."""
    from llark_tpu.encoders.clap.text import make_text_embedder
    from llark_tpu.evaluation.utils import rank_labels_by_similarity, strip_completion

    hf_cfg, model = tiny_clap_text
    ckpt = tmp_path / "clap_text"
    os.makedirs(ckpt)
    torch.save(model.state_dict(), ckpt / "pytorch_model.bin")
    with open(ckpt / "config.json", "w") as f:
        json.dump({"text_config": hf_cfg.to_dict(), "projection_dim": 32}, f)

    completions = [
        "This piece is a fast bebop jazz tune with saxophone.",
        "A heavy metal track with distorted guitars.",
        "Gentle classical piano sonata in a minor key.",
    ]
    labels = ["jazz", "metal", "classical", "pop"]

    embedder = make_text_embedder(str(ckpt))  # fallback tokenizer (no tok files)
    ours = rank_labels_by_similarity(completions, labels, embedder=embedder)

    # torch oracle through the same fallback tokenization
    from llark_tpu.encoders.clap.text import load_clap_text_encoder

    cfg, _ = load_clap_text_encoder(str(ckpt))

    def torch_embed(texts):
        # rebuild the module's deterministic fallback tokenization (the
        # embedder's closure is not exposed), same max_len cap
        import zlib

        max_len = min(77, cfg.max_position_embeddings - cfg.pad_token_id - 1)
        ids = np.full((len(texts), max_len), cfg.pad_token_id, np.int32)
        for r, t in enumerate(texts):
            words = str(t).lower().split()[: max_len - 2]
            ids[r, 0] = 0
            for c, w in enumerate(words):
                ids[r, c + 1] = 2 + (zlib.crc32(w.encode()) % (cfg.vocab_size - 2))
            ids[r, len(words) + 1] = 2
        mask = (ids != cfg.pad_token_id).astype(np.int64)
        with torch.no_grad():
            v = model(
                input_ids=torch.from_numpy(ids).long(),
                attention_mask=torch.from_numpy(mask),
            ).text_embeds.numpy()
        return v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-9)

    ref = rank_labels_by_similarity(completions, labels, embedder=torch_embed)
    assert ours == ref


def test_harness_genre_clap_embedder_cli(tiny_clap_text, tmp_path):
    """`--embedder clap` scores genre acc@k with real on-device embeddings
    (no API, no hashed BoW) through the actual CLI."""
    hf_cfg, model = tiny_clap_text
    ckpt = tmp_path / "clap_text"
    os.makedirs(ckpt, exist_ok=True)
    torch.save(model.state_dict(), ckpt / "pytorch_model.bin")
    with open(ckpt / "config.json", "w") as f:
        json.dump({"text_config": hf_cfg.to_dict(), "projection_dim": 32}, f)

    results = tmp_path / "results.csv"
    with open(results, "w", newline="") as f:
        w = csv.DictWriter(f, ["example_id", "prompt", "response", "model_completion"])
        w.writeheader()
        w.writerow({"example_id": "a", "prompt": "", "response": "",
                    "model_completion": "a jazz tune"})
        w.writerow({"example_id": "b", "prompt": "", "response": "",
                    "model_completion": "metal with guitars"})
    labels = tmp_path / "labels.jsonl"
    with open(labels, "w") as f:
        f.write(json.dumps({"example_id": "a", "genre": "jazz"}) + "\n")
        f.write(json.dumps({"example_id": "b", "genre": "metal"}) + "\n")

    # in-process like test_eval_harness_cli.py (a subprocess would pick up
    # the axon TPU backend via sitecustomize and compile through the tunnel)
    from llark_tpu.evaluation.harness import main as harness_main

    out = capsys_run(harness_main, [
        "genre", "--results", str(results), "--labels", str(labels),
        "--label-set", "jazz,metal,classical",
        "--embedder", "clap", "--clap-checkpoint", str(ckpt),
    ])
    metrics = json.loads(out.strip().splitlines()[-1])
    assert metrics["n"] == 2
    assert set(metrics) >= {"acc@1", "acc@2", "acc@3"}
