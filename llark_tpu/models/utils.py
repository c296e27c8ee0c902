"""Checkpoint save/load utilities for inference.

Parity target: m2t/models/utils.py:126-199 `load_pretrained_model` — the
reference reads an HF checkpoint dir (tokenizer + model + projector +
audio-token re-init). Here a training run's output_dir is self-describing:
`model_config.json` (architecture + tokenizer) + orbax checkpoints, so
inference needs only the directory and an optional checkpoint number.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from llark_tpu.config import ModelConfig
from llark_tpu.models.fusion import init_llark_params
from llark_tpu.tokenization import TokenizerBundle, WordTokenizer


def save_model_metadata(
    output_dir: str, cfg: ModelConfig, bundle: TokenizerBundle
) -> None:
    """Write model_config.json next to the orbax checkpoints."""
    os.makedirs(output_dir, exist_ok=True)
    tok = bundle.tokenizer
    if isinstance(tok, WordTokenizer):
        tok_meta: Dict[str, Any] = {"type": "word", **tok.to_dict()}
    else:
        tok_meta = {
            "type": "hf",
            "path": getattr(tok, "name_or_path", None),
            "model_max_length": bundle.model_max_length,
        }
    payload = {
        "model_config": dataclasses.asdict(cfg),
        "tokenizer": tok_meta,
    }
    with open(os.path.join(output_dir, "model_config.json"), "w") as f:
        json.dump(payload, f, indent=2)


def load_model_metadata(checkpoint_dir: str) -> Tuple[ModelConfig, TokenizerBundle]:
    with open(os.path.join(checkpoint_dir, "model_config.json")) as f:
        payload = json.load(f)
    cfg = ModelConfig(**payload["model_config"])
    tok_meta = payload["tokenizer"]
    if tok_meta["type"] == "word":
        tok = WordTokenizer.from_dict(tok_meta)
        bundle = TokenizerBundle.from_tokenizer(tok, tok_meta["model_max_length"])
    else:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(tok_meta["path"], use_fast=False)
        bundle = TokenizerBundle.from_tokenizer(tok, tok_meta["model_max_length"])
    return cfg, bundle


def load_pretrained_model(
    checkpoint_dir: str, ckpt_num: Optional[int] = None
) -> Tuple[ModelConfig, Dict[str, Any], TokenizerBundle]:
    """Load (cfg, params, tokenizer bundle) for inference."""
    import orbax.checkpoint as ocp

    cfg, bundle = load_model_metadata(checkpoint_dir)
    template = init_llark_params(cfg, jax.random.PRNGKey(0))

    mgr = ocp.CheckpointManager(os.path.abspath(checkpoint_dir))
    step = ckpt_num if ckpt_num is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoints in {checkpoint_dir}")
    # full restore (opt_state discarded): the on-disk tree must be matched
    # exactly, and inference doesn't know the optimizer structure.
    restored = mgr.restore(step)
    mgr.close()
    try:
        params = jax.tree.map(
            lambda t, x: jax.numpy.asarray(x, t.dtype), template, restored["params"]
        )
    except ValueError:
        # the stored tree diverged from a plain init (LoRA factor leaves,
        # int8/int4 quantized {q, scale} dicts): trust its own structure
        # and dtypes — the decoder consumes those leaf forms natively
        params = jax.tree.map(jax.numpy.asarray, restored["params"])
    return cfg, params, bundle
