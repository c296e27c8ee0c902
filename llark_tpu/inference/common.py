"""Shared CLI plumbing for batch inference scripts."""

from __future__ import annotations

import csv
import os
from typing import Dict, List, Optional, Sequence


def write_results_csv(path: str, rows: Sequence[Dict]) -> None:
    """CSV contract matching the reference's eval substrate
    (reference: scripts/inference/infer_from_webdataset.py:150-151)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fields = ["example_id", "prompt", "response", "model_completion"]
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        for r in rows:
            w.writerow({k: r.get(k, "") for k in fields})


def load_generator(args, bundle, cfg, params):
    from llark_tpu.generate import GenerationConfig, Generator

    return Generator(
        cfg,
        params,
        audio_patch_id=bundle.audio_patch_id,
        gen_cfg=GenerationConfig(
            max_new_tokens=args.max_new_tokens,
            temperature=args.temperature,
            stop_text="###",
        ),
        max_cache_len=args.max_cache_len,
    )
