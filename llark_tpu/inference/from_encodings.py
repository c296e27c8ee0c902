"""Batch inference over a directory of .npy audio encodings -> CSV.

Parity: scripts/inference/infer_from_encodings.py. Usage:

  python -m llark_tpu.inference.from_encodings \
      --checkpoint-dir ckpt --encodings-dir /path/to/npys \
      --prompt "Describe the audio." --output results.csv
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from llark_tpu import storage

from llark_tpu.infer import batch_infer
from llark_tpu.inference.common import (
    add_generation_args,
    apply_serving_overrides,
    check_serving_args,
    load_generator,
    make_gen_cfg,
    write_results_csv,
)
from llark_tpu.models.utils import load_pretrained_model


def _load_npy(path):
    import io as _io

    with storage.fopen(path, "rb") as f:
        return np.load(_io.BytesIO(f.read()))

def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--ckpt-num", type=int, default=None)
    p.add_argument("--encodings-dir", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--prompt", default="Describe the audio.")
    p.add_argument("--max-samples", type=int, default=None)
    add_generation_args(p)
    p.add_argument("--max-audio-frames", type=int, default=None)
    p.add_argument("--continuous-batching", type=int, default=0, metavar="SLOTS",
                   help="serve through the continuous-batching engine with SLOTS decode slots (0 = one-at-a-time Generator)")
    args = p.parse_args(argv)
    check_serving_args(args)

    cfg, params, bundle = load_pretrained_model(args.checkpoint_dir, args.ckpt_num)
    cfg = apply_serving_overrides(args, cfg)

    files = storage.fs_glob(storage.join(args.encodings_dir, "*.npy"))
    if args.max_samples:
        files = files[: args.max_samples]
    rows = [
        {
            "example_id": os.path.splitext(os.path.basename(f))[0],
            "prompt": args.prompt,
            "audio_encoding": _load_npy(f),
        }
        for f in files
    ]
    if args.continuous_batching:
        from llark_tpu.infer import batch_infer_continuous

        from llark_tpu.inference.common import load_draft

        draft_cfg, draft_params = load_draft(args)
        results = batch_infer_continuous(
            rows, cfg, params, bundle,
            gen_cfg=make_gen_cfg(args),
            max_batch=args.continuous_batching,
            max_cache_len=args.max_cache_len,
            max_audio_frames=args.max_audio_frames or 256,
            prefill_chunk=args.prefill_chunk,
            draft_cfg=draft_cfg,
            draft_params=draft_params,
            gamma=args.gamma,
            spec_rounds=args.spec_rounds,
            prefix_cache=args.prefix_cache,
            spec_mode="ngram" if args.speculative == "ngram" else None,
            allow_divergent_spec=args.allow_divergent_spec,
            kv_block_size=args.kv_block_size,
            kv_pool_blocks=args.kv_pool_blocks,
            admit_batch=args.admit_batch,
            admit_min_fill=args.admit_min_fill,
            admit_max_wait_s=args.admit_max_wait_ms / 1000.0,
            admit_reorder=args.admit_reorder,
            admit_reorder_age_s=args.admit_reorder_age_ms / 1000.0,
            decode_chunk=args.decode_chunk,
            decode_chunk_drain=args.decode_chunk_drain,
            drain_max_active=args.drain_max_active,
        )
    else:
        gen = load_generator(args, bundle, cfg, params)
        results = batch_infer(rows, gen, bundle, max_audio_frames=args.max_audio_frames)
    write_results_csv(args.output, results)
    print(f"wrote {len(results)} rows to {args.output}")


if __name__ == "__main__":
    main()
