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


def add_generation_args(p) -> None:
    """Generation flags shared by the batch-inference CLIs."""
    p.add_argument("--max-new-tokens", type=int, default=256)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--top-p", type=float, default=1.0)
    p.add_argument("--top-k", type=int, default=0)
    p.add_argument("--max-cache-len", type=int, default=2048)
    p.add_argument(
        "--speculative",
        choices=("off", "ngram", "draft"),
        default="off",
        help="speculative decoding: 'ngram' = prompt-lookup drafting (no extra "
        "weights), 'draft' = a small draft checkpoint (--draft-checkpoint-dir)",
    )
    p.add_argument("--gamma", type=int, default=4,
                   help="speculative draft length per verify round")
    p.add_argument("--allow-divergent-spec", action="store_true",
                   help="permit --speculative below fp32: bf16 matmuls round "
                        "differently between the verify and decode graph "
                        "shapes, so speculative output can differ from plain "
                        "greedy decode (measured on chip: 24/24 streams "
                        "diverged). Without this flag, sub-fp32 speculation "
                        "is refused")
    p.add_argument("--spec-rounds", type=int, default=2,
                   help="with --continuous-batching + --speculative draft: "
                        "fused propose/verify rounds per decode dispatch")
    p.add_argument("--prefix-cache", action="store_true",
                   help="with --continuous-batching: prefill the KV of the "
                        "longest common token prefix of all prompts ONCE "
                        "(every LLark prompt opens with the same "
                        "conversation header); admission computes only "
                        "each request's suffix")
    p.add_argument("--prefill-chunk", type=int, default=None,
                   help="with --continuous-batching: admit prompts in chunks "
                        "of this many tokens, interleaving decode rounds so "
                        "live slots keep emitting during long prefills")
    p.add_argument("--kv-cache-int8", action="store_true",
                   help="store the KV cache as int8 with per-position scales "
                        "(half the cache memory -> 2x slots/context)")
    p.add_argument("--kv-block-size", type=int, default=None,
                   help="with --continuous-batching: paged KV — the cache "
                        "becomes a physical block pool of this block size "
                        "with per-slot block tables; HBM scales with the "
                        "live-token budget instead of slots x max-cache-len")
    p.add_argument("--kv-pool-blocks", type=int, default=None,
                   help="physical pool size for --kv-block-size, including "
                        "one parking block per slot (default: dense-"
                        "equivalent capacity)")
    p.add_argument("--admit-batch", type=int, default=None,
                   help="with --continuous-batching: admission prefill rows "
                        "per dispatch (default: all slots). The transient-"
                        "HBM knob — the bucket-sized admission cache "
                        "coexists with weights + the persistent cache, so "
                        "high slot counts need a smaller admission batch")
    p.add_argument("--admit-min-fill", type=int, default=1,
                   help="with --continuous-batching: admission hysteresis — "
                        "hold queued requests until this many are waiting "
                        "(or --admit-max-wait-ms passes, or no slot is "
                        "decoding) so trickling arrivals coalesce into one "
                        "padded prefill wave instead of one wave each")
    p.add_argument("--decode-chunk", type=int, default=8,
                   help="with --continuous-batching: tokens decoded per "
                        "dispatch for all live slots (one compiled "
                        "multi-step program; fewer host syncs at larger "
                        "values, coarser retirement granularity)")
    p.add_argument("--decode-chunk-drain", type=int, default=None,
                   help="with --continuous-batching: SHORTER decode chunk "
                        "used while requests are queued and a slot is "
                        "free — the in-flight decode round is the "
                        "unpreemptible TTFT floor, so draining in short "
                        "rounds admits arrivals sooner at the cost of "
                        "extra dispatch syncs. Fires only at low occupancy "
                        "(see --drain-max-active)")
    p.add_argument("--drain-max-active", type=int, default=None,
                   help="with --decode-chunk-drain: drain rounds fire only "
                        "while at most this many slots are live (default: "
                        "half of --continuous-batching). Bounds the drain "
                        "trigger away from saturation, where its own "
                        "dispatch cost is bistable")
    p.add_argument("--admit-reorder", action="store_true",
                   help="with --continuous-batching: bounded admission "
                        "reordering for mixed-length traffic — the largest "
                        "queued same-bucket group wins each admission wave "
                        "instead of strict FIFO, removing head-of-line "
                        "blocking behind long-bucket heads; bounded by "
                        "--admit-reorder-age-ms (an aged head forces its "
                        "own bucket, so nothing starves)")
    p.add_argument("--admit-reorder-age-ms", type=float, default=500.0,
                   help="anti-starvation bound for --admit-reorder")
    p.add_argument("--admit-max-wait-ms", type=float, default=50.0,
                   help="hysteresis deadline for --admit-min-fill: admit "
                        "anyway once the oldest queued request has waited "
                        "this long")
    p.add_argument("--num-beams", type=int, default=1,
                   help="beam search width (1 = greedy/sampling; the HF "
                        "generate num_beams counterpart)")
    p.add_argument("--draft-checkpoint-dir", default=None)
    p.add_argument("--draft-ckpt-num", type=int, default=None)


def apply_serving_overrides(args, cfg):
    """Apply serving-only config overrides from CLI flags."""
    if getattr(args, "kv_cache_int8", False):
        import dataclasses

        cfg = dataclasses.replace(cfg, kv_cache_quant=True)
    return cfg


def make_gen_cfg(args):
    """One GenerationConfig from the shared flags — used by both the
    one-at-a-time and the continuous-batching serving paths so sampling
    flags behave identically."""
    from llark_tpu.generate import GenerationConfig

    return GenerationConfig(
        max_new_tokens=args.max_new_tokens,
        temperature=args.temperature,
        top_p=getattr(args, "top_p", 1.0),
        top_k=getattr(args, "top_k", 0),
        stop_text="###",
    )


def check_serving_args(args) -> None:
    """Reject flag combinations that would otherwise be silently ignored."""
    if getattr(args, "continuous_batching", 0):
        spec = getattr(args, "speculative", "off")
        if spec == "draft" and not getattr(args, "draft_checkpoint_dir", None):
            raise SystemExit("--speculative draft requires --draft-checkpoint-dir")
        if getattr(args, "kv_block_size", None):
            if getattr(args, "prefix_cache", False) and not getattr(
                args, "prefill_chunk", None
            ):
                raise SystemExit(
                    "--prefix-cache with --kv-block-size (paged KV) rides "
                    "the direct-to-pool chunked admission path: also pass "
                    "--prefill-chunk (a bucket-sized chunk gives one-shot "
                    "admission behavior)"
                )
        elif getattr(args, "prefix_cache", False) and getattr(
            args, "prefill_chunk", None
        ):
            # dense mode: the server refuses this pairing in __init__ (the
            # suffix IS the short part) — catch it at flag validation so
            # the CLI exits cleanly instead of with a raw traceback
            # (ADVICE r4 #3)
            raise SystemExit(
                "--prefix-cache and --prefill-chunk are mutually exclusive "
                "without --kv-block-size (dense prefix caching already "
                "prefills only the short per-request suffix); drop one or "
                "add --kv-block-size for the paged direct-to-pool path"
            )
    elif getattr(args, "kv_block_size", None):
        raise SystemExit("--kv-block-size requires --continuous-batching")
    pfc = getattr(args, "prefill_chunk", None)
    if pfc is not None:
        if not getattr(args, "continuous_batching", 0):
            raise SystemExit("--prefill-chunk requires --continuous-batching")
        if pfc < 1:
            raise SystemExit("--prefill-chunk must be >= 1")
    ab = getattr(args, "admit_batch", None)
    if ab is not None:
        if not getattr(args, "continuous_batching", 0):
            raise SystemExit("--admit-batch requires --continuous-batching")
        if ab < 1:
            raise SystemExit("--admit-batch must be >= 1")
    if getattr(args, "num_beams", 1) > 1:
        if getattr(args, "continuous_batching", 0):
            raise SystemExit("--num-beams is not supported with --continuous-batching")
        if getattr(args, "speculative", "off") != "off":
            raise SystemExit("--num-beams is not supported with --speculative")
        if getattr(args, "temperature", 0.0) > 0.0:
            raise SystemExit("--num-beams performs deterministic beam search; "
                             "drop --temperature")


def load_generator(args, bundle, cfg, params):
    from llark_tpu.generate import Generator

    gen_cfg = make_gen_cfg(args)
    if getattr(args, "num_beams", 1) > 1:
        from llark_tpu.inference.beam import BeamSearchConfig, BeamSearcher

        return BeamSearcher(
            cfg,
            params,
            audio_patch_id=bundle.audio_patch_id,
            beam_cfg=BeamSearchConfig(
                num_beams=args.num_beams,
                max_new_tokens=args.max_new_tokens,
                stop_text="###",
            ),
            max_cache_len=args.max_cache_len,
        )
    speculative = getattr(args, "speculative", "off")
    if speculative != "off":
        from llark_tpu.inference.speculative import SpeculativeGenerator

        draft_cfg = draft_params = None
        if speculative == "draft":
            if not args.draft_checkpoint_dir:
                raise SystemExit("--speculative draft requires --draft-checkpoint-dir")
            from llark_tpu.models.utils import load_pretrained_model

            draft_cfg, draft_params, _ = load_pretrained_model(
                args.draft_checkpoint_dir, args.draft_ckpt_num
            )
        return SpeculativeGenerator(
            cfg,
            params,
            audio_patch_id=bundle.audio_patch_id,
            gen_cfg=gen_cfg,
            max_cache_len=args.max_cache_len,
            draft_cfg=draft_cfg,
            draft_params=draft_params,
            gamma=args.gamma,
            allow_divergent=getattr(args, "allow_divergent_spec", False),
        )
    return Generator(
        cfg,
        params,
        audio_patch_id=bundle.audio_patch_id,
        gen_cfg=gen_cfg,
        max_cache_len=args.max_cache_len,
    )


def load_draft(args):
    """(draft_cfg, draft_params) for --speculative draft, else (None, None)."""
    if getattr(args, "speculative", "off") != "draft":
        return None, None
    if not getattr(args, "draft_checkpoint_dir", None):
        raise SystemExit("--speculative draft requires --draft-checkpoint-dir")
    from llark_tpu.models.utils import load_pretrained_model

    draft_cfg, draft_params, _ = load_pretrained_model(
        args.draft_checkpoint_dir, getattr(args, "draft_ckpt_num", None)
    )
    return draft_cfg, draft_params
