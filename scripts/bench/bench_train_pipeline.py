"""Sustained training fed by the REAL input pipeline + MFU reporting.

VERDICT r2 item 1: every prior training number came from a synthetic
in-memory batch (scripts/bench/bench_train_step.py); nothing proved the
production path — native tarloader -> json/npy decode -> tokenize/mask ->
shuffle -> collate -> host->device transfer -> jit step — keeps the chip
busy over hundreds of steps. The reference's equivalent path is HF
Trainer + DataLoader over WebDataset (reference:
m2t/data_modules.py:466-520, m2t/train.py:255-260).

Method
  * `--make-data`: write WDS shards with realistic payloads (240-frame
    4800-d fp32 Jukebox-pooled encodings ≈ 4.6 MB/sample + multi-QA
    json), the shapes the reference trains on (jukebox/main.py:133-173).
  * run N sustained optimizer steps of the EXACT MPT-1B ablation config
    (b4 x seq 2048) pulling batches from `llark_tpu.data.pipeline
    .make_dataset_iterator` (tar parse + tokenize + collate on host
    threads, PrefetchIterator depth 4), `device_put` per batch;
  * the same N steps on ONE in-memory batch = the compute-only baseline
    (identical sync pattern: one device_get per `--sync-every` steps);
  * input-stall fraction = 1 - compute_wall / pipeline_wall. The loop is
    async-dispatch, so any stall means the host pipeline failed to stay
    ahead of an ~800 ms device step.
  * MFU from llark_tpu/train/flops.py (PaLM-appendix accounting over the
    padded [B, 2048] program shape, peak bf16 by device kind).

Run on a TPU host from /root/repo:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench/bench_train_pipeline.py \
      --make-data /tmp/pipebench --steps 200
"""

import argparse
import faulthandler
import json
import os
import signal
import time

# hang diagnosis on long tunnel-backed runs: `kill -USR1 <pid>` dumps all
# thread stacks to stderr without killing the run
faulthandler.register(signal.SIGUSR1, all_threads=True)

import numpy as np

import jax
import jax.numpy as jnp

from llark_tpu.config import DataArguments, ModelConfig, TrainingArguments
from llark_tpu.data.pipeline import make_dataset_iterator
from llark_tpu.models.fusion import init_llark_params
from llark_tpu.tokenization import TokenizerBundle, WordTokenizer
from llark_tpu.train.flops import device_peak_flops, train_flops_per_token
from llark_tpu.train.state import TrainState
from llark_tpu.train.step import make_optimizer, make_train_step

SEQ = 2048  # overridable via --seq (CPU smoke)
BATCH = 4
FRAMES = 240  # Jukebox-pooled frame count at fps=10 (main.py:133-173)
MM = 4800

_WORDS = (
    "the a of and guitar piano drums bass tempo beat key chord melody "
    "rhythm jazz rock classical electronic folk song track music sound "
    "fast slow loud quiet major minor verse chorus bridge intro outro "
    "what which describe genre instrument mood style question answer"
).split()


def make_data(data_dir: str, n_samples: int, shard_size: int, seed: int = 0):
    from llark_tpu.data.webdataset import TarShardWriter

    os.makedirs(data_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    w = TarShardWriter(
        os.path.join(data_dir, "mir-train-%05d.tar"), max_count=shard_size
    )
    for i in range(n_samples):
        n_qa = int(rng.randint(2, 5))
        resp = []
        for _ in range(n_qa):
            q = " ".join(rng.choice(_WORDS, size=rng.randint(5, 12)))
            a = " ".join(rng.choice(_WORDS, size=rng.randint(20, 120)))
            resp.append({"question": q + " ?", "answer": a + " ."})
        w.write({
            "__key__": f"t{i:06d}",
            "json": {"response": resp},
            "audio_encoding.pyd": rng.randn(FRAMES, MM).astype(np.float32),
        })
    w.close()
    return sorted(
        os.path.join(data_dir, f) for f in os.listdir(data_dir) if f.endswith(".tar")
    )


def sync(x):
    return jax.device_get(jnp.sum(x).astype(jnp.float32))


def _make_params(cfg: ModelConfig, qlora: bool):
    params = jax.jit(lambda k: init_llark_params(cfg, k))(jax.random.PRNGKey(0))
    partition = None
    if qlora:
        # int8 frozen base + LoRA adapters: the flagship training config
        # (reference budget: train_llark.sh + bitsandbytes int8/LoRA)
        from llark_tpu.models.lora import init_lora_params
        from llark_tpu.models.quant import quantize_params_int8_incremental
        from llark_tpu.train.step import ParamPartition, trainable_mask

        params = init_lora_params(cfg, jax.random.PRNGKey(1), params)
        params = quantize_params_int8_incremental(cfg, params)
        partition = ParamPartition(params, trainable_mask(params, lora=True))
    return params, partition


def build_step(cfg: ModelConfig, qlora: bool = False, grad_accum: int = 1,
               audio_patch_id: int = 50368):
    args = TrainingArguments(
        learning_rate=5e-5, max_steps=100_000, warmup_ratio=0.03,
        lr_scheduler_type="cosine",
    )
    params, partition = _make_params(cfg, qlora)
    optimizer = make_optimizer(args, params)
    state = jax.jit(lambda p: TrainState.create(p, optimizer, partition))(params)
    step_fn = jax.jit(
        make_train_step(cfg, optimizer, audio_patch_id=audio_patch_id,
                        grad_accum_steps=grad_accum, partition=partition),
        donate_argnums=(0,),
    )
    return state, step_fn, optimizer, partition


def rebuild_state(cfg: ModelConfig, optimizer, qlora: bool = False):
    """Fresh TrainState for the compute-only leg — the caller must have
    dropped the pipeline leg's state first (MPT-1B params+adam are ~7.8 GB
    in bf16; two states OOM a 16 GB chip)."""
    params, partition = _make_params(cfg, qlora)
    return jax.jit(lambda p: TrainState.create(p, optimizer, partition))(params)


def run_loop(state, step_fn, batches, sync_every: int, next_times=None):
    """Dispatch steps as fast as batches arrive; one device sync per
    `sync_every` steps (the tunnel RTT would otherwise dominate)."""
    walls = []
    t0 = time.perf_counter()
    n = 0
    metrics = None
    for batch in batches:
        tn = time.perf_counter()
        dev = {k: jax.device_put(v) for k, v in batch.items() if k != "example_ids"}
        state, metrics = step_fn(state, dev)
        if next_times is not None:
            next_times.append(time.perf_counter() - tn)
        n += 1
        if n % sync_every == 0:
            sync(metrics["loss"])
            now = time.perf_counter()
            walls.append((now - t0) / sync_every)
            print(f"  step {n}: {1e3 * walls[-1]:.0f} ms/step", flush=True)
            t0 = now
    if metrics is not None and n % sync_every:
        sync(metrics["loss"])
    return state, walls, n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default="/tmp/pipebench")
    p.add_argument("--make-data", action="store_true")
    p.add_argument("--n-samples", type=int, default=192)
    p.add_argument("--shard-size", type=int, default=48)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--sync-every", type=int, default=10)
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--prefetch", type=int, default=4)
    p.add_argument("--config", default="mpt1b",
                   choices=["mpt1b", "tiny", "llama7b-qlora"])
    p.add_argument("--seq", type=int, default=None)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--grad-accum", type=int, default=1,
                   help="micro-batch scan inside the jitted step; --batch is "
                        "the GLOBAL batch (llama7b-qlora default: batch 32, "
                        "accum 16 -> micro 2, the budget-of-record shape "
                        "train_llark.sh 4gpu x bs2 x accum4)")
    p.add_argument("--skip-compute-baseline", action="store_true")
    p.add_argument("--remat-policy", default="full", choices=["full", "dots", "dots_narrow"])
    p.add_argument("--no-remat", action="store_true")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    global SEQ, BATCH, FRAMES
    if args.seq:
        SEQ = args.seq
        FRAMES = min(FRAMES, max(8, SEQ // 8))
    if args.batch:
        BATCH = args.batch
    qlora = False
    if args.config == "tiny":
        # CPU smoke: XLA attention (interpret-mode Pallas at seq 2048 is
        # unusably slow off-chip); the TPU run keeps the Pallas kernel
        cfg = ModelConfig.tiny(dtype="float32", mm_hidden_size=MM,
                               use_pallas_attention=False)
        cfg.max_seq_len = SEQ
    elif args.config == "llama7b-qlora":
        # the FLAGSHIP training config through the real pipeline
        # (VERDICT r3 item 3): Llama-2-7b architecture, int8 frozen base,
        # rank-64 LoRA, global batch 32 via in-step grad accumulation
        cfg = ModelConfig(
            arch="llama", vocab_size=32004, hidden_size=4096,
            intermediate_size=11008, num_layers=32, num_heads=32,
            num_kv_heads=32, head_dim=128, max_seq_len=SEQ,
            mm_hidden_size=MM, dtype="bfloat16", param_dtype="bfloat16",
            remat=True, lora_rank=64, lora_alpha=16.0,
        )
        qlora = True
        if not args.batch:
            BATCH = 32
        if args.grad_accum == 1:
            args.grad_accum = 16  # micro-batch 2 (4gpu x bs2 x accum4 parity)
    else:
        # bf16 params/compute: the record-run configuration
        # (scripts/bench/bench_mpt1b.py:144 — fp32 masters are a DP concern)
        cfg = ModelConfig.mpt_1b(param_dtype="bfloat16", dtype="bfloat16")
        cfg.mm_hidden_size = MM
    cfg.remat_policy = args.remat_policy
    if args.no_remat:
        cfg.remat = False

    if args.make_data or not os.path.isdir(args.data_dir):
        t0 = time.perf_counter()
        shards = make_data(args.data_dir, args.n_samples, args.shard_size)
        print(f"wrote {len(shards)} shards ({args.n_samples} samples) "
              f"in {time.perf_counter() - t0:.0f}s", flush=True)

    tok = WordTokenizer(model_max_length=SEQ)
    bundle = TokenizerBundle.from_tokenizer(tok, model_max_length=SEQ)
    # intern the generator vocabulary deterministically
    tok(" ".join(sorted(set(_WORDS))) + " ? .")
    n_shards = len([f for f in os.listdir(args.data_dir) if f.endswith(".tar")])
    data_args = DataArguments(
        train_data_path=os.path.join(
            args.data_dir, "mir-train-{%05d..%05d}.tar" % (0, n_shards - 1)
        ),
        max_audio_frames=FRAMES,
        apply_task_sample_probs=False,
        num_workers=args.num_workers,
    )

    print("building params/optimizer...", flush=True)
    state, step_fn, optimizer, _ = build_step(
        cfg, qlora=qlora, grad_accum=args.grad_accum
    )
    print("params on device; compiling step on first batch...", flush=True)

    # warmup/compile on one pipeline batch
    it = make_dataset_iterator(
        data_args.train_data_path, bundle, data_args, batch_size=BATCH,
        max_seq_len=SEQ, mm_hidden_size=MM, is_train=True, seed=0,
        max_batches=args.steps + 2, prefetch=args.prefetch,
        num_workers=args.num_workers,
    )
    first = next(it)
    dev = {k: jax.device_put(v) for k, v in first.items() if k != "example_ids"}
    state, metrics = step_fn(state, dev)
    sync(metrics["loss"])
    print("compiled; starting sustained run", flush=True)

    next_times = []
    t_start = time.perf_counter()
    state, walls, n_steps = run_loop(
        state, step_fn, it, args.sync_every, next_times
    )
    pipe_wall = time.perf_counter() - t_start

    results = {
        "device": str(jax.devices()[0].device_kind),
        "config": args.config,
        "remat": "off" if args.no_remat else args.remat_policy,
        "batch": BATCH,
        "grad_accum": args.grad_accum,
        "seq": SEQ,
        "steps": n_steps,
        "num_workers": args.num_workers,
        "prefetch": args.prefetch,
        "pipeline_ms_per_step": round(1e3 * pipe_wall / max(n_steps, 1), 1),
        "pipeline_ms_per_step_steady": round(1e3 * float(np.median(walls)), 1),
        "host_fetch_ms_p50": round(1e3 * float(np.median(next_times)), 1),
        "host_fetch_ms_p95": round(1e3 * float(np.percentile(next_times, 95)), 1),
    }

    if not args.skip_compute_baseline:
        # compute-only baseline: same steps, same sync pattern, one batch.
        # Reuse the pipeline leg's COMPILED program (a second build_step
        # would recompile for minutes through the tunnel) and free its
        # state first (two MPT-1B states OOM the chip).
        del state, metrics
        state2 = rebuild_state(cfg, optimizer, qlora=qlora)
        t0 = time.perf_counter()
        state2, walls2, _ = run_loop(
            state2, step_fn, (first for _ in range(n_steps)), args.sync_every
        )
        comp_wall = time.perf_counter() - t0
        results["compute_ms_per_step"] = round(1e3 * comp_wall / max(n_steps, 1), 1)
        results["compute_ms_per_step_steady"] = round(
            1e3 * float(np.median(walls2)), 1
        )
        results["input_stall_frac"] = round(
            max(0.0, 1.0 - comp_wall / pipe_wall), 4
        )

    tok_s = BATCH * SEQ / (pipe_wall / max(n_steps, 1))
    results["tokens_per_s"] = round(tok_s, 1)
    peak = device_peak_flops()
    if peak:
        mfu = train_flops_per_token(cfg, SEQ, frozen_base=qlora) * tok_s / peak
        results["mfu"] = round(mfu, 4)
        results["peak_bf16_tflops"] = round(peak / 1e12, 1)
    print(json.dumps(results, indent=1), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
