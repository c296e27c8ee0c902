"""End-to-end speculative-decoding proof: train a target, distill a draft,
measure acceptance and tok/s on the real chip.

VERDICT r1 asked for a *measured* speculative win (the machinery was
token-exactness-tested only). Setup, all on one chip:

  1. target: a ~0.8 B-param Llama-arch decoder (16L x 2048) trained on a
     seeded order-2 Markov corpus (512-token vocab, 85 %-deterministic
     transitions) until it predicts the chain;
  2. draft: a ~4 M-param decoder (4L x 256) distilled from the target's
     logits (teacher-forced KL on corpus batches) — the classic
     target/draft pair, sized ~200x apart like 7B/33M production pairs;
  3. measure single-stream greedy decode tok/s: plain chunked decode vs
     SpeculativeGenerator with the model draft and with n-gram prompt
     lookup, at gamma in {4, 8}, plus measured acceptance rates.

Decode at this size is HBM-bandwidth-bound (1.6 GB of bf16 weights per
emitted token), so acceptance converts directly into tok/s — the same
economics as a 7B target; a 7B pair only shifts the constant.

Run: python scripts/bench/bench_speculative.py [--steps N] [--out r.json]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from llark_tpu.config import ModelConfig
from llark_tpu.generate import GenerationConfig, Generator
from llark_tpu.inference.speculative import SpeculativeGenerator
from llark_tpu.models import decoder as decoder_lib
from llark_tpu.models.fusion import init_llark_params

VOCAB = 512
SEQ = 256


def make_chain(rng: np.random.RandomState):
    """Order-2 Markov chain: each (prev2, prev1) context has one dominant
    successor (p=0.85) and 3 alternates (p=0.05 each), keyed by hash so the
    table needs no [V, V] materialization."""

    mix = rng.randint(1, 2**31, size=4)

    def succ(a, b):
        h = (a * mix[0] + b * mix[1]) % (2**31)
        return (h * mix[2] + mix[3]) % VOCAB

    def alts(a, b, j):
        h = (a * mix[1] + b * mix[3] + (j + 1) * mix[0]) % (2**31)
        return (h * mix[2] + mix[1]) % VOCAB

    def sample_batch(rs: np.random.RandomState, batch: int, length: int):
        seqs = np.zeros((batch, length), np.int64)
        seqs[:, 0] = rs.randint(VOCAB, size=batch)
        seqs[:, 1] = rs.randint(VOCAB, size=batch)
        for t in range(2, length):
            a, b = seqs[:, t - 2], seqs[:, t - 1]
            u = rs.uniform(size=batch)
            dom = succ(a, b)
            out = dom.copy()
            for j in range(3):
                lo, hi = 0.85 + 0.05 * j, 0.85 + 0.05 * (j + 1)
                sel = (u >= lo) & (u < hi)
                out[sel] = alts(a[sel], b[sel], j)
            seqs[:, t] = out
        return seqs.astype(np.int32)

    return sample_batch


def make_train_step(cfg: ModelConfig, tx, distill_cfg=None):
    """Next-token CE train step; with distill_cfg, the labels are the
    TEACHER's logits (params arg gains a (student, teacher) structure)."""

    def loss_fn(params, batch, teacher_params):
        inputs, targets = batch[:, :-1], batch[:, 1:]
        lens = jnp.full((inputs.shape[0],), inputs.shape[1], jnp.int32)
        logits, _ = decoder_lib.decoder_forward(
            cfg, params, input_ids=inputs, seq_lengths=lens
        )
        logits = logits.astype(jnp.float32)
        if distill_cfg is not None:
            t_logits, _ = decoder_lib.decoder_forward(
                distill_cfg, teacher_params, input_ids=inputs, seq_lengths=lens
            )
            t_prob = jax.nn.softmax(t_logits.astype(jnp.float32), axis=-1)
            return -(t_prob * jax.nn.log_softmax(logits, axis=-1)).sum(-1).mean()
        lp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(lp, targets[..., None], axis=-1).mean()

    @jax.jit
    def step(params, opt_state, batch, teacher_params):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, teacher_params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


def train_lm(cfg, steps, sampler, seed, lr=3e-4, batch=16,
             teacher=None, teacher_cfg=None, label="target"):
    params = jax.jit(lambda k: init_llark_params(cfg, k))(jax.random.PRNGKey(seed))
    tx = optax.adamw(optax.cosine_decay_schedule(lr, steps), weight_decay=0.01)
    opt_state = jax.jit(tx.init)(params)
    step = make_train_step(cfg, tx, distill_cfg=teacher_cfg)
    rs = np.random.RandomState(seed + 1)
    t0 = time.time()
    for i in range(steps):
        data = sampler(rs, batch, SEQ + 1)
        params, opt_state, loss = step(params, opt_state, jnp.asarray(data), teacher)
        if i % 50 == 0 or i == steps - 1:
            print(f"  {label} step {i}: loss {float(loss):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    return params, float(loss)


def bench_decode(gen, prompts, plens, max_new, label, reps=3):
    gen.gen_cfg = GenerationConfig(
        max_new_tokens=max_new, temperature=0.0, stop_text="", eos_token_id=None,
        decode_chunk=getattr(gen.gen_cfg, "decode_chunk", 16),
    )
    out = gen.generate(prompts, plens)  # compile + warm
    best = np.inf
    for _ in range(reps):
        t0 = time.time()
        out = gen.generate(prompts, plens)
        best = min(best, time.time() - t0)
    n_tok = sum(len(o) for o in out)
    tps = n_tok / best
    acc = getattr(gen, "last_acceptance_rate", None)
    print(f"  {label}: {tps:.1f} tok/s ({n_tok} tok in {best:.2f}s)"
          + (f", acceptance {acc:.3f}" if acc is not None else ""), flush=True)
    return {"tok_s": round(tps, 1), "acceptance": None if acc is None else round(acc, 3)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target-steps", type=int, default=400)
    ap.add_argument("--draft-steps", type=int, default=600)
    ap.add_argument("--max-new", type=int, default=256)
    ap.add_argument("--out", default=None)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny configs + few steps: CPU plumbing check only")
    ap.add_argument("--serve", action="store_true",
                    help="also benchmark BatchedServer speculative serving")
    ap.add_argument("--skip-singlestream", action="store_true")
    args = ap.parse_args()

    if args.smoke:
        args.target_steps = min(args.target_steps, 30)
        args.draft_steps = min(args.draft_steps, 30)
        args.max_new = min(args.max_new, 48)
        target_cfg = ModelConfig(
            vocab_size=VOCAB, hidden_size=128, intermediate_size=352,
            num_layers=2, num_heads=4, num_kv_heads=4, max_seq_len=1024,
            mm_hidden_size=64, remat=False, use_pallas_attention=False,
        )
        draft_cfg = ModelConfig(
            vocab_size=VOCAB, hidden_size=64, intermediate_size=176,
            num_layers=1, num_heads=2, num_kv_heads=2, max_seq_len=1024,
            mm_hidden_size=64, remat=False, use_pallas_attention=False,
        )
    else:
        target_cfg = ModelConfig(
            vocab_size=VOCAB, hidden_size=2048, intermediate_size=5632,
            num_layers=16, num_heads=16, num_kv_heads=16, max_seq_len=1024,
            mm_hidden_size=64, param_dtype="bfloat16", dtype="bfloat16", remat=True,
        )
        draft_cfg = ModelConfig(
            vocab_size=VOCAB, hidden_size=256, intermediate_size=704,
            num_layers=4, num_heads=4, num_kv_heads=4, max_seq_len=1024,
            mm_hidden_size=64, param_dtype="bfloat16", dtype="bfloat16", remat=False,
        )
    n_params = lambda p: sum(x.size for x in jax.tree.leaves(p))  # noqa: E731

    sampler = make_chain(np.random.RandomState(1234))
    print("training target...", flush=True)
    tparams, tloss = train_lm(target_cfg, args.target_steps, sampler, seed=0)
    print(f"target params: {n_params(tparams)/1e6:.0f}M, final loss {tloss:.3f}")

    print("distilling draft from target logits...", flush=True)
    dparams, dloss = train_lm(
        draft_cfg, args.draft_steps, sampler, seed=7, lr=1e-3, batch=32,
        teacher=tparams, teacher_cfg=target_cfg, label="draft",
    )
    print(f"draft params: {n_params(dparams)/1e6:.1f}M, final KL-loss {dloss:.3f}")

    # held-out prompts from the same chain
    rs = np.random.RandomState(999)
    prompts = sampler(rs, 1, 64)
    plens = np.array([64], np.int32)

    results = {"target_loss": round(tloss, 3), "draft_loss": round(dloss, 3),
               "target_params_m": round(n_params(tparams) / 1e6),
               "draft_params_m": round(n_params(dparams) / 1e6, 1)}
    if not args.skip_singlestream:
        print("benchmarking single-stream greedy decode...", flush=True)
        plain = Generator(target_cfg, tparams, audio_patch_id=VOCAB - 1,
                          gen_cfg=GenerationConfig(decode_chunk=16),
                          max_cache_len=1024)
        results["plain"] = bench_decode(plain, prompts, plens, args.max_new, "plain chunked")

        for gamma, fused in ((4, 4), (8, 4), (8, 0)):
            spec = SpeculativeGenerator(
                target_cfg, tparams, audio_patch_id=VOCAB - 1,
                draft_cfg=draft_cfg, draft_params=dparams, gamma=gamma,
                max_cache_len=1024, fused_rounds=fused,
                allow_divergent=True,  # throughput bench; bf16 divergence
            )
            tag = f"draft_g{gamma}" + ("_fused" if fused else "_hostloop")
            results[tag] = bench_decode(
                spec, prompts, plens, args.max_new,
                f"draft gamma={gamma} {'fused' if fused else 'host-loop'}")

        ng = SpeculativeGenerator(
            target_cfg, tparams, audio_patch_id=VOCAB - 1, gamma=4,
            max_cache_len=1024, allow_divergent=True,
        )
        results["ngram_g4"] = bench_decode(ng, prompts, plens, args.max_new, "ngram spec gamma=4")

        best = max(
            (k for k in results if isinstance(results[k], dict) and k != "plain"),
            key=lambda k: results[k]["tok_s"],
        )
        results["best_speedup"] = round(
            results[best]["tok_s"] / results["plain"]["tok_s"], 2
        )

    if args.serve:
        import dataclasses as dc
        import time as _time

        from llark_tpu.inference.server import BatchedServer, Request

        print("benchmarking speculative SERVING (4 slots, 12 requests)...",
              flush=True)
        serve_ids = sampler(np.random.RandomState(555), 12, 64)
        max_new = min(args.max_new, 128)

        def run_serve(with_draft):
            kw = {}
            if with_draft:
                kw = dict(draft_cfg=draft_cfg, draft_params=dparams,
                          gamma=8, spec_rounds=4,
                          allow_divergent_spec=True)
            srv = BatchedServer(
                target_cfg, tparams, audio_patch_id=VOCAB - 1,
                gen_cfg=GenerationConfig(max_new_tokens=max_new,
                                         temperature=0.0, stop_text=""),
                max_batch=4, max_cache_len=1024, prompt_buckets=(64,),
                max_audio_frames=1, decode_chunk=16, **kw,
            )
            warm = [Request(np.asarray(serve_ids[0], np.int32))]
            srv.gen_cfg = dc.replace(srv.gen_cfg, max_new_tokens=17)
            srv.serve(warm)
            srv.gen_cfg = dc.replace(srv.gen_cfg, max_new_tokens=max_new)
            reqs = [Request(np.asarray(serve_ids[i], np.int32))
                    for i in range(len(serve_ids))]
            t0 = _time.time()
            out = srv.serve(reqs)
            st = srv.stats(out)
            st["wall_s"] = round(_time.time() - t0, 1)
            return st, [r.tokens for r in out]

        st_plain, toks_plain = run_serve(False)
        print(f"serve plain: {st_plain}", flush=True)
        st_spec, toks_spec = run_serve(True)
        print(f"serve speculative: {st_spec}", flush=True)
        match = np.mean([
            a == b for a, b in zip(toks_plain, toks_spec)
        ])
        results["serve_plain_tok_s"] = round(st_plain["tokens_per_sec"], 1)
        results["serve_spec_tok_s"] = round(st_spec["tokens_per_sec"], 1)
        results["serve_speedup"] = round(
            st_spec["tokens_per_sec"] / st_plain["tokens_per_sec"], 2)
        # bf16 matmul rounding differs between the decode and fused-verify
        # program shapes, so near-tie argmaxes can flip -- report the
        # match fraction rather than asserting exact equality on chip
        results["serve_token_match"] = round(float(match), 3)
    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
