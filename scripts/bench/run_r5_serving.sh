#!/usr/bin/env bash
# Round-5 serving studies, run sequentially on the one attached chip.
# Each study A/Bs a scheduling policy through the SAME compiled programs
# (policies are host-side), so sides after the first ride the compile
# cache. Keep the host otherwise idle: TTFT/TPOT percentiles are
# host-measured and CPU contention corrupts them.
#
#   1. Mixed-length open-loop (HOL-blocking probe): strict FIFO vs
#      --reorder, per-class percentiles. 40/40/20% over 128/512/1024
#      suffix buckets, Poisson arrivals.
#   2. Adaptive decode rounds: one-shot admission baseline vs
#      --decode-drain 4 at 0.3/0.6/0.9 QPS (the low-load TTFT floor).
#   3. Real-prompt traffic: plain vs +prefix-cache vs +ngram on prompts
#      built by the real conversation constructor.
set -uo pipefail
cd "$(dirname "$0")/../.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
LOGS=scripts/bench/logs_r5
mkdir -p "$LOGS"
B=scripts/bench/bench_serving.py

run() {
  local log="$1"; shift
  echo "=== $(date +%H:%M:%S) $log: $*"
  python "$B" "$@" 2>&1 | tee "$LOGS/$log"
}

# --- 1. mixed-length HOL probe (dense, chunked admission, 8 slots) ------
# admit-batch 2: the 1024-bucket admission cache at admit 8 OOMs next to
# the 8x2048 persistent cache (first attempt, r5 16:52) — 2 is the tuned
# chunked-prefill config from the round-4 roofline anyway
MIX="128:0.4,512:0.4,1024:0.2"
run r5_mixed_fifo.log    --slots 8 --max-cache-len 2048 --mixed "$MIX" \
    --arrival poisson --qps 0.6,0.9 --prefill-chunk 256 --max-new 128 \
    --admit-batch 2
run r5_mixed_reorder.log --slots 8 --max-cache-len 2048 --mixed "$MIX" \
    --arrival poisson --qps 0.6,0.9 --prefill-chunk 256 --max-new 128 \
    --admit-batch 2 --reorder 1

# --- 2. decode-drain vs one-shot baseline (single 512 bucket) -----------
run r5_drain_off.log --slots 8 --max-cache-len 1024 --prefill-chunk 0 \
    --arrival poisson --qps 0.3,0.6,0.9 --max-new 128
run r5_drain_4.log   --slots 8 --max-cache-len 1024 --prefill-chunk 0 \
    --arrival poisson --qps 0.3,0.6,0.9 --max-new 128 --decode-drain 4

# --- 3. real-prompt traffic (one-shot admission; short real prompts) ----
run r5_real_plain.log  --real-prompts 1 --prefix-cache 0 --slots 8 \
    --max-cache-len 1024 --prefill-chunk 0 --arrival poisson --qps 0.9 \
    --max-new 128
run r5_real_prefix.log --real-prompts 1 --prefix-cache 1 --slots 8 \
    --max-cache-len 1024 --prefill-chunk 0 --arrival poisson --qps 0.9 \
    --max-new 128
run r5_real_ngram.log  --real-prompts 1 --prefix-cache 0 --spec ngram \
    --slots 8 --max-cache-len 1024 --prefill-chunk 0 --arrival poisson \
    --qps 0.9 --max-new 128

echo "=== $(date +%H:%M:%S) all r5 serving studies done"
