#!/usr/bin/env bash
# Round-5 serving studies, part 2 (after the first pass fixed two
# configs): the mixed-length HOL probe at admit-batch 2 (admit 8's
# 1024-bucket admission cache OOMed next to the 8x2048 persistent
# cache), a drain re-run to confirm or clear the one-off 40s stall in
# the first 0.6-QPS drain point, and the real-prompt n-gram leg with
# the bf16 divergence opt-in the bench now sets itself.
set -uo pipefail
cd "$(dirname "$0")/../.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
LOGS=scripts/bench/logs_r5
B=scripts/bench/bench_serving.py

run() {
  local log="$1"; shift
  echo "=== $(date +%H:%M:%S) $log: $*"
  python "$B" "$@" 2>&1 | tee "$LOGS/$log"
}

MIX="128:0.4,512:0.4,1024:0.2"
run r5_mixed_fifo.log    --slots 8 --max-cache-len 2048 --mixed "$MIX" \
    --arrival poisson --qps 0.6,0.9 --prefill-chunk 256 --max-new 128 \
    --admit-batch 2
run r5_mixed_reorder.log --slots 8 --max-cache-len 2048 --mixed "$MIX" \
    --arrival poisson --qps 0.6,0.9 --prefill-chunk 256 --max-new 128 \
    --admit-batch 2 --reorder 1

run r5_drain_4b.log --slots 8 --max-cache-len 1024 --prefill-chunk 0 \
    --arrival poisson --qps 0.3,0.6,0.9 --max-new 128 --decode-drain 4

run r5_real_ngram.log --real-prompts 1 --prefix-cache 0 --spec ngram \
    --slots 8 --max-cache-len 1024 --prefill-chunk 0 --arrival poisson \
    --qps 0.9 --max-new 128

echo "=== $(date +%H:%M:%S) r5 serving part 2 done"
