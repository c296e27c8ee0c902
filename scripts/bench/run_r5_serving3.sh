#!/usr/bin/env bash
# Round-5 serving studies, part 3: complete the drain curve with the
# gentler chunk (8), re-run the real-prompt n-gram leg with acceptance
# reporting, and re-check the mixed-bucket 0.6-QPS conclusion under a
# different Poisson arrival seed (guards against one lucky draw).
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

run r5_drain_8.log --slots 8 --max-cache-len 1024 --prefill-chunk 0 \
    --arrival poisson --qps 0.3,0.6,0.9 --max-new 128 --decode-drain 8

run r5_real_ngram_acc.log --real-prompts 1 --prefix-cache 0 --spec ngram \
    --slots 8 --max-cache-len 1024 --prefill-chunk 0 --arrival poisson \
    --qps 0.9 --max-new 128

MIX="128:0.4,512:0.4,1024:0.2"
run r5_mixed_fifo_seed11.log    --slots 8 --max-cache-len 2048 \
    --mixed "$MIX" --arrival poisson --qps 0.6 --prefill-chunk 256 \
    --max-new 128 --admit-batch 2 --arrival-seed 11
run r5_mixed_reorder_seed11.log --slots 8 --max-cache-len 2048 \
    --mixed "$MIX" --arrival poisson --qps 0.6 --prefill-chunk 256 \
    --max-new 128 --admit-batch 2 --arrival-seed 11 --reorder 1

echo "=== $(date +%H:%M:%S) r5 serving part 3 done"
