#!/usr/bin/env bash
# Round-5 serving studies, part 5: the mixed-length study on REAL prompts.
# Part 2/3 measured mixed-length HOL behavior on uniform-random token ids;
# this re-runs the FIFO-vs-reorder A/B with multi-turn LLark conversations
# (real constructor, audio + question in turn 1, QA history padding the
# longer classes) so the reordering policy is tested on traffic shaped
# like the workload it ships for. Same server geometry and arrival seeds
# as parts 2/3, so programs are compile-cache hits.
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
COMMON="--slots 8 --max-cache-len 2048 --prefill-chunk 256 --max-new 128
        --admit-batch 2 --arrival poisson --qps 0.6 --real-prompts 1
        --prefix-cache 0 --mixed $MIX"

run r5_realmix_fifo.log    $COMMON
run r5_realmix_reorder.log $COMMON --reorder 1
run r5_realmix_fifo_seed11.log    $COMMON --arrival-seed 11
run r5_realmix_reorder_seed11.log $COMMON --arrival-seed 11 --reorder 1

echo "=== $(date +%H:%M:%S) r5 serving part 5 done"
