#!/usr/bin/env bash
# Round-5 serving studies, part 4: where does prefix caching start to pay?
# Round 4 measured header 256 over 380-500-token suffixes (+13% tok/s,
# TTFT p50 -65% at 0.9 QPS, paged); round 5's real-prompt study measured
# header 29 over ~105-token prompts (a wash, dense). This sweep fills the
# gap with the two intermediate header lengths each machinery permits:
#   - paged 128-block pool, header 128 (1 shared block), on/off
#   - dense one-shot,      header 64,                    on/off
# Same suffix distribution (380-500 tokens) and 0.9 QPS Poisson as the
# round-4 strongest point, so the three header lengths form one curve.
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

# paged, header 128 (mirror of r4_prefix_open_{on,off} at header 256)
run r5_hdr128_paged_on.log  --slots 8 --max-cache-len 1024 --paged 128 \
    --prefill-chunk 256 --admit-batch 2 --shared-prefix 128 --prefix-cache 1 \
    --arrival poisson --qps 0.9 --max-new 128
run r5_hdr128_paged_off.log --slots 8 --max-cache-len 1024 --paged 128 \
    --prefill-chunk 256 --admit-batch 2 --shared-prefix 128 --prefix-cache 0 \
    --arrival poisson --qps 0.9 --max-new 128

# the same paged header-128 pair below the knee (0.6 QPS)
run r5_hdr128_paged_on_06.log  --slots 8 --max-cache-len 1024 --paged 128 \
    --prefill-chunk 256 --admit-batch 2 --shared-prefix 128 --prefix-cache 1 \
    --arrival poisson --qps 0.6 --max-new 128
run r5_hdr128_paged_off_06.log --slots 8 --max-cache-len 1024 --paged 128 \
    --prefill-chunk 256 --admit-batch 2 --shared-prefix 128 --prefix-cache 0 \
    --arrival poisson --qps 0.6 --max-new 128

# dense one-shot, header 64 (machinery of the r5 real-prompt study)
run r5_hdr64_dense_on.log  --slots 8 --max-cache-len 1024 --prefill-chunk 0 \
    --shared-prefix 64 --prefix-cache 1 \
    --arrival poisson --qps 0.9 --max-new 128
run r5_hdr64_dense_off.log --slots 8 --max-cache-len 1024 --prefill-chunk 0 \
    --shared-prefix 64 --prefix-cache 0 \
    --arrival poisson --qps 0.9 --max-new 128

echo "=== $(date +%H:%M:%S) r5 serving part 4 done"
