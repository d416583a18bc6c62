#!/bin/bash
# Serial hardware queue for round 4 (single-tenant TPU: never run two of
# these concurrently). Each step logs to /tmp/hwq_*.log and keeps going
# on failure so one flaky step doesn't starve the rest.
#
#   nohup bash scripts/hw_queue_r4.sh > /tmp/hwq.log 2>&1 &
#
# Steps (supersedes hw_queue_r3.sh; r3's tail was never executed — the
# tunnel was down through round end):
#  1. fp16 hybrid real-dims measure (panel 128) — now with the 2-deep
#     column prefetch + next-panel upload overlap. fp32 r2 baseline was
#     985 ms/tile (panel-2 increment, store hot).
#  2. fp16 hybrid with 256-song panels (halves panel passes at 15k).
#  3. Panel-prefetch ablation: same fp32 p128 sweep with the overlap
#     disabled, to quantify the hidden upload share.
#  4. bench.py (driver metric; now also records the fully-scored
#     Serra09 tile throughput).
#  5. Placeholder covers80 parity recipe, full 80 cliques (features
#     changed late r3 -> committed artifact numbers stale).
#  6. Cross-implementation parity sweep (refresh artifacts CSV).
set -u
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ($(date -u +%H:%M:%S))"
  timeout "${STEP_TIMEOUT:-3600}" "$@" > "/tmp/hwq_${name}.log" 2>&1
  echo "=== $name exit=$? ($(date -u +%H:%M:%S))"
}

run fp16_p128 python scripts/hybrid_dryrun.py --mode measure --songs 256 \
    --panels 2 --half --keep
run fp16_p256 python scripts/hybrid_dryrun.py --mode measure --songs 256 \
    --panels 1 --panel-songs 256 --half --keep
run fp32_p128_noprefetch python scripts/hybrid_dryrun.py --mode measure \
    --songs 256 --panels 2 --keep --no-panel-prefetch
run fp32_p128_prefetch python scripts/hybrid_dryrun.py --mode measure \
    --songs 256 --panels 2 --keep
run bench python bench.py
STEP_TIMEOUT=7200 run parity_recipe python -c "
import os, subprocess, sys
os.makedirs('/tmp/parity_hw', exist_ok=True)
os.chdir('/tmp/parity_hw')
sys.exit(subprocess.call([sys.executable,
    '/root/repo/scripts/covers80_parity.py', '--make-placeholder']))"
STEP_TIMEOUT=7200 run crossimpl python scripts/crossimpl_parity.py
echo "=== queue done ($(date -u +%H:%M:%S))"
