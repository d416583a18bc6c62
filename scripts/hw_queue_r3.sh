#!/bin/bash
# Serial hardware queue for the round-3 tail (single-tenant TPU: never
# run two of these concurrently). Each step logs to /tmp/hwq_*.log and
# keeps going on failure so one flaky step doesn't starve the rest.
#
#   nohup bash scripts/hw_queue_r3.sh > /tmp/hwq.log 2>&1 &
#
# Steps:
#  1. fp16 hybrid real-dims measure (panel 128) — fp32 baseline was
#     985 ms/tile (panel-2 increment, store hot).
#  2. fp16 hybrid with 256-song panels (fits in HBM at half precision;
#     halves the number of panel passes at 15k).
#  3. bench.py (the driver's round-end metric; sanity + headline).
#  4. Placeholder covers80 parity recipe, full 80 cliques (features
#     changed this session -> committed artifact numbers stale).
#  5. Cross-implementation parity sweep (refresh artifacts CSV).
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
run bench python bench.py
STEP_TIMEOUT=7200 run parity_recipe python -c "
import os, subprocess, sys
os.makedirs('/tmp/parity_hw', exist_ok=True)
os.chdir('/tmp/parity_hw')
sys.exit(subprocess.call([sys.executable,
    '/root/repo/scripts/covers80_parity.py', '--make-placeholder']))"
STEP_TIMEOUT=7200 run crossimpl python scripts/crossimpl_parity.py
echo "=== queue done ($(date -u +%H:%M:%S))"
