#!/bin/bash
# Round-5 hardware queue (serialized behind any other TPU work via the
# flock). Runs AFTER the 15k Da-TACOS sweep:
#  1. Serra09 tile decomposition + fused-binarizer dual-layout A/B
#  2. EarlySNF tile decomposition re-measure (post get_S-Pallas state)
#  3. serving latency record (build + cold/warm 1-song + q16 batch)
#  4. placeholder corpus v2 full regen (timbre+structure channels)
#  5. final bench.py (median-of-7 + spread)
#
#   nohup bash scripts/hw_queue_r5.sh > /tmp/hwq_r5_driver.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
exec 9>/tmp/hwq.lock
flock 9

run() {
  name=$1; shift
  echo "=== $name: $* ($(date -u +%H:%M:%S))"
  timeout "${STEP_TIMEOUT:-3600}" "$@" > "/tmp/hwq_r5_${name}.log" 2>&1
  echo "=== $name exit=$? ($(date -u +%H:%M:%S))"
}

run serra_profile python scripts/serra_tile_profile.py --reps 3
STEP_TIMEOUT=7200 run crossimpl python scripts/crossimpl_parity.py \
    --out artifacts/crossimpl_parity.csv
run esnf_profile python scripts/esnf_tile_profile.py
run serving python scripts/serving_latency.py
rm -f artifacts/results_covers80_placeholder.csv   # regen, not append
STEP_TIMEOUT=9000 run placeholder_v2 python scripts/covers80_parity.py \
    --audio-dir /tmp/pcv2full/covers32k --make-placeholder \
    --features /tmp/pcv2full/feats.npz \
    --csv artifacts/results_covers80_placeholder.csv
run dmax_probe python scripts/dmax_conv_probe.py
run bench python bench.py
echo "=== r5 queue done ($(date -u +%H:%M:%S))"
