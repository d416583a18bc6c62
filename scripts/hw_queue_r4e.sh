#!/bin/bash
# Hardware re-measure queue after the get_S Pallas selection + the
# vmap-safe knn_mask fix (the r4d covers80-scale step crashed on the
# Mosaic lowering of the vmapped kernel — fixed + chip-validated).
#
#   nohup bash scripts/hw_queue_r4e.sh > /tmp/hwq_e.log 2>&1 &
#
# Serialized behind any other queue via flock on /tmp/hwq.lock.
# Direct comparisons (hybrid_dryrun now also prints a last-panel WARM
# ms/tile, the honest 15k basis):
#  1. int8 p128 parity — against r4d's 445.0 ms/tile total
#     (warm last panel was 214.5 ms/tile pre-get_S-pallas).
#  2. int8 p128 fast-SNF — against r4d's warm 201.5 ms/tile.
#  3. covers80-scale earlysnf + serra09_full — MAP must be unchanged
#     on every channel (validates binarizer + get_S mask on chip).
set -u
cd "$(dirname "$0")/.."

exec 9>/tmp/hwq.lock
flock 9

run() {
  name=$1; shift
  echo "=== $name: $* ($(date -u +%H:%M:%S))"
  timeout "${STEP_TIMEOUT:-3600}" "$@" > "/tmp/hwq_${name}.log" 2>&1
  echo "=== $name exit=$? ($(date -u +%H:%M:%S))"
}

run e_int8_p128 python scripts/hybrid_dryrun.py --mode measure \
    --songs 256 --panels 2 --int8 --keep
run e_int8_p128_fastsnf python scripts/hybrid_dryrun.py --mode measure \
    --songs 256 --panels 2 --int8 --keep --snf-precision default
STEP_TIMEOUT=5400 run e_snf_algos python scripts/covers80_scale.py \
    earlysnf serra09_full
echo "=== queue done ($(date -u +%H:%M:%S))"
