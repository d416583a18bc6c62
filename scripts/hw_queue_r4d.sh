#!/bin/bash
# Hardware re-measure queue after the matrix-input Pallas binarizer
# (EarlySNF all 4 channels + Serra09 ssms channel now binarize via one
# exact in-VMEM pass; bit-identical CRPs — tests/test_crp_pallas.py and
# the on-chip bit-equality check in RESULTS.md).
#
#   nohup bash scripts/hw_queue_r4d.sh > /tmp/hwq_d.log 2>&1 &
#
# Serialized behind any other queue via flock on /tmp/hwq.lock
# (single-tenant TPU). Direct comparisons:
#  1. int8 hybrid p128 — against r4c's 511.3 ms/tile (exact parity
#     config) and the 447.7 ms/tile fast-SNF point (RESULTS.md).
#  2. covers80-scale earlysnf + serra09_full — MAP must be unchanged
#     on every channel; wall against the r4c re-run table.
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

run d_int8_p128 python scripts/hybrid_dryrun.py --mode measure \
    --songs 256 --panels 2 --int8 --keep
run d_int8_p128_fastsnf python scripts/hybrid_dryrun.py --mode measure \
    --songs 256 --panels 2 --int8 --keep --snf-precision default
STEP_TIMEOUT=5400 run d_snf_algos python scripts/covers80_scale.py \
    earlysnf serra09_full
echo "=== queue done ($(date -u +%H:%M:%S))"
