#!/bin/bash
# Hardware re-measure queue after the bounded-selection fusion change
# (fusion k_static_max: row selections via lax.top_k instead of full
# row sorts — bit-identical outputs, tests/test_fusion_bounded.py).
#
#   nohup bash scripts/hw_queue_r4c.sh > /tmp/hwq_c.log 2>&1 &
#
# Serialized behind any other queue via flock on /tmp/hwq.lock
# (single-tenant TPU). Direct comparisons:
#  1. fp16 hybrid p128 — against r4b's 901.7 ms/tile (pre-change).
#  2. covers80-scale runs of every SNF consumer — against the r4b
#     capstone step's per-algorithm times (pre-change).
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

run c_fp16_p128 python scripts/hybrid_dryrun.py --mode measure \
    --songs 256 --panels 2 --half --keep
# int8 is the compute-bound configuration (b_int8_p128: 724.6 ms/tile
# with upload mostly hidden) — the cleanest view of the fusion win
run c_int8_p128 python scripts/hybrid_dryrun.py --mode measure \
    --songs 256 --panels 2 --int8 --keep
STEP_TIMEOUT=5400 run c_snf_algos python scripts/covers80_scale.py \
    earlysnf earlyfusion chenfusion strucftm2d strucshingles \
    structurelaplacian strucscattering
# serving crash repro (b_serving{,_int8} both died at the 16-song query
# batch extraction with "TPU worker crashed"): discriminate pinned-index
# size vs the 16-batch extraction program itself
run c_serving_q16_small python scripts/serving_latency.py \
    --songs 32 --queries 16 --reps 3
run c_serving_q4 python scripts/serving_latency.py \
    --songs 160 --queries 4 --reps 5
echo "=== queue done ($(date -u +%H:%M:%S))"
