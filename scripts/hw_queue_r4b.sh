#!/bin/bash
# Clean re-measure queue: round-4 session overlap (two queues sharing
# the single-tenant TPU) contaminated the fp16/prefetch hybrid numbers
# and bench.py. Re-runs exactly those steps, serially, under a lock.
#
#   nohup bash scripts/hw_queue_r4b.sh > /tmp/hwq_b.log 2>&1 &
#
# flock on /tmp/hwq.lock: a second queue (this script or any other
# launched with the same lock) blocks instead of corrupting the
# measurements. hw_queue_r4.sh predates the lock — make sure it has
# drained before launching this.
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

run b_fp16_p128 python scripts/hybrid_dryrun.py --mode measure \
    --songs 256 --panels 2 --half --keep
run b_fp16_p128_noprefetch python scripts/hybrid_dryrun.py --mode measure \
    --songs 256 --panels 2 --half --keep --no-panel-prefetch
run b_fp16_p256 python scripts/hybrid_dryrun.py --mode measure \
    --songs 256 --panels 1 --panel-songs 256 --half --keep
run b_fp32_p128_prefetch python scripts/hybrid_dryrun.py --mode measure \
    --songs 256 --panels 2 --keep
run b_int8_p128 python scripts/hybrid_dryrun.py --mode measure \
    --songs 256 --panels 2 --int8 --keep
run b_int8_p256 python scripts/hybrid_dryrun.py --mode measure \
    --songs 256 --panels 1 --panel-songs 256 --int8 --keep
run b_bench python bench.py
run b_serving python scripts/serving_latency.py
run b_serving_int8 python scripts/serving_latency.py --quant int8
STEP_TIMEOUT=5400 run b_capstone python scripts/covers80_scale.py \
    ftm2d strucshingles serra09 simple chenfusion strucftm2d tgalg \
    anfscattering serra09_full structurelaplacian earlyfusion earlysnf \
    strucscattering
echo "=== queue done ($(date -u +%H:%M:%S))"
