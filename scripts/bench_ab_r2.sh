#!/bin/bash
# Same-session A/B: HEAD bench vs the round-2 kernel state (commit
# 323f877, extracted to /tmp/r2repo with `git archive`), to classify the
# BENCH_r02 307.3k -> BENCH_r04 281.9k pairs/s delta as tunnel-session
# variance or a kernel regression (VERDICT r4 weak #1). Two interleaved
# rounds each so a mid-session drift can't masquerade as a difference.
#
#   bash scripts/bench_ab_r2.sh 2>&1 | tee /tmp/bench_ab.log
set -u
cd "$(dirname "$0")/.."
exec 9>/tmp/hwq.lock
flock 9

for round in 1 2; do
  echo "=== A/B round $round: HEAD ($(date -u +%H:%M:%S))"
  timeout 1800 python bench.py 2>/dev/null
  echo "=== A/B round $round: r2/323f877 ($(date -u +%H:%M:%S))"
  (cd /tmp/r2repo && timeout 1800 python bench.py 2>/dev/null)
done
echo "=== A/B done ($(date -u +%H:%M:%S))"
