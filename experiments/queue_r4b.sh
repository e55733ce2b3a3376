#!/usr/bin/env bash
# Round-4 TPU queue, part 2 (reordered after the base20 result): the
# driver-critical full bench warm under the new lazy default runs BEFORE
# the heavy BASELINE-matrix tail, so a relay outage can't cost the round
# its warm bench programs.  Usage: queue_r4b.sh <measure_pid>
set -u
cd "$(dirname "$0")/.."
pid=${1:?measure pid}
while kill -0 "$pid" 2>/dev/null; do sleep 20; done
echo "[queue-b] primary measurements (pid $pid) finished at $(date -u +%H:%M:%S)"
python bench.py --budget-s 9000 > experiments/bench_warm_r4b.log 2>&1
echo "[queue-b] lazy-default bench warm done rc=$? at $(date -u +%H:%M:%S)"
python experiments/measure_r4.py ntt24 base22 lazy22 msm24 2>&1
echo "[queue-b] matrix tail done at $(date -u +%H:%M:%S)"
