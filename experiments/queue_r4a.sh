#!/usr/bin/env bash
# Round-4 TPU measurement queue: waits for the in-flight bench warm run
# (one chip, one client — TPU jobs stay sequential), then runs the
# measure_r4 decision phases.  Usage: queue_r4a.sh <bench_pid>
set -u
cd "$(dirname "$0")"
pid=${1:?bench pid}
while kill -0 "$pid" 2>/dev/null; do sleep 20; done
echo "[queue] bench warm (pid $pid) finished at $(date -u +%H:%M:%S)"
python measure_r4.py base18 lazy18 base20 lazy20 2>&1
echo "[queue] primary phases done at $(date -u +%H:%M:%S)"
python measure_r4.py ntt24 base22 lazy22 msm24 2>&1
echo "[queue] all phases done at $(date -u +%H:%M:%S)"
