#!/bin/bash
# Post-bench measurement queue (round 2c).  Waits for the in-flight
# bench.py (PID $1) to exit, then serializes the remaining TPU
# measurements so they never contend with the bench for the relay:
#   1. MXU-REDC mont_mul timing (experiments/mxu_redc.py tpu)
#   2. signed-digit MSM phase timing (experiments/measure_r3.py),
#      resuming the queue the 2026-08-18 relay outage killed.
# Each step is bounded; a dead relay logs an error instead of hanging.
set -u
cd /root/repo
BENCH_PID=${1:-0}
if [ "$BENCH_PID" != "0" ]; then
  while kill -0 "$BENCH_PID" 2>/dev/null; do sleep 20; done
fi
echo "=== queue_r2c start $(date -u +%H:%M:%S) ===" >> experiments/queue_r2c.log
timeout 3600 python experiments/mxu_redc.py tpu 20 \
  >> experiments/queue_r2c.log 2>&1
echo "=== mxu_redc done $(date -u +%H:%M:%S) ===" >> experiments/queue_r2c.log
timeout 3600 python experiments/measure_r3.py 18 13 \
  >> experiments/queue_r2c.log 2>&1
echo "=== measure_r3 done $(date -u +%H:%M:%S) ===" >> experiments/queue_r2c.log
