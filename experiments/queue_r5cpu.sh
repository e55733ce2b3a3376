#!/bin/bash
# Round-5 CPU-side queue: runs after the multichip dryrun releases the
# cores.  test_parallel first (executed sharded-G2 evidence, verdict
# item 6), then one interpret part to prove the split-part mechanism
# lands green on a cold box.
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 10; done
echo "=== test_parallel === $(date -u +%H:%M:%S)"
timeout 2700 python -m pytest tests/test_parallel.py -q \
  > experiments/pytest_parallel_r5b.log 2>&1
echo "rc=$? $(date -u +%H:%M:%S)"
echo "=== test_pallas_interpret part=madd === $(date -u +%H:%M:%S)"
timeout 3000 python -m pytest tests/test_pallas_interpret.py -q -k madd \
  > experiments/pytest_interp_madd_r5.log 2>&1
echo "rc=$? $(date -u +%H:%M:%S)"
echo "=== queue_r5cpu done === $(date -u +%H:%M:%S)"
