#!/bin/bash
# Round-5 TPU measurement queue (serial — one relay client at a time).
# Order: highest verdict-value first; each phase is failure-tolerant.
cd /root/repo
run() {
  echo "=== $* === $(date -u +%H:%M:%S)"
  "$@"
  echo "=== rc=$? === $(date -u +%H:%M:%S)"
}
run python bench.py --only msmfix --budget-s 5000 --log-n 18
run python bench.py --only msm24 --budget-s 9000
run python bench.py --only g2 --budget-s 7000
run python experiments/measure_r4.py ntt24
run python experiments/measure_r4.py lazy22
echo "=== queue_r5b done === $(date -u +%H:%M:%S)"
