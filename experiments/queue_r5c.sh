#!/bin/bash
# Round-5 final TPU queue (fresh box, cold .jax_cache_tpu).
# Serial — one relay client at a time.  Highest verdict-value first:
# msmfix = the fixed-base design-ceiling break (never measured on chip),
# then ntt/quot to warm the driver-bench phases behind the msm phase.
cd /root/repo
run() {
  echo "=== $* === $(date -u +%H:%M:%S)"
  "$@"
  echo "=== rc=$? === $(date -u +%H:%M:%S)"
}
run python bench.py --only msmfix --budget-s 2500 --log-n 18
run python bench.py --only ntt --budget-s 600
run python bench.py --only quot --budget-s 400
run python bench.py --only g2 --budget-s 1200
echo "=== queue_r5c done === $(date -u +%H:%M:%S)"
