#!/usr/bin/env bash
# Round-3 TPU cache warmer: run the FULL bench metric set once with a
# huge budget so every program lands in .jax_cache_tpu, then once more
# warm to capture steady-state numbers.  Ops code must be FROZEN from
# the moment this starts (any jaxpr change invalidates the minutes-long
# relay compiles — the rule that round 2 broke at commit 6a84674).
set -u
cd "$(dirname "$0")/.."
echo "=== warm pass start $(date -u +%H:%M:%S) ==="
timeout 21000 python bench.py --budget-s 20000 2>experiments/warm_r3.stderr \
  | tee experiments/warm_r3_pass1.json
echo "=== warm pass done $(date -u +%H:%M:%S) ==="
timeout 3600 python bench.py --budget-s 3000 2>>experiments/warm_r3.stderr \
  | tee experiments/warm_r3_pass2.json
echo "=== steady pass done $(date -u +%H:%M:%S) ==="
