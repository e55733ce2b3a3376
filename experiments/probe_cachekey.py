"""Persistent-cache-key determinism probe for the 2^18 MSM (no compile).

Round-4 observed the bit-identical MSM call recompiling into a DIFFERENT
176 MB cache entry after a relay-session change.  This traces+lowers the
MSM client-side and prints the cache key exactly as compilation_cache
computes it.  Run it in different processes / relay sessions and diff:
  - same key         -> client-side key is stable; the recompiles must be
                        load failures (relay-side executable deserialize),
  - different key    -> something session-dependent leaks into the module
                        or compile options; print both and bisect.

Usage: python experiments/probe_cachekey.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")

from ultragroth_tpu.ops import msm as dmsm
from jax._src import cache_key, compiler, xla_bridge
import hashlib

rng = np.random.default_rng(7)
n = 1 << 18
x = rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32)
y = rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32)
inf = np.zeros(n, bool)
sc = rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32)
sc[15] &= 0x2FFF

lowered = jax.jit(dmsm._msm_g1_padded, static_argnames=("c",)).lower(
    x, y, inf, sc, c=13)
module = lowered._lowering.stablehlo()

comp_hash = hashlib.sha256()
cache_key._hash_computation(comp_hash, module, cache_key.IgnoreCallbacks.NO)
print("computation sha:", comp_hash.hexdigest()[:32], flush=True)

backend = xla_bridge.get_backend()
devices = np.array([[jax.devices()[0]]])
co = compiler.get_compile_options(num_replicas=1, num_partitions=1)
key = cache_key.get(module, devices, co, backend)
print("full cache key:", key, flush=True)
