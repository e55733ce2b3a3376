"""Isolate: does the scatter_coefs@2^20 compile kill the relay's
tpu_compile_helper?  (Both e2e-2^20 attempts died right after the G2
compile; scatter_coefs is the next never-yet-compiled program.)"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
from ultragroth_tpu.ops import ntt as dntt

D = 1 << 20
n_coefs = 2 * D - 16
rng = np.random.default_rng(5)
w = rng.integers(0, 1 << 16, size=(16, D), dtype=np.uint32)
cv = rng.integers(0, 1 << 16, size=(16, n_coefs), dtype=np.uint32)
cm = rng.integers(0, 2, size=n_coefs).astype(np.int32)
cc = rng.integers(0, D, size=n_coefs).astype(np.int32)
cs = rng.integers(0, D, size=n_coefs).astype(np.int32)
t0 = time.time()
a, b = dntt.scatter_coefs(jnp.asarray(w), jnp.asarray(cv), jnp.asarray(cm),
                          jnp.asarray(cc), jnp.asarray(cs), D)
print("compiled+dispatched", time.time() - t0, flush=True)
print("sync", np.asarray(a[0, :2]), time.time() - t0, flush=True)
