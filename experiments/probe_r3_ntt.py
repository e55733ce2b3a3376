"""ntt_fast on the real TPU after the cb VMEM-budget fix (1 MB blocks).

Round-1/2 state: the cg kernel compiled at factor <= 2^6 in isolation but
the COMPOSED ntt_fast crashed the Mosaic compile helper at 2^16/2^20 —
the old lane-block formula forgot the L factor and asked for 8 MB VMEM
blocks.  This probes the fixed path bottom-up, then times the quotient
pipeline (fast vs base) if the kernels lower.

Run: python experiments/probe_r3_ntt.py 2>&1 | tee experiments/probe_r3_ntt.log
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
from ultragroth_tpu.ops import ntt as dntt

print("device=", jax.devices()[0], flush=True)


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:2])


def timeit(name, fn, *args, iters=3):
    try:
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            sync(fn(*args))
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"{name}: {dt:.1f} ms steady (compile+first {tc:.1f}s)",
              flush=True)
        return out
    except Exception as e:  # noqa: BLE001
        print(f"{name}: ERROR {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None


def rand_planes(log_n, seed=3):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 1 << 16, size=(16, 1 << log_n), dtype=np.uint32)
    a[15] &= 0x1FFF
    return jnp.asarray(a)


def main():
    a16 = rand_planes(16)
    a20 = rand_planes(20)

    out = timeit("ntt_fast[2^16]", dntt.ntt_fast, a16, 16)
    if out is not None:
        # correctness vs the per-stage path on device
        want = np.asarray(dntt.ntt(a16, 16))
        print("  matches ntt():", bool((np.asarray(out) == want).all()),
              flush=True)
    timeit("ntt[2^16]", dntt.ntt, a16, 16)
    timeit("ntt_fast[2^20]", dntt.ntt_fast, a20, 20)
    timeit("ntt[2^20]", dntt.ntt, a20, 20)

    b20 = rand_planes(20, 5)
    timeit("quotient_fast[2^20]",
           lambda: dntt._quotient_scalars_impl(a20, b20, 20, fast=True))
    timeit("quotient_base[2^20]",
           lambda: dntt._quotient_scalars_impl(a20, b20, 20, fast=False))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
