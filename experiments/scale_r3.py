"""BASELINE.md measurement matrix: MSM at 2^20/2^24, NTT at 2^24.

These rows had never been executed in any round (round-2 verdict missing
item 2).  One number each, relay-death tolerant, biggest first so a
budget kill still leaves the 2^20 row.

Run: python experiments/scale_r3.py [phases: msm20 msm24 ntt24]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

PHASES = sys.argv[1:] or ["msm20", "ntt24", "msm24"]


def setup_jax():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    return jax


def sync(x):
    import jax
    return np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:2])


def rand_scalars(log_n, seed):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, 1 << 16, size=(16, 1 << log_n), dtype=np.uint32)
    s[15] &= 0x2FFF
    return s


def msm_at(jax, log_n: int, c: int, iters: int = 3):
    import jax.numpy as jnp
    from ultragroth_tpu.ops import msm as dmsm
    from ultragroth_tpu.ops import limbs as lb
    from ultragroth_tpu.testkit.dsetup import _fixed_base_points
    n = 1 << log_n
    t0 = time.perf_counter()
    ks = lb.u32_to_planes(np.arange(1, n + 1, dtype=np.uint32))
    x, y, inf = _fixed_base_points("g1", ks)
    x, y, inf = np.asarray(x), np.asarray(y), np.asarray(inf)  # host prov.
    x, y, inf = jnp.asarray(x), jnp.asarray(y), jnp.asarray(inf)
    sc = jnp.asarray(rand_scalars(log_n, 7))
    sync(sc)
    print(f"  2^{log_n} point gen+stage: {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    sync(dmsm.msm_g1(x, y, inf, sc, c=c))
    print(f"  compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(dmsm.msm_g1(x, y, inf, sc, c=c))
    dt = (time.perf_counter() - t0) / iters
    print(f"  msm 2^{log_n}/c={c}: {dt*1e3:.1f} ms = {n/dt:,.0f} pts/s",
          flush=True)


def ntt_at(jax, log_n: int):
    import jax.numpy as jnp
    from ultragroth_tpu.ops import ntt as dntt
    rng = np.random.default_rng(3)
    a = rng.integers(0, 1 << 16, size=(16, 1 << log_n), dtype=np.uint32)
    a[15] &= 0x3FFF
    a = jnp.asarray(a)
    sync(a)
    try:
        fn = dntt.ntt_fast
        t0 = time.perf_counter()
        out = fn(a, log_n)
        sync(out)
        print(f"  ntt_fast compile+first: {time.perf_counter()-t0:.1f}s",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"  ntt_fast failed ({str(e)[:120]}); base path", flush=True)
        fn = dntt.ntt
        out = fn(a, log_n)
        sync(out)
    t0 = time.perf_counter()
    sync(fn(out, log_n))
    dt = time.perf_counter() - t0
    print(f"  ntt 2^{log_n}: {dt*1e3:.1f} ms = {(1 << log_n)/dt/1e6:.1f} "
          f"M pts/s", flush=True)


def main():
    jax = setup_jax()
    print("device=", jax.devices()[0], flush=True)
    for ph in PHASES:
        print(f"== {ph} ==", flush=True)
        try:
            if ph.startswith("msm"):
                log_n = int(ph[3:])
                msm_at(jax, log_n, c=13 if log_n < 22 else 16)
            elif ph.startswith("ntt"):
                ntt_at(jax, int(ph[3:]))
        except Exception as e:  # noqa: BLE001
            print(f"  ERROR {type(e).__name__}: {str(e)[:300]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
