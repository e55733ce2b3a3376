"""Round-2d TPU measurements: the rebuilt MSM (plane-major + split
sub-accumulators + binary-decomposition reduction), ntt_fast (VMEM
constant-geometry kernel + Bailey split), and the quotient pipeline.

Whole-call timings with host-readback sync (block_until_ready does not
sync through the axon relay).  One process, results printed+flushed per
measurement so a relay kill loses nothing.

Usage: python experiments/measure_r2d.py [msm13 msm16 g2 nttfast ntt quot ...]
(no args = all).
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

rng = np.random.default_rng(7)


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf.ravel()[:2])


def timed_call(label, fn, iters=3, per=1.0):
    t0 = time.perf_counter()
    try:
        sync(fn())
    except Exception as e:  # noqa: BLE001
        print(f"{label}: ERROR {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return
    dt_c = time.perf_counter() - t0
    best = None
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn())
        dt = time.perf_counter() - t0
        if best is None or dt < best:
            best = dt
    print(f"{label}: {best*1000:.1f} ms steady ({per/best:.0f} unit/s) "
          f"compile+first={dt_c:.1f}s", flush=True)
    return best


def mk_msm_inputs(log_n, group="g1"):
    from ultragroth_tpu.io.zkey import parse_groth16_zkey
    from ultragroth_tpu.protocol.prover import (g1_section_to_planes,
                                                g2_section_to_planes)
    zk = parse_groth16_zkey(
        open("/root/reference/testdata/circuit_final.zkey", "rb").read())
    if group == "g1":
        x, y, inf = g1_section_to_planes(zk.points_h)
    else:
        x, y, inf = g2_section_to_planes(zk.points_b2)
    n = 1 << log_n
    reps = -(-n // (x[0].shape[-1] if isinstance(x, tuple) else x.shape[-1]))
    tile = lambda a: np.tile(np.asarray(a), (1, reps))[:, :n]
    if isinstance(x, tuple):
        x = tuple(tile(c) for c in x)
        y = tuple(tile(c) for c in y)
    else:
        x, y = tile(x), tile(y)
    inf = np.tile(np.asarray(inf), reps)[:n]
    scalars = rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32)
    scalars[15] &= 0x3FFF
    return x, y, inf, scalars


def m_msm(log_n, c):
    from ultragroth_tpu.ops import msm as dmsm
    x, y, inf, s = mk_msm_inputs(log_n)
    timed_call(f"msm_g1[2^{log_n} c={c}]",
               lambda: dmsm.msm_g1(x, y, inf, s, c=c), per=1 << log_n)


def m_msm_g2(log_n, c):
    from ultragroth_tpu.ops import msm as dmsm
    x, y, inf, s = mk_msm_inputs(log_n, "g2")
    timed_call(f"msm_g2[2^{log_n} c={c}]",
               lambda: dmsm.msm_g2(x, y, inf, s, c=c), per=1 << log_n)


def m_ntt(log_n, fast):
    from ultragroth_tpu.ops import ntt as dntt
    a = rng.integers(0, 1 << 16, size=(16, 1 << log_n), dtype=np.uint32)
    a[15] &= 0x1FFF
    fn = dntt.ntt_fast if fast else dntt.ntt
    name = "ntt_fast" if fast else "ntt"
    timed_call(f"{name}[2^{log_n}]", lambda: fn(a, log_n), per=1 << log_n)


def m_quotient(log_n):
    from ultragroth_tpu.ops import ntt as dntt
    a = rng.integers(0, 1 << 16, size=(16, 1 << log_n), dtype=np.uint32)
    b = rng.integers(0, 1 << 16, size=(16, 1 << log_n), dtype=np.uint32)
    a[15] &= 0x1FFF
    b[15] &= 0x1FFF
    timed_call(f"quotient[2^{log_n}]",
               lambda: dntt.quotient_scalars(a, b, log_n), per=1 << log_n)


ALL = {
    "msm13": lambda: m_msm(18, 13),
    "msm16": lambda: m_msm(18, 16),
    "g2": lambda: m_msm_g2(16, 13),
    "nttfast": lambda: (m_ntt(20, True), m_ntt(16, True)),
    "ntt": lambda: m_ntt(20, False),
    "quot": lambda: m_quotient(20),
}


def main():
    which = sys.argv[1:] or list(ALL)
    print(f"device={jax.devices()[0]}", flush=True)
    for k in which:
        ALL[k]()
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
